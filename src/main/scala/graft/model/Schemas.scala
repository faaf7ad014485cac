package graft.model

/** Typed record shapes (SURVEY §1.1): the few stable row types the
  * engine exposes as `Dataset[T]`; everything upstream of normalization
  * stays `DataFrame`.
  */

/** The one statically-typed row of the reference
  * (`DEFENSEVSPOSTION.PY:126-152`): stats deliberately stay strings at
  * ingest; casting is a later, guarded step. `canonical` is filled by
  * [[graft.enrich.Teams.canonicalize]].
  */
final case class DvpRow(
    position: String,
    timeframe: String,
    row_idx: Long,
    team_raw: String,
    canonical: String,
    pts: String, reb: String, ast: String, three_pm: String,
    stl: String, blk: String, to: String)

/** Parsed betting insight (`nba_insights_scraper.py:352-368` output
  * contract). */
final case class Insight(
    id: String,
    player_name: String,
    team: String,
    opponent: String,
    matchup: String,
    game_time: String,
    prop_line: Option[Double],
    hit_rate_pct: Option[Int],
    sportsbook: String)

/** Parsed player prop (`nba_props_scraper.py:735-743`). */
final case class Prop(
    player: String,
    prop_type: String,
    line: Double,
    over_odds: String,
    under_odds: String,
    odds: Seq[String])

/** Exploded starting-lineup row (`lineup_scraper.py:93-110`, preferred
  * relational form per FIXTURES.md §2.5). */
final case class LineupSlot(
    game: String,
    team: String,
    pos: String,
    player: String)
