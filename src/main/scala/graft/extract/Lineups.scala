package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Starting-lineup pipeline (SURVEY S6/F21, `lineup_scraper.py:34-114`):
  * nested game blocks (`lineups: team -> {pos -> player}`) exploded to
  * relational (game, team, pos, player) rows — the preferred form per
  * FIXTURES.md §2.5 — plus the spread/total parse from the betting line.
  *
  * Two `explode`s replace the nested-dict walk; all downstream ops
  * (joins against DvP, props) become ordinary equi-joins on team/player.
  */
object Lineups {

  /** Input schema: game, time, betting_text, lineups
    * map<team, map<pos, player>>. Output: one row per slot with parsed
    * betting struct carried alongside.
    */
  def explodeSlots(games: DataFrame): DataFrame =
    games
      .withColumn("betting", Extract.parseSpreadTotal(col("betting_text")))
      .select(col("game"), col("time"), col("betting"),
        explode(col("lineups")).as(Seq("team", "by_pos")))
      .select(col("game"), col("time"), col("betting"), col("team"),
        explode(col("by_pos")).as(Seq("pos", "player")))
      .withColumn("player", graft.clean.Clean.normWs(col("player")))

  /** Positional completeness: teams missing any of the 5 slots. */
  def incompleteLineups(slots: DataFrame): DataFrame =
    slots.groupBy(col("game"), col("team"))
      .agg(countDistinct(col("pos")).as("n_pos"))
      .filter(col("n_pos") =!= 5)
}
