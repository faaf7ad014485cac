package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The reference's flagship §3.3 DvP lifecycle certified as ONE query
  * (r9 verdict ask #7): every stage is individually oracle-green
  * elsewhere (i4 ingest+canonicalize, f1 coercion, e1/e5 alias join +
  * LA window, a8/a9 validation, e2 pivot) — this row chains them so the
  * HANDOFFS are certified too: the pivot consumes exactly what
  * canonicalization emits, the validators run over the same relation
  * the cube aggregates, and one hash covers the whole flow.
  */
object EndToEnd {

  /** E2E — dvp_raw ingest → guarded numeric clean → alias join + LA
    * window → A8/A9 validation → pivot, as a single relation: one cube
    * row per (canonical team, position) with both timeframes as
    * columns, plus the three validation verdicts every row carries
    * (missing expected teams, empty grid cells, groups off the 30-team
    * contract — all 0 on a healthy scrape, and part of the hash, so a
    * regression in any stage flips the row set or the verdict columns).
    *
    * Scale shape: the alias dim and validation grids are bounded
    * broadcasts (30 teams × positions × timeframes); the only shuffle
    * of the full data is the canonicalization window + the pivot
    * group-by, both keyed by (position, timeframe)-grade columns; the
    * 1-row validation aggregates crossJoin onto the bounded cube.
    */
  def e2eDvpPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = graft.ingest.Readers.dvpRaw(s, Ingest.dvpFixture)
    // F1 clean: the stat column arrives as strings; the guard decides
    // from global stats (all-numeric here) and casts
    val cleaned = graft.clean.Clean.guardedNumericCoercion(raw, Seq("pts"))
    val canon = graft.enrich.Teams.canonicalize(cleaned, "team_raw")
      .select(col("position"), col("timeframe"), col("row_idx"),
        col("canonical"), col("pts"))

    val expected = graft.enrich.Teams.canonicalTeams.toDF("team")
    // A8: expected teams that never appear
    val missing = graft.validate.Validate
      .missingKeys(expected, canon.select("canonical"), "team", "canonical")
      .agg(count(lit(1)).as("n_missing_teams"))
    // A9: empty cells of the position × timeframe × team grid
    val emptyCells = graft.validate.Validate
      .emptyGridCells(
        Seq(canon.select("position").distinct(),
          canon.select("timeframe").distinct(),
          expected.select(col("team").as("canonical"))),
        canon, Seq("position", "timeframe", "canonical"))
      .agg(count(lit(1)).as("n_empty_cells"))
    // A9 contract: per-(position, timeframe) distinct-team count = 30
    val badGroups = graft.validate.Validate
      .groupsWithWrongDistinctCount(
        canon, Seq("position", "timeframe"), "canonical", 30)
      .agg(count(lit(1)).as("n_bad_groups"))

    // §3.3 cube: timeframes pivot to columns; max() not first() — each
    // (team, position, timeframe) holds one row, and max stays
    // deterministic if a scrape ever double-reports
    canon.groupBy(col("canonical"), col("position"))
      .pivot("timeframe", Seq("2025-26", "Last 7"))
      .agg(max(col("pts")))
      .withColumnRenamed("2025-26", "pts_season")
      .withColumnRenamed("Last 7", "pts_last7")
      .crossJoin(broadcast(missing))
      .crossJoin(broadcast(emptyCells))
      .crossJoin(broadcast(badGroups))
      .orderBy("canonical", "position")
  }

  val e2eSql: String = {
    val teams = graft.enrich.Teams.canonicalTeams
      .map(t => s"(${sqlLitDuck(t)})").mkString(",\n    ")
    val canonSql = Enrich.canonicalizeSqlOver(
      s"""
        |  SELECT position, timeframe, row_idx, team_raw,
        |    TRY_CAST(pts AS DOUBLE) AS pts
        |  FROM read_json('${Ingest.dvpFixture}',
        |    format='newline_delimited')""".stripMargin,
      "team_raw",
      "position, timeframe, row_idx, pts",
      "row_idx")
    s"""WITH canon AS ($canonSql),
      |teams(team) AS (VALUES
      |    $teams),
      |missing AS (
      |  SELECT count(*) AS n_missing_teams
      |  FROM teams t LEFT JOIN (SELECT DISTINCT canonical FROM canon) c
      |    ON c.canonical = t.team
      |  WHERE c.canonical IS NULL),
      |grid AS (
      |  SELECT p.position, f.timeframe, t.team
      |  FROM (SELECT DISTINCT position FROM canon) p,
      |       (SELECT DISTINCT timeframe FROM canon) f, teams t),
      |empty_cells AS (
      |  SELECT count(*) AS n_empty_cells
      |  FROM grid g LEFT JOIN
      |    (SELECT DISTINCT position, timeframe, canonical FROM canon) o
      |    ON o.position = g.position AND o.timeframe = g.timeframe
      |      AND o.canonical = g.team
      |  WHERE o.canonical IS NULL),
      |bad AS (
      |  SELECT count(*) AS n_bad_groups FROM (
      |    SELECT position, timeframe FROM canon
      |    GROUP BY 1, 2 HAVING count(DISTINCT canonical) <> 30)),
      |cube AS (
      |  SELECT canonical, position,
      |    max(CASE WHEN timeframe = '2025-26' THEN pts END) AS pts_season,
      |    max(CASE WHEN timeframe = 'Last 7' THEN pts END) AS pts_last7
      |  FROM canon GROUP BY 1, 2)
      |SELECT c.canonical, c.position, c.pts_season, c.pts_last7,
      |  m.n_missing_teams, e.n_empty_cells, b.n_bad_groups
      |FROM cube c CROSS JOIN missing m CROSS JOIN empty_cells e
      |CROSS JOIN bad b
      |ORDER BY c.canonical, c.position""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_dvp_pipeline" -> e2eDvpPipeline,
  )

  val oracle: Map[String, String] = Map(
    "e2e_dvp_pipeline" -> e2eSql,
  )
}
