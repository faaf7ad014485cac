package graft.enrich

import graft.SparkSpecBase
import graft.ingest.Readers
import graft.validate.Validate
import org.apache.spark.sql.functions._

/** E2E minimum slice (SURVEY §7.2 / §3.3): dvp_raw fixture →
  * canonicalize → validate → pivot — the full DvP lifecycle with both the
  * passing and the deliberately-incomplete fixture.
  */
class DvpPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private lazy val canonDf =
    Teams.canonicalize(Readers.dvpRaw(spark, fixture("dvp_raw.json")), "team_raw")

  test("full fixture: every raw name resolves; 30 distinct teams per cell") {
    assert(canonDf.filter(col("canonical").isNull).count() == 0)
    val bad = Validate.groupsWithWrongDistinctCount(
      canonDf, Seq("position", "timeframe"), "canonical", 30)
    assert(bad.count() == 0)
    val expected = Teams.canonicalTeams.toDF("team")
    val missing = Validate.missingKeys(expected,
      canonDf.select("canonical"), "team", "canonical")
    assert(missing.count() == 0)
    val unknown = Validate.unexpectedKeys(expected,
      canonDf.select("canonical"), "team", "canonical")
    assert(unknown.count() == 0)
  }

  test("canonicalized output is expressible as the typed Dataset[DvpRow]") {
    val ds = canonDf.as[graft.model.DvpRow]
    val row = ds.filter(_.row_idx == 0L).head()
    assert(row.position == "PG" && row.canonical != null && row.pts.nonEmpty)
    assert(ds.count() == 120)
  }

  test("completeness grid: all position x timeframe cells populated") {
    val pos = Seq("PG", "SG").toDF("position")
    val tf = Seq("2025-26", "Last 7").toDF("timeframe")
    val empty = Validate.emptyGridCells(Seq(pos, tf), canonDf,
      Seq("position", "timeframe"))
    assert(empty.count() == 0)
    Validate.requireEmpty(empty, "grid") // must not throw
  }

  test("pivot reshape: 30 canonical rows wide by timeframe") {
    val wide = canonDf.filter(col("position") === "PG")
      .groupBy(col("canonical"))
      .pivot("timeframe", Seq("2025-26", "Last 7"))
      .agg(first(col("pts")))
    assert(wide.count() == 30)
    assert(wide.columns.toSeq == Seq("canonical", "2025-26", "Last 7"))
    assert(wide.filter(col("2025-26").isNull || col("Last 7").isNull).count() == 0)
  }

  test("incomplete fixture: the missing team is detected and fails fast") {
    val canonBad = Teams.canonicalize(
      Readers.dvpRaw(spark, fixture("dvp_raw_incomplete.json")), "team_raw")
    val bad = Validate.groupsWithWrongDistinctCount(
      canonBad, Seq("position", "timeframe"), "canonical", 30)
    val cells = bad.collect()
    assert(cells.length == 1)
    val c = cells.head
    assert(c.getAs[String]("position") == "SG" &&
      c.getAs[String]("timeframe") == "Last 7" &&
      c.getAs[Long]("n_distinct") == 29)
    val missing = Validate.missingKeys(
      Teams.canonicalTeams.toDF("team"),
      canonBad.filter(col("position") === "SG" && col("timeframe") === "Last 7")
        .select("canonical"),
      "team", "canonical")
    assert(missing.collect().map(_.getString(0)).toSeq == Seq("Utah Jazz"))
    intercept[Validate.ValidationException] {
      Validate.requireEmpty(bad, "30-team contract")
    }
  }
}
