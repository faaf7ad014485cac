package graft.enrich

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TeamsSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(raws: (String, Long)*): Map[Long, String] = {
    val df = raws.toSeq.toDF("team_raw", "row_idx")
      .withColumn("position", lit("PG"))
      .withColumn("timeframe", lit("2025-26"))
    Teams.canonicalize(df, "team_raw")
      .collect()
      .map(r => r.getAs[Long]("row_idx") ->
        Option(r.getAs[String]("canonical")).orNull)
      .toMap
  }

  test("alias classes: full, city, abbreviation, mascot, record suffix, periods") {
    val r = canon(
      "BOSTON CELTICS" -> 0L, "Golden State" -> 1L, "PHX" -> 2L,
      "SIXERS" -> 3L, "Chicago Bulls (14-3)" -> 4L, "L.A.C" -> 5L,
      "Milwaukee" -> 6L)
    assert(r(0L) == "Boston Celtics")
    assert(r(1L) == "Golden State Warriors")
    assert(r(2L) == "Phoenix Suns")
    assert(r(3L) == "Philadelphia 76ers")
    assert(r(4L) == "Chicago Bulls")
    assert(r(5L) == "LA Clippers") // periods stripped → LAC
    assert(r(6L) == "Milwaukee Bucks")
  }

  test("mascot-strip retry resolves trailing-junk names; unknowns stay null") {
    val r = canon("CLEVELAND CAVALIERS FANS" -> 0L, "ZZZ UNKNOWN" -> 1L)
    assert(r(0L) == "Cleveland Cavaliers")
    assert(r(1L) == null)
  }

  test("LA disambiguation is occurrence-ordered per (position, timeframe)") {
    val df = Seq(
      ("LOS ANGELES", 0L, "PG", "2025-26"),
      ("BOS", 1L, "PG", "2025-26"),
      ("LOS ANGELES", 2L, "PG", "2025-26"),
      ("LOS ANGELES (10-4)", 0L, "SG", "2025-26"), // suffix stripped first
      ("LOS ANGELES", 1L, "SG", "2025-26"),
    ).toDF("team_raw", "row_idx", "position", "timeframe")
    val out = Teams.canonicalize(df, "team_raw").collect()
      .map(r => (r.getAs[String]("position"), r.getAs[Long]("row_idx")) ->
        r.getAs[String]("canonical")).toMap
    assert(out(("PG", 0L)) == "LA Lakers")
    assert(out(("PG", 2L)) == "LA Clippers")
    assert(out(("SG", 0L)) == "LA Lakers") // counter resets per partition
    assert(out(("SG", 1L)) == "LA Clippers")
    assert(out(("PG", 1L)) == "Boston Celtics")
  }
}
