package graft.ingest

import graft.SparkSpecBase
import graft.clean.Clean
import graft.sink.Sinks
import org.apache.spark.sql.functions._

/** The reference's whole per-team workflow, end to end on OUR stack:
  * scrape a page (HtmlTableSource over the fixture), clean it exactly as
  * `unified_nba_scraper.py` does (repeated-header drop, Birth repair,
  * guarded numeric coercion), and write the per-team partitioned JSON it
  * ships — proving the round-8 HTML front end feeds the existing
  * normalize → clean → sink pipeline with no adapter code. This is the
  * "a user of the reference could switch" claim as a test.
  */
class HtmlPipelineSpec extends SparkSpecBase {

  private def fixturePath: String =
    getClass.getResource("/fixtures/team_page.html").getPath

  test("HTML page -> clean -> coerce -> per-team partitioned JSON round-trips") {
    val roster = spark.read
      .format("graft.sources.HtmlTableSource")
      .option("path", fixturePath)
      .option("tableId", "Roster")
      .load()
      .withColumn("team", lit("BOS")) // page-level key, as the scraper assigns

    // _clean_dataframe parity: header-row filter (no-op on roster),
    // Birth 'us US' -> 'US', guarded numeric coercion over stat columns
    val cleaned = Clean.guardedNumericCoercion(
      Clean.dropRepeatedHeaderRows(roster)
        .withColumn("Birth", Clean.repairCountry(col("Birth"))),
      candidateCols = Seq("Rk", "Player", "Pos"))

    // Rk coerces (all-numeric); Player/Pos must survive the >=1/2 guard
    val schema = cleaned.schema
    assert(schema("Rk").dataType.typeName == "double")
    assert(schema("Player").dataType.typeName == "string")
    assert(schema("Pos").dataType.typeName == "string")
    assert(cleaned.filter(col("Birth").contains("us US")).count() == 0)
    assert(cleaned.filter(col("Birth") === "US").count() == 3)

    val dir = java.nio.file.Files.createTempDirectory("graft_html_pipe")
    try {
      Sinks.writePartitioned(cleaned, dir.toString, Seq("team"), format = "json")
      // the reference's layout: one directory per team key
      assert(new java.io.File(dir.toFile, "team=BOS").isDirectory)
      val back = spark.read.json(s"$dir/team=BOS")
      assert(back.count() == 4)
      assert(back.select("Player").collect().map(_.getString(0)).sorted.toSeq ==
        Seq("Jaylen Brown", "Jayson Tatum", "Kristaps Porziņģis", "Texas A&M Guy"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
