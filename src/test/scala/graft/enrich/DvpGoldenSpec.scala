package graft.enrich

import graft.SparkSpecBase
import graft.ingest.Readers
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Byte-stable golden E2E (FIXTURES.md §3): the full DvP pipeline output
  * serialized as canonical JSON must match the committed golden file
  * byte for byte. Regenerate (after an INTENTIONAL semantic change) with:
  *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.enrich.DvpGoldenSpec"
  */
class DvpGoldenSpec extends SparkSpecBase {

  private val goldenPath =
    "src/test/resources/fixtures/dvp_golden.jsonl"

  test("DvP pipeline output matches the committed golden bytes") {
    val out = Teams.canonicalize(
        Readers.dvpRaw(spark,
          getClass.getResource("/fixtures/dvp_raw.json").getPath), "team_raw")
      .select("position", "timeframe", "row_idx", "team_raw", "canonical",
        "pts", "reb", "ast", "three_pm", "stl", "blk", "to")
      .orderBy("row_idx")
    val lines = out.toJSON.collect() // row order fixed by orderBy above
    val produced = lines.mkString("\n") + "\n"

    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.write(Paths.get(goldenPath),
        produced.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $goldenPath")
    } else {
      val golden = new String(
        Files.readAllBytes(Paths.get(goldenPath)), StandardCharsets.UTF_8)
      assert(produced == golden,
        "pipeline output diverged from committed golden bytes")
    }
  }
}
