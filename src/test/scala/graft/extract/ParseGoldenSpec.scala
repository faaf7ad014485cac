package graft.extract

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Byte-stable golden E2E for the two free-text parse pipelines
  * (FIXTURES.md §2.3/2.4): props page-text line scan and insight-card
  * parse, serialized as canonical JSON and diffed against committed
  * goldens. Regenerate after INTENTIONAL semantic changes with
  * GRAFT_REGEN_GOLDEN=1.
  */
class ParseGoldenSpec extends SparkSpecBase {

  private def check(df: DataFrame, goldenFile: String): Unit = {
    val produced = df.toJSON.collect().mkString("\n") + "\n"
    val path = Paths.get(s"src/test/resources/fixtures/$goldenFile")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.write(path, produced.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $goldenFile")
    } else {
      val golden = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      assert(produced == golden, s"$goldenFile diverged")
    }
  }

  test("props line-scan output matches golden bytes") {
    val schema = StructType(Seq(StructField("match_id", StringType),
      StructField("text", StringType)))
    val pages = spark.read.schema(schema)
      .json(getClass.getResource("/fixtures/props_page_text.json").getPath)
    check(Extract.lineScan(pages, "match_id", "text")
      .orderBy("match_id", "line_no"), "props_golden.jsonl")
  }

  test("insight parse output matches golden bytes") {
    val schema = StructType(Seq(StructField("card_idx", LongType),
      StructField("text", StringType), StructField("url", StringType)))
    val cards = spark.read.schema(schema)
      .json(getClass.getResource("/fixtures/insight_raw.json").getPath)
    check(Insights.parse(cards).orderBy("card_idx"), "insights_golden.jsonl")
  }
}
