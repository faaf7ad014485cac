package graft.extract

import graft.SparkSpecBase
import graft.sink.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Props full lifecycle (SURVEY §3.1-shape for the sportsbook scrape):
  * page-text blobs → stateful line scan → typed Dataset[Prop] → per-player
  * grouping (A2) → partitioned sink (S9) → read-back.
  */
class PropsPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val page1 =
    """Jayson Tatum
      |Points
      |O 27.5 -110 +100
      |U 27.5 -105
      |Rebounds
      |O 8.5 +120
      |Derrick White
      |Points
      |O 18.5 -115""".stripMargin

  private val page2 =
    """Luka Doncic
      |Points
      |O 32.5 -120 +105""".stripMargin

  test("blobs → line scan → typed props → per-player cube → partitioned sink") {
    val pages = Seq(("Celtics vs Lakers", page1), ("Mavs vs Suns", page2))
      .toDF("match_id", "text")
    val parsed = Extract.lineScan(pages, "match_id", "text")

    val props = parsed
      .select(col("player"), col("prop_type"), col("line"),
        col("over_odds"), col("under_odds"), col("odds"))
      .as[graft.model.Prop]
    assert(props.count() == 5)
    val tatumPts = props.filter(p =>
      p.player == "Jayson Tatum" && p.prop_type == "Points").collect()
    assert(tatumPts.map(_.line).toSet == Set(27.5))
    assert(tatumPts.flatMap(_.odds).toSet == Set("-110", "+100", "-105"))

    // A2: props accumulated per player
    val perPlayer = parsed.groupBy(col("match_id"), col("player"))
      .agg(count(lit(1)).as("n_props"),
        sort_array(collect_set(col("prop_type"))).as("prop_types"))
    val tatum = perPlayer.filter(col("player") === "Jayson Tatum").head()
    assert(tatum.getAs[Long]("n_props") == 3)
    assert(tatum.getSeq[String](3) == Seq("Points", "Rebounds"))

    // S9: partitioned by match, read back intact
    val out = Files.createTempDirectory("graft-props").toString
    Sinks.writePartitioned(parsed, out, Seq("match_id"))
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.select("match_id").distinct().count() == 2)
  }
}
