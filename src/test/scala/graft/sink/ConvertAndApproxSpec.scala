package graft.sink

import graft.{SparkSpecBase, Tables}
import graft.ingest.Readers
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ConvertAndApproxSpec extends SparkSpecBase {

  test("S12: CSV -> metadata-enveloped JSON conversion round-trips") {
    val out = Files.createTempDirectory("graft-conv").toString
    val csv = Readers.csvTable(spark,
      getClass.getResource("/fixtures/league.csv").getPath)
    Sinks.writeEnveloped(csv, out, source = "league_csv",
      runTimestamp = "2026-01-01T00:00:00")
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() == 2)
    assert(data.columns.toSeq == Seq("Player", "Team", "PTS"))
    val meta = spark.read.json(s"$out/_meta").head()
    assert(meta.getAs[String]("source") == "league_csv")
    assert(meta.getAs[Long]("record_count") == 2)
  }

  test("approximate distinct stays within HLL tolerance of exact") {
    // at 100 TB the exact countDistinct shuffles every key; HLL++ is the
    // scale path — assert the trade is sound on real data
    val ev = Tables.events(spark, sf)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
