package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join with watermarks on both sides — the
  * streaming twin of the j2 range join: clicks join purchases of the
  * same user within a bounded event-time window. Both watermarks plus
  * the time-range join condition bound the buffered state (Spark drops
  * rows older than watermark - range), which is what makes the join
  * runnable forever at scale; an unbounded-condition stream-stream join
  * would accumulate state without limit.
  */
class StreamStreamJoinSpec extends SparkSpecBase {

  test("clicks join purchases within 10 minutes, state bounded by watermarks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Int, Long)] // (event_id, user, epochSec)
    val buys = MemoryStream[(Long, Int, Long)]

    val c = clicks.toDF().toDF("click_id", "user_id", "sec")
      .withColumn("click_ts", timestamp_seconds(col("sec"))).drop("sec")
      .withWatermark("click_ts", "5 minutes")
    val b = buys.toDF().toDF("buy_id", "buser_id", "bsec")
      .withColumn("buy_ts", timestamp_seconds(col("bsec"))).drop("bsec")
      .withWatermark("buy_ts", "5 minutes")

    val joined = c.join(b,
      col("user_id") === col("buser_id") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))

    val q = joined.select("click_id", "buy_id")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      clicks.addData((1L, 7, t0), (2L, 7, t0 + 1200), (3L, 8, t0))
      buys.addData((10L, 7, t0 + 300),  // within 10m of click 1
        (11L, 7, t0 + 1500),            // within 10m of click 2 only
        (12L, 9, t0 + 60))              // no matching user
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 11L)),
      s"unexpected join result: $out")
  }

  test("st4: streaming interval join over AvailableNow == batch twin") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.Tables
    val rawSchema = Tables.eventsRaw(spark, sf).schema
    val dir = java.nio.file.Files.createTempDirectory("graft-st4")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    def side(eventType: String, idAs: String, userAs: String, tsAs: String) =
      Tables.normalizeTs(
          spark.readStream.schema(rawSchema).parquet(dir.toString))
        .filter(col("event_type") === eventType)
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, "12 hours")
    val joined = IntervalJoin.streamJoin(
      side("click", "click_id", "user_id", "click_ts"),
      side("purchase", "buy_id", "buy_user_id", "buy_ts"))
    val q = joined.writeStream.format("memory").queryName("st4_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in time")

    val streamed = spark.table("st4_stream")
      .orderBy("click_id", "buy_id").collect().toSeq
    val batch = IntervalJoin.st4IntervalJoin(spark, sf)
      .select("click_id", "buy_id", "user_id", "lag_us")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))) ==
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
  }
}
