package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming parity: the same pure window transforms
  * ([[EventWindows.tumbling]]) run over `readStream` with a watermark and
  * `Trigger.AvailableNow` must produce exactly the batch result —
  * the "process what exists, bounded catch-up" semantics of SURVEY §2.8 T1.
  */
class StreamingSpec extends SparkSpecBase {

  test("tumbling windows: streaming AvailableNow == batch") {
    val batchEv = Tables.events(spark, sf)
    val rawSchema = Tables.eventsRaw(spark, sf).schema
    // file stream sources watch a directory; stage the fixture into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamEv = Tables.normalizeTs(spark.readStream
        .schema(rawSchema)
        .parquet(dir.toString))
      .withWatermark("ts", "10 minutes")

    val q = EventWindows.tumbling(streamEv)
      .writeStream
      .format("memory")
      .queryName("tumbling_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in time")

    val streamed = spark.table("tumbling_stream")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventWindows.tumbling(batchEv)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("sliding windows: each event lands in exactly two windows") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val total = EventWindows.sliding(ev)
      .agg(sum("n")).head().getLong(0)
    assert(total == 2 * n)
  }
}
