package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics under late data: with a 10-minute watermark and
  * append output, a window only emits once the watermark passes its end,
  * and events later than the watermark are dropped — the bounded-state
  * guarantee that lets the tumbling aggregation run forever.
  */
class WatermarkSpec extends SparkSpecBase {

  test("append-mode tumbling windows drop too-late events and seal windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]

    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 01:$min%02d:00")

    val windowed = EventWindows.tumbling(
      mem.toDF().toDF("event_id", "ts", "event_type", "value")
        .withWatermark("ts", "10 minutes"))

    val q = windowed.writeStream
      .format("memory").queryName("wm_stream")
      .outputMode("append")
      .start()
    try {
      // batch 1: events in [01:00, 01:05) and one at 01:31 advancing
      // the watermark to 01:21 → the 01:00 window can seal
      mem.addData((1L, ts(0), "click", 1.0), (2L, ts(4), "click", 2.0),
        (3L, ts(31), "click", 9.0))
      q.processAllAvailable()
      // batch 2: a too-late event back in the sealed 01:00 window
      mem.addData((4L, ts(1), "click", 100.0))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to seal everything else
      mem.addData((5L, ts(59), "click", 5.0))
      q.processAllAvailable()

      val rows: Array[Row] = spark.table("wm_stream")
        .orderBy("window_start").collect()
      val w0 = rows.find(_.getTimestamp(0).toString.contains("01:00:00"))
      assert(w0.isDefined, s"01:00 window never sealed: ${rows.mkString(";")}")
      // late event 4 (value 100) must NOT be in the sealed window
      assert(w0.get.getAs[Long]("n") == 2)
      assert(w0.get.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }
}
