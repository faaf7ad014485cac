package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** st19's timer half: an ONGOING silence has no closing event, so only
  * the event-time timeout can raise it. Three micro-batches: activity,
  * a watermark-advancing batch that closes the active users' gaps, and
  * a final batch in which the silent user's timer fires — exactly one
  * open-gap alert, none for users still inside their horizon.
  */
class GapAlertSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("silent user raises exactly one open-gap alert on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val evs = mem.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[Sessionize.EvT]
    val q = GapDetect.gapStream(evs)
      .writeStream.format("memory").queryName("gap_alerts")
      .outputMode("update").start()
    try {
      // batch 1: three users active around 00:00-00:30
      mem.addData(
        (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
        (2L, 1L, ts("2024-01-01 00:30:00"), 1.0),
        (3L, 2L, ts("2024-01-01 00:15:00"), 1.0),
        (4L, 3L, ts("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      // batch 2: users 1 and 3 return 26h later (> the 12h gap) and
      // advance the watermark past user 2's timeout; user 2 stays silent
      mem.addData(
        (5L, 1L, ts("2024-01-02 02:00:00"), 1.0),
        (6L, 3L, ts("2024-01-02 02:10:00"), 1.0))
      q.processAllAvailable()
      // batch 3: user 2's timer fires (timeouts run against the batch-2
      // watermark); user 3's short follow-up opens no new gap
      mem.addData((7L, 3L, ts("2024-01-02 06:00:00"), 1.0))
      q.processAllAvailable()

      val out = spark.table("gap_alerts").collect()
      val alerts = out.filter(_.getAs[Boolean]("open"))
      assert(alerts.length === 1, s"expected one alert: ${out.mkString(";")}")
      assert(alerts.head.getAs[Long]("user_id") === 2L)
      assert(alerts.head.getAs[Long]("gap_start_us") ===
        ts("2024-01-01 00:15:00").getTime * 1000L)
      assert(alerts.head.getAs[Long]("gap_end_us") === -1L)

      val closed = out.filterNot(_.getAs[Boolean]("open"))
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("gap_start_us"),
          r.getAs[Long]("gap_end_us"))).toSet
      assert(closed === Set(
        (1L, ts("2024-01-01 00:30:00").getTime * 1000L,
          ts("2024-01-02 02:00:00").getTime * 1000L),
        (3L, ts("2024-01-01 00:10:00").getTime * 1000L,
          ts("2024-01-02 02:10:00").getTime * 1000L)),
        s"closed gaps wrong: $closed")
    } finally q.stop()
  }
}
