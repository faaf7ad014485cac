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

  /** Cross-batch out-of-order: the watermark bounds lateness against the
    * GLOBAL max, but lastTs is per-user, so a new event inside the slack
    * can be older than the user's stored lastTs. Unsorted merge (the
    * pre-fix code) regressed lastTs to the late event, re-arming the
    * timeout at 23:55+12h = 11:55; the batch-2 watermark (12:06 − 10m =
    * 11:56) lands strictly BETWEEN that and the correct 00:00+12h =
    * 12:00, so the old code raises a false open-gap alert and the fixed
    * code raises none. */
  test("late event within slack does not regress lastTs / re-arm timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val evs = mem.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[Sessionize.EvT]
    val q = GapDetect.gapStream(evs)
      .writeStream.format("memory").queryName("gap_ooo_alert")
      .outputMode("update").start()
    try {
      // batch 1: users 1 and 9 at 00:00 → watermark 23:50 the day before
      mem.addData(
        (1L, 1L, ts("2024-01-02 00:00:00"), 1.0),
        (2L, 9L, ts("2024-01-02 00:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2: u1 gets a late-but-accepted event (23:55 >= the 23:50
      // watermark, < u1's 00:00 lastTs); u9 advances the watermark to
      // exactly 11:56
      mem.addData(
        (3L, 1L, ts("2024-01-01 23:55:00"), 1.0),
        (4L, 9L, ts("2024-01-02 12:06:00"), 1.0))
      q.processAllAvailable()
      // batch 3: timers evaluate against the batch-2 watermark
      mem.addData((5L, 9L, ts("2024-01-02 12:06:01"), 1.0))
      q.processAllAvailable()

      val out = spark.table("gap_ooo_alert").collect()
      val alerts = out.filter(_.getAs[Boolean]("open"))
      assert(alerts.isEmpty, s"false open-gap alert: ${alerts.mkString(";")}")
      // u9's 00:00 → 12:06 interval is a legitimate 12h06m closed gap;
      // u1 must contribute nothing (5-minute span, no timeout fired)
      assert(out.forall(_.getAs[Long]("user_id") === 9L),
        s"only u9's closed gap expected: ${out.mkString(";")}")
    } finally q.stop()
  }

  /** The mispaired-sliding half of the same bug: with the late event
    * appended unsorted after the stored lastTs, sliding(2) compares
    * (00:00, 23:56-prev) and (23:56-prev, 13:00), emitting the closed
    * gap with the LATE event as its start boundary; sorted, the gap is
    * (00:00, 13:00). */
  test("late event within slack does not shift closed-gap boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val evs = mem.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .as[Sessionize.EvT]
    val q = GapDetect.gapStream(evs)
      .writeStream.format("memory").queryName("gap_ooo_bound")
      .outputMode("update").start()
    try {
      mem.addData((1L, 2L, ts("2024-01-02 00:00:00"), 1.0))
      q.processAllAvailable()
      // late event inside the slack, plus the 13h-later gap closer
      mem.addData(
        (2L, 2L, ts("2024-01-01 23:56:00"), 1.0),
        (3L, 2L, ts("2024-01-02 13:00:00"), 1.0))
      q.processAllAvailable()

      val out = spark.table("gap_ooo_bound").collect()
      assert(out.forall(!_.getAs[Boolean]("open")),
        s"no open alerts expected: ${out.mkString(";")}")
      val closed = out.map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("gap_start_us"), r.getAs[Long]("gap_end_us"))).toSet
      assert(closed === Set(
        (2L, ts("2024-01-02 00:00:00").getTime * 1000L,
          ts("2024-01-02 13:00:00").getTime * 1000L)),
        s"closed gaps wrong: $closed")
    } finally q.stop()
  }
}
