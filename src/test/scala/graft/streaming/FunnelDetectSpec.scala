package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** st20 funnel detection: last-touch attribution semantics (a viewless
  * latest click steals and voids the attribution), cross-batch funnel
  * completion, and the no-regress guard for late-but-accepted clicks.
  */
class FunnelDetectSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L

  private def runStream(name: String)(
      drive: MemoryStream[(Long, Long, Timestamp, String)] =>
        org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val evs = mem.toDF().toDF("event_id", "user_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .as[FunnelDetect.EvF]
    val q = FunnelDetect.funnelStream(evs)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try { drive(mem)(q); spark.table(name).collect() }
    finally q.stop()
  }

  test("a viewless latest click steals and voids the attribution") {
    val out = runStream("fd_steal") { mem => q =>
      mem.addData(
        (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
        (2L, 1L, ts("2024-01-01 01:00:00"), "click"), // has the view
        (3L, 1L, ts("2024-01-03 01:00:00"), "click"), // view now stale
        (4L, 1L, ts("2024-01-03 02:00:00"), "purchase"))
      q.processAllAvailable()
    }
    assert(out.isEmpty,
      s"latest click had no view in budget - last-touch must yield " +
        s"nothing: ${out.mkString(";")}")
  }

  test("funnel completes across micro-batches") {
    val out = runStream("fd_cross") { mem => q =>
      mem.addData((1L, 7L, ts("2024-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      mem.addData((2L, 7L, ts("2024-01-01 01:00:00"), "click"))
      q.processAllAvailable()
      mem.addData((3L, 7L, ts("2024-01-01 02:00:00"), "purchase"))
      q.processAllAvailable()
    }
    assert(out.length === 1, s"one funnel expected: ${out.mkString(";")}")
    val r = out.head
    assert(r.getAs[Long]("user_id") === 7L)
    assert(r.getAs[Long]("view_us") === us("2024-01-01 00:00:00"))
    assert(r.getAs[Long]("click_us") === us("2024-01-01 01:00:00"))
    assert(r.getAs[Long]("purchase_us") === us("2024-01-01 02:00:00"))
  }

  test("late-but-accepted click does not regress the latest-click anchor") {
    val out = runStream("fd_late") { mem => q =>
      // batch 1: view + click at 01:00 → watermark 00:50
      mem.addData(
        (1L, 3L, ts("2024-01-01 00:30:00"), "view"),
        (2L, 3L, ts("2024-01-01 01:00:00"), "click"))
      q.processAllAvailable()
      // batch 2: a click at 00:55 - inside the watermark slack but
      // OLDER than the stored latest click; an unguarded update would
      // re-anchor attribution to it
      mem.addData((3L, 3L, ts("2024-01-01 00:55:00"), "click"))
      q.processAllAvailable()
      mem.addData((4L, 3L, ts("2024-01-01 02:00:00"), "purchase"))
      q.processAllAvailable()
    }
    assert(out.length === 1, s"one funnel expected: ${out.mkString(";")}")
    assert(out.head.getAs[Long]("click_us") === us("2024-01-01 01:00:00"),
      s"the late 00:55 click must not steal the anchor: ${out.head}")
  }
}
