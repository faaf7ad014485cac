package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpecBase {

  test("advance: pure session merge handles gaps, order, carry-over") {
    import Sessionize._
    val m = 60L * 1000000L // one minute in micros
    // out-of-order batch: sorted internally
    val (closed0, open0) = advance(None, Seq(
      Ev(2, 1, 5 * m, 2.0), Ev(1, 1, 0 * m, 1.0), Ev(3, 1, 30 * m, 3.0)))
    assert(closed0 == Seq(OpenSession(0, 5 * m, 2, 3.0)))
    assert(open0.contains(OpenSession(30 * m, 30 * m, 1, 3.0)))
    // next batch continues the open session then breaks it
    val (closed1, open1) = advance(open0, Seq(
      Ev(4, 1, 35 * m, 1.5), Ev(5, 1, 120 * m, 9.0)))
    assert(closed1 == Seq(OpenSession(30 * m, 35 * m, 2, 4.5)))
    assert(open1.contains(OpenSession(120 * m, 120 * m, 1, 9.0)))
    // empty batch: state unchanged
    val (closed2, open2) = advance(open1, Seq.empty)
    assert(closed2.isEmpty && open2 == open1)
  }

  test("advance: cross-batch out-of-order events extend or seal, never corrupt") {
    import Sessionize._
    val m = 60L * 1000000L
    val open = Some(OpenSession(100 * m, 105 * m, 2, 5.0))
    val (closed, openNow) = advance(open, Seq(
      Ev(9, 1, 10 * m, 1.0), // straggler far older than the session
      Ev(10, 1, 95 * m, 2.0), // inside [start-gap, end+gap]: extends start
      Ev(11, 1, 103 * m, 3.0)))
    assert(closed == Seq(OpenSession(10 * m, 10 * m, 1, 1.0)))
    assert(openNow.contains(OpenSession(95 * m, 105 * m, 4, 10.0)))

    // multiple stragglers within a gap of each other merge into ONE
    // sealed session, matching batch semantics
    val (closedM, openM) = advance(Some(OpenSession(100 * m, 105 * m, 2, 5.0)),
      Seq(Ev(20, 1, 5 * m, 1.0), Ev(21, 1, 7 * m, 2.0)))
    assert(closedM == Seq(OpenSession(5 * m, 7 * m, 2, 3.0)))
    assert(openM.contains(OpenSession(100 * m, 105 * m, 2, 5.0)))
  }

  test("event-time sessionize seals sessions when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 03:$min%02d:00")

    val evs = mem.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.EvT]
    val q = Sessionize.sessionizeStreamEventTime(evs)
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("update").start()
    try {
      // user 1: two events, 3-minute gap → one session
      mem.addData((1L, 1L, ts(0), 1.0), (2L, 1L, ts(3), 2.0))
      q.processAllAvailable()
      // watermark jumps past end+gap via another user's event at 03:30
      mem.addData((3L, 2L, ts(30), 9.0))
      q.processAllAvailable()
      // trigger one more batch so the event-time timeout fires
      mem.addData((4L, 2L, ts(31), 1.0))
      q.processAllAvailable()

      val sealedU1 = spark.table("et_sessions")
        .filter(col("user_id") === 1 && !col("open")).collect()
      assert(sealedU1.length == 1, "user 1 session not sealed by watermark")
      val s = sealedU1.head
      assert(s.getAs[Long]("n_events") == 2 &&
        s.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("streaming flatMapGroupsWithState == batch sessionization") {
    import spark.implicits._
    val batchEv = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val rawSchema = Tables.eventsRaw(spark, sf).schema
    val rawStream = spark.readStream
      .schema(rawSchema)
      .parquet(dir.toString)
    val streamEvs = rawStream
      .select(col("event_id"), col("user_id"),
        Tables.tsMicros(rawStream).as("tsMicros"), col("value"))
      .as[Sessionize.Ev]

    // finite AvailableNow run: no idle timeout (see sessionizeStream doc)
    val q = Sessionize.sessionizeStream(streamEvs, idleTimeout = None)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")

    // latest update per (user, session_start) wins; with one AvailableNow
    // batch every session appears exactly once (closed or open)
    val streamed = spark.table("sessions_stream")
      .groupBy("user_id", "session_start")
      .agg(max(struct(col("session_end"), col("n_events"), col("total_value"))).as("s"))
      .select(col("user_id"), col("session_start"),
        col("s.session_end"), col("s.n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val batch = Sessionize.st3Sessionize(spark, sf)
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
