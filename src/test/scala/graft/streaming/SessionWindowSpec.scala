package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the st15 gap-boundary semantics its oracle relies on: Spark's
  * `session_window` merges INCLUSIVELY — two events exactly one gap
  * apart share a session, one microsecond beyond the gap splits. That
  * is the same `<= gap` island rule st3/st7 implement, so all three
  * sessionization forms in the surface agree event-for-event and st15
  * can reuse st7's oracle SQL. Measured, not assumed: the boundary is
  * invisible in the testdata (µs-resolution gaps never land exactly on
  * 10 minutes), so without this pin an engine change here would
  * hash-diverge only on some future corpus.
  */
class SessionWindowSpec extends SparkSpecBase {

  private def sessions(secondTsUs: Long): Long = {
    import spark.implicits._
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    Seq((1L, 7L, t0), (2L, 7L, secondTsUs + t0))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .groupBy(session_window(col("ts"),
        s"${Sessionize.gapMinutes} minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .count()
  }

  test("session_window gap is inclusive, matching the st3/st7 <=-gap islands") {
    val gapUs = Sessionize.gapMinutes * 60L * 1000000L
    // exactly one gap apart: one session — inclusive merge
    assert(sessions(gapUs) == 1)
    // one microsecond beyond: two sessions
    assert(sessions(gapUs + 1) == 2)
    // and the custom-state operator agrees at the same boundary
    val t0 = 1704067200000000L
    val (closedAt, openAt) = Sessionize.advance(None, Seq(
      Sessionize.Ev(1L, 7L, t0, 0.0),
      Sessionize.Ev(2L, 7L, t0 + gapUs, 0.0)))
    assert(closedAt.isEmpty && openAt.exists(_.n == 2))
    val (closedOver, openOver) = Sessionize.advance(None, Seq(
      Sessionize.Ev(1L, 7L, t0, 0.0),
      Sessionize.Ev(2L, 7L, t0 + gapUs + 1, 0.0)))
    assert(closedOver.size == 1 && openOver.exists(_.n == 1))
  }
}
