package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time window aggregations over `events` — the Structured
  * Streaming surface (SURVEY §2.8: the reference's poll-until-stable /
  * stability-gate behaviors re-expressed as real event-time windows).
  *
  * The transforms are pure `DataFrame => DataFrame` and run unchanged on
  * a batch scan or a `readStream` source — the streaming spec feeds the
  * same functions through `readStream` + watermark +
  * `Trigger.AvailableNow` and asserts parity with the batch result
  * (exactly the "process what exists, bounded catch-up" semantics of T1).
  *
  * Scale: tumbling/sliding aggs shuffle once on (window, event_type);
  * with watermarking, state per key is bounded by (windows in flight ×
  * key cardinality) — no unbounded state.
  */
object EventWindows {

  /** Tumbling 5-minute windows per event type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding 10-minute windows, 5-minute slide, per event type. */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** ST1 — batch tumbling-window aggregation (oracle-comparable). */
  def st1Tumbling(s: SparkSession, d: String): DataFrame =
    tumbling(events(s, d)).orderBy("window_start", "event_type")

  val st1Sql: String =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** ST2 — batch sliding-window aggregation: each event contributes to
    * the two 10-minute windows whose start is within (ts-10m, ts] on the
    * 5-minute grid; the oracle expands the membership explicitly.
    */
  def st2Sliding(s: SparkSession, d: String): DataFrame =
    sliding(events(s, d)).orderBy("window_start", "event_type")

  val st2Sql: String =
    """SELECT window_start, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM (
      |  SELECT time_bucket(INTERVAL '5 minutes', ts)
      |           - (o * INTERVAL '5 minutes') AS window_start,
      |         event_type, value
      |  FROM events CROSS JOIN (VALUES (0), (1)) offs(o))
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_tumbling_window" -> st1Tumbling,
    "st2_sliding_window" -> st2Sliding,
  )

  val oracle: Map[String, String] = Map(
    "st1_tumbling_window" -> st1Sql,
    "st2_sliding_window" -> st2Sql,
  )
}
