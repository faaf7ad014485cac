package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Beyond-reference join operators (SURVEY §2.4 notes the reference has
  * no relational join engine; equi/broadcast/anti joins are exercised in
  * Relational/Enrich). Here: the time-series joins Spark lacks as
  * builtins, composed scale-first from exchange + window primitives.
  */
object Joins {

  /** J1 — as-of join: each probe row (click events) picks up the most
    * recent snapshot value (purchase events, deduped per (user, ts)) at
    * or before its timestamp.
    *
    * Spark-first shape: NOT a windowed theta-join (quadratic per key) —
    * tag both sides, union, and carry the last non-null snapshot value
    * forward over a (user, time) window. ONE shuffle on user_id, linear
    * scan per partition; the classic scalable as-of. Ties: a snapshot at
    * exactly the probe's ts applies (side 0 sorts before side 1), equal
    * probes commute (all carry the same value), equal snapshots are
    * pre-aggregated away.
    *
    * The DuckDB oracle replays it with a native ASOF LEFT JOIN —
    * independent implementation, same semantics.
    */
  def j1AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val snaps = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("snap_value"))
    val probes = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val tagged = snaps.select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), col("snap_value"))
      .unionByName(probes.select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(null).cast("double").as("snap_value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_value", last(col("snap_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_value"))
      .orderBy("event_id")
  }

  val j1Sql: String =
    """WITH snaps AS (
      |  SELECT user_id, ts, max(value) AS snap_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |probes AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts, s.snap_value AS asof_value
      |FROM probes p ASOF LEFT JOIN snaps s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_asof_join" -> j1AsofJoin,
  )

  val oracle: Map[String, String] = Map(
    "j1_asof_join" -> j1Sql,
  )
}
