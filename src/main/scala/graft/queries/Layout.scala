package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scan-elimination layouts (r12 verdict "next round" #2). j4 proved the
  * SHUFFLE-elimination layout (bucketing); this family proves the
  * SCAN-elimination one: data range-clustered on the predicate column so
  * parquet min/max statistics let a reader skip everything outside the
  * queried range. At 100 TB this is the single biggest lever a layout
  * owns — partition/file/row-group pruning is how a full-corpus scan
  * becomes a 1% scan — and it is a property of HOW THE DATA WAS WRITTEN,
  * not of the query plan, which is why it earns an operator of its own.
  */
object Layout {

  private[queries] val PruneFileCount = 8
  private[queries] val PruneLo = "2024-01-10 00:00:00"
  private[queries] val PruneHi = "2024-01-13 00:00:00"

  /** Write `events` range-clustered by `ts` into [[PruneFileCount]]
    * files with pairwise-disjoint ts ranges (`repartitionByRange` — the
    * one shuffle a clustering layout pays, once, at write time — then
    * sorted within each file for page-level locality). The result is a
    * layout where every file's parquet footer carries a tight
    * `[min(ts), max(ts)]` envelope that a range predicate can prune on.
    */
  private[queries] def writeSortedLayout(s: SparkSession, d: String,
      path: String): Unit = {
    // Spark's default parquet timestamp encoding is INT96 — a deprecated
    // type with unusable column statistics, which silently defeats BOTH
    // predicate pushdown and min/max skipping on ts. A clustering layout
    // that exists FOR pruning must write INT64 micros. Set/restore
    // around the write so the operator owns its file format instead of
    // depending on ambient session state.
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = s.conf.get(key)
    s.conf.set(key, "TIMESTAMP_MICROS")
    try events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"),
        col("user_id"), col("value"))
      .repartitionByRange(PruneFileCount, col("ts"))
      .sortWithinPartitions("ts")
      .write.parquet(path)
    finally s.conf.set(key, prior)
  }

  /** A14 — min-max data-skipping proof over the range-clustered layout:
    * a 3-day slice of a 30-day corpus is answered by scanning only the
    * files whose ts envelope intersects the slice. The oracle replays
    * the slice relationally against the ORIGINAL events table, so the
    * hash certifies the clustered layout is lossless and the pruned
    * scan misses nothing. The pruning itself — the scan emits only the
    * intersecting row groups while a round-robin control layout of the
    * same file count scans everything — is pinned on scan metrics in
    * `MinMaxPruneSpec` (the i8 page-prune discipline applied to parquet
    * footer stats). An in-query `require` keeps the proof honest: the
    * ts range predicate must appear in the scan's PushedFilters, or the
    * whole demonstration silently degrades to a post-scan filter.
    *
    * Scale shape: the layout write is one range shuffle (write-time,
    * amortized over every subsequent range query); the read is a
    * file-parallel scan of the intersecting slice only, no shuffle
    * before the bounded per-type aggregate.
    */
  def a14MinmaxPrune(s: SparkSession, d: String): DataFrame = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_a14_" +
      s.sparkContext.applicationId + "_" + Integer.toHexString(d.hashCode) +
      "_" + java.util.UUID.randomUUID().toString.take(8)
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)
    try {
      writeSortedLayout(s, d, s"$base/sorted")
      val sorted = s.read.parquet(s"$base/sorted")
      val sliced = sorted
        .filter(col("ts") >= lit(PruneLo).cast("timestamp") &&
          col("ts") < lit(PruneHi).cast("timestamp"))
      val pushed = sliced.queryExecution.executedPlan.toString
      require(pushed.contains("PushedFilters") &&
        pushed.contains("GreaterThanOrEqual(ts") &&
        pushed.contains("LessThan(ts"),
        "a14: ts range predicate did not reach the parquet scan - " +
          "pruning would be a post-scan filter, not data skipping")
      sliced
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          r6(dsum(col("value"))).as("total_value"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        // scratch is deleted in finally — materialize before leaving
        .localCheckpoint()
        .orderBy("event_type")
    } finally fs.delete(basePath, true)
  }

  val a14Sql: String =
    s"""SELECT event_type, count(*) AS n,
      |  ${r6Sql("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")}
      |    AS total_value,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM events
      |WHERE ts >= TIMESTAMP '$PruneLo' AND ts < TIMESTAMP '$PruneHi'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a14_minmax_prune" -> a14MinmaxPrune,
  )

  val oracle: Map[String, String] = Map(
    "a14_minmax_prune" -> a14Sql,
  )
}
