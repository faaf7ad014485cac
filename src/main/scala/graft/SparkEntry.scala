package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * SURVEY.md §2 operator family plus the large-scale training-data
  * extensions); `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-compare. Column names/aliases are kept identical on both
  * sides, results are deterministically ordered, and double aggregates go
  * through exact decimal sums (see [[Tables.dsum]]) so hashes are stable
  * across engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.q2RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data extensions (dedup, similarity, text analysis,
    * enrichment, event-time windows). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.Joins.defs ++
      _root_.graft.queries.Functions.defs ++
      _root_.graft.queries.Scalars.defs ++
      _root_.graft.queries.Normalize.defs ++
      _root_.graft.queries.Incremental.defs ++
      _root_.graft.queries.Ingest.defs ++
      _root_.graft.queries.Curation.defs ++
      _root_.graft.queries.Dedup.defs ++
      _root_.graft.queries.Similarity.defs ++
      _root_.graft.queries.TextAnalysis.defs ++
      _root_.graft.queries.Enrich.defs ++
      _root_.graft.queries.Multimodal.defs ++
      _root_.graft.queries.Sketches.defs ++
      _root_.graft.queries.Layout.defs ++
      _root_.graft.queries.Warehouse.defs ++
      _root_.graft.queries.WarehouseDeletes.defs ++
      _root_.graft.queries.WarehouseSafety.defs ++
      _root_.graft.queries.RowTracking.defs ++
      _root_.graft.queries.EndToEnd.defs ++
      _root_.graft.streaming.EventWindows.defs ++
      _root_.graft.streaming.Sessionize.defs ++
      _root_.graft.streaming.IntervalJoin.defs ++
      _root_.graft.streaming.StreamDedup.defs ++
      _root_.graft.streaming.StreamNearDup.defs ++
      _root_.graft.streaming.StreamDecontam.defs ++
      _root_.graft.streaming.StreamQuality.defs ++
      _root_.graft.streaming.StreamDsir.defs ++
      _root_.graft.streaming.CdcMerge.defs ++
      _root_.graft.streaming.CasSink.defs ++
      _root_.graft.streaming.CdfStream.defs ++
      _root_.graft.streaming.DvFeedStream.defs ++
      _root_.graft.streaming.FeedRetention.defs ++
      _root_.graft.streaming.CdcEqDelete.defs ++
      _root_.graft.streaming.GapDetect.defs ++
      _root_.graft.streaming.FunnelDetect.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.Relational.oracle ++
      _root_.graft.queries.Joins.oracle ++
      _root_.graft.queries.Functions.oracle ++
      _root_.graft.queries.Scalars.oracle ++
      _root_.graft.queries.Normalize.oracle ++
      _root_.graft.queries.Incremental.oracle ++
      _root_.graft.queries.Ingest.oracle ++
      _root_.graft.queries.Curation.oracle ++
      _root_.graft.queries.Dedup.oracle ++
      _root_.graft.queries.Similarity.oracle ++
      _root_.graft.queries.TextAnalysis.oracle ++
      _root_.graft.queries.Enrich.oracle ++
      _root_.graft.queries.Multimodal.oracle ++
      _root_.graft.queries.Sketches.oracle ++
      _root_.graft.queries.Layout.oracle ++
      _root_.graft.queries.Warehouse.oracle ++
      _root_.graft.queries.WarehouseDeletes.oracle ++
      _root_.graft.queries.WarehouseSafety.oracle ++
      _root_.graft.queries.RowTracking.oracle ++
      _root_.graft.queries.EndToEnd.oracle ++
      _root_.graft.streaming.EventWindows.oracle ++
      _root_.graft.streaming.Sessionize.oracle ++
      _root_.graft.streaming.IntervalJoin.oracle ++
      _root_.graft.streaming.StreamDedup.oracle ++
      _root_.graft.streaming.StreamNearDup.oracle ++
      _root_.graft.streaming.StreamDecontam.oracle ++
      _root_.graft.streaming.StreamQuality.oracle ++
      _root_.graft.streaming.StreamDsir.oracle ++
      _root_.graft.streaming.CdcMerge.oracle ++
      _root_.graft.streaming.CasSink.oracle ++
      _root_.graft.streaming.CdfStream.oracle ++
      _root_.graft.streaming.DvFeedStream.oracle ++
      _root_.graft.streaming.FeedRetention.oracle ++
      _root_.graft.streaming.CdcEqDelete.oracle ++
      _root_.graft.streaming.GapDetect.oracle ++
      _root_.graft.streaming.FunnelDetect.oracle
}
