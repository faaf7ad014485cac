package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared shuffle-partition scope for the BOUNDED streaming catch-up
  * rows (st4s–st10): a stateful streaming query instantiates state
  * stores per shuffle partition per stateful operator (a stream-stream
  * join holds FOUR per partition), and every micro-batch pays a
  * setup/commit round per store. At the session's 32 partitions that is
  * pure fixed overhead for a catch-up run over a staged file — measured
  * on st4s, 32 → 8 partitions cut the run 2.5× with the result
  * hash-unchanged (the oracle re-certifies every row).
  *
  * Production sizing note: this is the same knob a real deployment
  * sizes to cluster cores × state volume — and it must be set BEFORE
  * `start()`, because the value is pinned into the checkpoint for the
  * query's lifetime. The scope restores the caller's setting on exit,
  * so batch queries in the same session keep their 32-way shuffles.
  *
  * CONCURRENCY CONTRACT: the scope mutates the SESSION-GLOBAL
  * `spark.sql.shuffle.partitions` and assumes SEQUENTIAL execution on
  * the session (Verify/Bench run queries one at a time; scalatest runs
  * suites sequentially). A future parallel harness running a batch
  * query concurrently with a scoped catch-up would silently plan that
  * batch at `n` partitions, and nested scopes would restore stale
  * values — under a parallel runner, give each catch-up its own
  * `spark.newSession()` (per-session conf) instead of this scope.
  */
object CatchupConf {

  val boundedStatePartitions = 8

  /** RocksDB state store (r10 verdict #3): the default HDFS-backed
    * provider keeps every store's working set in executor HEAP —
    * acceptable for a bounded catch-up, but stream-stream outer joins
    * ([[IntervalJoin]]) hold BOTH sides' rows until watermark eviction,
    * so state grows with event volume × watermark horizon and the heap
    * becomes the scale ceiling. RocksDB spills state to local SSD with
    * a bounded block-cache, which is the production answer at 100×
    * event volume: state capacity becomes a disk budget, not a heap
    * budget. Scoped here so every real streaming row certifies under
    * the provider a large deployment would actually run.
    */
  val rocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Conf scope for every real (micro-batch-executed) streaming row:
    * bounded state partitions + RocksDB state store, prior values
    * restored on exit (set-or-unset, matching what was there — never
    * engine defaults).
    */
  def withBoundedStatePartitions[A](s: SparkSession,
      n: Int = boundedStatePartitions)(body: => A): A = {
    val scoped = Seq(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.streaming.stateStore.providerClass" -> rocksDbProvider,
      // changelog checkpointing (public Spark 3.4+ RocksDB option, the
      // documented production recommendation): per batch, upload only
      // the changelog instead of a full RocksDB snapshot — snapshot
      // cost moves to the background maintenance thread. At scale this
      // is what keeps per-batch commit latency independent of state
      // SIZE (a full snapshot grows with the store; the changelog grows
      // with the batch). Measured locally: ~20% off the stream-stream
      // join rows' wall time.
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true")
    val prior = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Stage tagged slices of ONE frame as single-file parquet batches
    * (`<dir>/<tag>.parquet`), mtime-bumped in `tags` order so a
    * `maxFilesPerTrigger=1` file stream delivers them as separate
    * micro-batches in that order. One clustered write job instead of
    * one write job per slice — the arrival waves are harness setup;
    * what the stream sees (file set, contents, mtime order) is
    * byte-for-byte what the per-slice writes produced. */
  def stageTagged(df: DataFrame, tagCol: Column, dir: java.nio.file.Path,
      tags: Seq[String], mtimeStepMs: Long = 60000L): Unit = {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val scratch = dir.resolve(".stage_scratch")
    // partitionBy keeps the tag column OUT of the staged files, and the
    // per-tag repartition keeps each slice to one part file
    df.withColumn("__tag", tagCol).repartition(col("__tag"))
      .write.partitionBy("__tag").parquet(scratch.toString)
    val now = System.currentTimeMillis()
    tags.zipWithIndex.foreach { case (tag, i) =>
      val sub = scratch.resolve(s"__tag=$tag")
      require(java.nio.file.Files.isDirectory(sub),
        s"stageTagged: slice $tag staged empty")
      val part = graft.Tables.listDir(sub)
        .find(_.toString.endsWith(".parquet")).get
      val target = dir.resolve(s"$tag.parquet")
      java.nio.file.Files.copy(part, target)
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(now + i * mtimeStepMs))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
  }

  /** Default per-row stream completion bound; override with
    * `SPARK_GRAFT_STREAM_TIMEOUT_MS` when the corpus is deliberately
    * enlarged (the 100× composition bench: the st4s join state is 100×
    * the base volume — legitimate work, not a hang). Malformed values
    * fall back to the default (the Bench reps rule). */
  private def streamTimeoutMs: Long =
    sys.env.get("SPARK_GRAFT_STREAM_TIMEOUT_MS")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0)
      .getOrElse(180000L)

  /** Await an AvailableNow query within the configured bound, STOPPING
    * the query before failing. The r17 100× composition run exposed
    * the leak this closes: a timed-out require left the stream
    * running, its finally deleted the staging dir under it, and the
    * orphaned join state eventually took the whole SparkContext down
    * (Spark's uncaught-fatal handler) — every query after it died on a
    * stopped context. A timeout must kill the stream it is giving up
    * on; a failed await likewise must not leak it.
    */
  def awaitBounded(q: org.apache.spark.sql.streaming.StreamingQuery,
      what: String): Unit = {
    val ms = streamTimeoutMs
    val ok =
      try q.awaitTermination(ms)
      catch { case e: Throwable =>
        scala.util.Try(q.stop())
        throw e
      }
    if (!ok) {
      scala.util.Try(q.stop())
      throw new IllegalArgumentException(
        s"requirement failed: $what stream did not finish within ${ms}ms " +
          "(raise SPARK_GRAFT_STREAM_TIMEOUT_MS for deliberately " +
          "enlarged corpora)")
    }
  }
}
