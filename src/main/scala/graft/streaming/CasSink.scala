package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables._
import graft.queries.Warehouse

/** ST25 — exactly-once streaming INTO the o16 CAS snapshot table: the
  * public Delta-Lake streaming-sink shape (idempotent writes keyed by
  * (appId, batchId) against the transaction log), composed from the
  * pieces the surface already certifies separately — st14's
  * at-least-once replay window and o16's optimistic manifest commit.
  *
  * Where st14 dedupes replays with a SIDE marker file, here the
  * TRANSACTION LOG ITSELF is the idempotence mechanism: each micro-batch
  * stages its data under the batch-keyed token `batch-<id>` and commits
  * one manifest naming that token through the o16 create-if-absent CAS.
  * A batch replayed after a crash that hit AFTER its commit but BEFORE
  * Spark's checkpoint recorded it (the exact window this row injects)
  * finds a manifest already naming its token and SKIPS — no duplicate
  * version, no duplicate rows — while a batch replayed after a
  * pre-commit crash re-stages (overwrite of its own unique token, never
  * a race) and commits normally. Readers resolve strictly through the
  * manifest chain: the table is the union of committed versions (the
  * add-file log model), so a half-staged batch is invisible.
  *
  * Scale shape: the probe is one directory listing of manifest names
  * per batch, the commit one metadata create — both independent of
  * batch or table size; data files never rewrite after commit. N
  * concurrent stream shards would interleave through the same CAS,
  * each retrying only its own commit (o16's contract).
  */
object CasSink {

  /** The committed manifest versions of an o16 table (metadata-only:
    * one directory listing). */
  private def versions(base: String): Seq[Int] = {
    val names = new java.io.File(base).list()
    if (names == null) Seq.empty
    else names.filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toInt).sorted.toSeq
  }

  private def tokenOf(base: String, v: Int): String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(base, s"manifest-$v")).trim

  /** Idempotent per-batch commit: skip iff some manifest already names
    * this batch's token; otherwise stage (own token — overwrite-safe on
    * replay) and CAS-publish, retrying against newer state on conflict.
    * `beforeCommitHook`/`afterCommitHook` are the harness's crash
    * injection points (no-ops in production use). */
  /** Is `bid` already committed? Newest-first scan with an early exit
    * at the first of this stream's commits with a LOWER batch id — a
    * serial stream commits batch ids in ascending order, so the probe
    * is O(1) amortized (typically one manifest read), not a log scan;
    * the Delta analogue is the per-appId txn pointer. */
  private def committed(base: String, bid: Long): Boolean =
    versions(base).reverseIterator.map(v => tokenOf(base, v))
      .collectFirst {
        case t if t == s"batch-$bid" => true
        // a foreign writer's token is skipped; only THIS stream's
        // numeric batch tokens terminate the scan (a non-numeric
        // "batch-…" token is foreign too, never a terminator)
        case t if t.startsWith("batch-") &&
          scala.util.Try(t.stripPrefix("batch-").toLong)
            .toOption.exists(_ < bid) => false
      }.getOrElse(false)

  private[graft] def commitBatch(base: String, bdf: DataFrame, bid: Long,
      afterCommitHook: () => Unit = () => ()): Unit = {
    val token = s"batch-$bid"
    if (committed(base, bid)) return
    Warehouse.o16Stage(base, token, bdf)
    var done = false
    while (!done) {
      val latest = Warehouse.o16Latest(base)
      done = Warehouse.o16TryPublish(base, token, latest)
    }
    afterCommitHook()
  }

  /** Read the table through the manifest chain: union of every
    * committed version's data, tagged with its version. */
  private[graft] def readLog(s: SparkSession, base: String): DataFrame =
    versions(base)
      .map(v => Warehouse.o16Read(s, base, v).withColumn("version", lit(v)))
      .reduce(_ unionByName _)

  def st25StreamCasSink(s: SparkSession, d: String): DataFrame =
    CatchupConf.withBoundedStatePartitions(s) {
    val rawSchema = eventsRaw(s, d).schema
    val root = java.nio.file.Files.createTempDirectory("graft_st25_")
    val data = root.resolve("data"); java.nio.file.Files.createDirectory(data)
    val table = root.resolve("table"); java.nio.file.Files.createDirectory(table)
    val base = table.toString
    val attempts = root.resolve("attempts")
    val failFlag = root.resolve("fail_once")
    val cp = root.resolve("cp").toString

    def writeBatch(bdf: DataFrame, bid: Long): Unit = {
      java.nio.file.Files.write(attempts,
        s"$bid\n".getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      commitBatch(base, bdf.select(col("ts"), col("event_type"),
          col("value")), bid,
        // the injected crash fires AFTER the manifest commit but BEFORE
        // Spark's checkpoint records the batch — the window only the
        // transaction log itself can dedupe (st14's side marker would
        // equally be written by then; the point is the LOG carries the
        // idempotence, no second mechanism)
        afterCommitHook = () =>
          if (java.nio.file.Files.deleteIfExists(failFlag))
            sys.error("st25: injected crash after commit, before checkpoint"))
    }

    def runOnce(): Unit = {
      val streamEv = normalizeTs(s.readStream
        .schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(data.toString))
      val q = streamEv.writeStream
        .foreachBatch((bdf: DataFrame, bid: Long) => writeBatch(bdf, bid))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      CatchupConf.awaitBounded(q, "st25")
    }

    try {
      val src = java.nio.file.Paths.get(s"$d/events.parquet")
      java.nio.file.Files.copy(src, data.resolve("a.parquet"))
      java.nio.file.Files.createFile(failFlag)
      val crashed =
        try { runOnce(); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            def chain(t: Throwable): Seq[String] =
              if (t == null) Seq.empty
              else Option(t.getMessage).toSeq ++ chain(t.getCause)
            require(chain(e).exists(_.contains("injected crash")),
              s"st25: run 1 failed for the wrong reason: ${e.getMessage}")
            true
        }
      require(crashed,
        "st25: injected crash did not fire - harness lost its failure path")
      java.nio.file.Files.copy(src, data.resolve("b.parquet"))
      runOnce()
      val tries = new String(java.nio.file.Files.readAllBytes(attempts),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
      require(tries.count(_ == "0") == 2,
        s"st25: batch 0 entered ${tries.count(_ == "0")} times, expected 2 " +
          "(crashed-after-commit attempt + skipped replay)")
      // the log holds EXACTLY one version per batch — the replayed
      // batch 0 detected its own prior commit in the manifest chain
      require(versions(base) == Seq(1, 2),
        s"st25: expected versions {1,2}, got ${versions(base)}")
      require(tokenOf(base, 1) == "batch-0" && tokenOf(base, 2) == "batch-1",
        "st25: version chain must map 1:1 onto batch ids")
      readLog(s, base)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("version")).as("n_versions"),
          dsum(col("value")).as("total_value"))
        .localCheckpoint()
        .orderBy("event_type")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  /** Two staged copies of the corpus, one committed version each —
    * a duplicated batch-0 commit would show 2× its share and 3
    * versions. */
  val st25Sql: String =
    """SELECT event_type, 2 * count(*) AS n, CAST(2 AS BIGINT) AS n_versions,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 2 AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st25_stream_cas_sink" -> st25StreamCasSink,
  )

  val oracle: Map[String, String] = Map(
    "st25_stream_cas_sink" -> st25Sql,
  )
}
