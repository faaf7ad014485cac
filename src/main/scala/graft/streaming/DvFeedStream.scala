package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables._
import graft.queries.Warehouse

/** ST27 — STREAMING the deletion-vector change feed (the st26×o24
  * composition): st26 streams the o20 snapshot-diff feed, paying two
  * version scans and a key shuffle per commit; for an o22 table the
  * commit METADATA already says what changed, so the streaming consumer
  * derives each arriving version's feed the o24 way — bootstrap insert
  * for v1 (a blind append: every row an insert), the broadcast
  * vector-delta semi-join for DV-only commits, an EMPTY feed for
  * OPTIMIZE (zero scans). This is the feed path a 100 TB
  * right-to-be-forgotten pipeline runs: the GDPR delete commits O(100)
  * rows of mask metadata and the downstream consumer processes exactly
  * those rows, never a snapshot join.
  *
  * Machinery is st26's: the o16/o22 CAS manifest chain IS the
  * notification channel (a new commit = a new manifest file), a file
  * stream over `manifest-*` delivers versions in commit order, and
  * foreachBatch appends each version's metadata-derived feed.
  * Incrementality is driven for REAL: run 1 consumes v1–v2; v3 (second
  * DV delete) and v4 (OPTIMIZE) commit after it terminates; the
  * checkpointed restart processes EXACTLY v3 and v4 (attempts ledger).
  * In-op requires: the OPTIMIZE version contributes zero feed rows, and
  * folding the streamed feed version-by-version over an EMPTY table
  * reproduces the latest masked read exactly (the o20/st26 apply
  * algebra, which is what makes the feed a consumer can trust).
  *
  * Scale shape per commit: one manifest discovery (metadata); v1 pays
  * its own scan once (the bootstrap); each DV commit pays O(deleted)
  * broadcast metadata + one semi-joined scan of the shared token;
  * OPTIMIZE pays nothing. Nothing ever rescans history.
  */
object DvFeedStream {

  private val cols = Seq("doc_id", "lang", "source")

  /** One version's arrival: the metadata-derived feed, tagged and
    * written IDEMPOTENTLY to the version's own deterministic path
    * (overwrite — a replay after a crash between the feed write and
    * the ledger append rewrites the same bytes instead of duplicating
    * them; consumers read the feed root recursively). v=1 is the
    * bootstrap — every row an insert. (Shared with st28's
    * retention-guarded consumer.) */
  private[streaming] def feedVersion(s: SparkSession, base: String, v: Int,
      feedDir: String): Unit = {
    val feed =
      if (v == 1)
        Warehouse.o22Read(s, base, 1).select(cols.map(col): _*)
          .withColumn("change_type", lit("insert"))
      else Warehouse.o24FeedOf(s, base, v - 1, cols)
    feed.withColumn("version", lit(v))
      .write.mode("overwrite").parquet(s"$feedDir/v$v")
  }

  def st27StreamDvFeed(s: SparkSession, d: String): DataFrame =
    CatchupConf.withBoundedStatePartitions(s) {
    val root = java.nio.file.Files.createTempDirectory("graft_st27_")
    val table = root.resolve("table"); java.nio.file.Files.createDirectory(table)
    val base = table.toString
    val feedDir = root.resolve("feed").toString
    val attempts = root.resolve("attempts")
    val cp = root.resolve("cp").toString
    try {
      val docs = documents(s, d).select(col("doc_id"), col("lang"),
        col("source"))
      def stamp(v: Int): Unit =
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(base, s"manifest-$v"),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + v * 60000L))
      Warehouse.o16Stage(base, "w0", docs.repartition(4))
      require(Warehouse.o22Commit(base, 1, "w0", None),
        "st27: v1 commit failed")
      stamp(1)
      require(Warehouse.o22Delete(s, base, col("doc_id") % 10 === 3, "a") == 2,
        "st27: v2 delete landed at the wrong version")
      stamp(2)
      def runOnce(): Unit = {
        val manifests = s.readStream
          .option("pathGlobFilter", "manifest-*")
          .option("maxFilesPerTrigger", "1")
          .text(base)
          .select(col("_metadata.file_path").as("path"))
        val q = manifests.writeStream
          .foreachBatch { (bdf: DataFrame, _: Long) =>
            // driver-sized by construction: one row per LINE of a new
            // manifest — an o22 DV manifest is two lines, so the path
            // list must dedupe or the version would feed twice
            val vs = bdf.collect().map(_.getString(0)
              .replaceAll(".*manifest-", "").toInt).distinct.sorted
            // replay idempotence: a batch re-fired after a crash between
            // the feed write and the checkpoint commit must not re-feed —
            // the attempts ledger doubles as the processed-version set
            val fed: Set[Int] =
              if (java.nio.file.Files.exists(attempts))
                new String(java.nio.file.Files.readAllBytes(attempts),
                  java.nio.charset.StandardCharsets.UTF_8)
                  .split("\n").filter(_.nonEmpty).map(_.toInt).toSet
              else Set.empty
            vs.filterNot(fed).foreach { v =>
              // the st28 retention guard: an unread version vacuumed
              // from under the consumer fails loudly, never skips
              FeedRetention.requireNoGap(base, fed, v)
              // feed FIRST (idempotent per-version overwrite), ledger
              // SECOND: the old ledger-first order turned a crash in
              // between into a permanently skipped version — silent
              // feed loss
              feedVersion(s, base, v, feedDir)
              java.nio.file.Files.write(attempts,
                s"$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8),
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.APPEND)
            }
            ()
          }
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        CatchupConf.awaitBounded(q, "st27")
      }
      runOnce()
      def tried: Seq[Int] =
        new String(java.nio.file.Files.readAllBytes(attempts),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).map(_.toInt).toSeq
      require(tried == Seq(1, 2),
        s"st27: run 1 must consume exactly v1,v2 in order — got $tried")
      // the second delete AND the optimize land after run 1 terminated;
      // the checkpointed restart picks up only them
      require(Warehouse.o22Delete(s, base, col("lang") === "de", "b") == 3,
        "st27: v3 delete landed at the wrong version")
      stamp(3)
      require(Warehouse.o22Optimize(s, base, "w1") == 4,
        "st27: v4 optimize landed at the wrong version")
      stamp(4)
      runOnce()
      require(tried == Seq(1, 2, 3, 4),
        s"st27: the restart must feed exactly v3,v4 — got $tried")

      val feed = s.read.option("recursiveFileLookup", "true")
        .parquet(feedDir).localCheckpoint()
      require(feed.filter(col("version") === 4).isEmpty,
        "st27: the OPTIMIZE commit must contribute zero feed rows")
      // fold the feed over empty: inserts land, deletes remove — the
      // result must be the latest masked read exactly
      val applied = (1 to 4).foldLeft(
          feed.limit(0).select(cols.map(col): _*)) { (acc, v) =>
        val fv = feed.filter(col("version") === v)
        acc.join(fv.filter(col("change_type") === "delete")
            .select("doc_id"), Seq("doc_id"), "left_anti")
          .unionByName(fv.filter(col("change_type") === "insert")
            .select(cols.map(col): _*))
      }
      val latest = Warehouse.o22Read(s, base, 4)
      require(Warehouse.symEqual(applied, latest, cols),
        "st27: folding the streamed feed over empty must reproduce v4")
      feed.select(col("version"), col("doc_id"), col("lang"),
          col("source"), col("change_type"))
        .orderBy("version", "doc_id")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  val st27Sql: String =
    """SELECT * FROM (
      |  SELECT 1 AS version, doc_id, lang, source,
      |    'insert' AS change_type
      |  FROM documents
      |  UNION ALL
      |  SELECT 2, doc_id, lang, source, 'delete'
      |  FROM documents WHERE doc_id % 10 = 3
      |  UNION ALL
      |  SELECT 3, doc_id, lang, source, 'delete'
      |  FROM documents WHERE doc_id % 10 <> 3 AND lang = 'de')
      |ORDER BY version, doc_id""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st27_stream_dv_feed" -> st27StreamDvFeed,
  )

  val oracle: Map[String, String] = Map(
    "st27_stream_dv_feed" -> st27Sql,
  )
}
