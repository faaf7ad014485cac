package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST21 — streaming benchmark decontamination: c11's exact
  * [[graft.queries.Curation.C11K]]-gram collision gate executed as a
  * real stream over the crawl. A training-data pipeline does not
  * decontaminate once at the end — it gates documents AS THEY ARRIVE
  * against a fixed eval-set gram index. The bench gram set is built
  * ONCE from the batch side (eval sets don't grow with the crawl) and
  * broadcast into every micro-batch; each arriving document is
  * gram-exploded map-side and counted against the broadcast membership
  * set. Flagged documents (≥1 colliding gram ⇒ ≥1 verbatim
  * [[graft.queries.Curation.C11K]]-token run) land in the sink with
  * their collision count.
  *
  * The streaming part is deliberately STATELESS: a document's grams
  * are confined to its own micro-batch, so the per-doc count is
  * batch-local (foreachBatch = per-batch exact aggregation, the st16
  * discipline), the bench side is a broadcast constant, and no state
  * store exists to size, checkpoint, or evict — result identity under
  * ANY batching is structural, and `StreamDecontamSpec` pins it
  * against the batch twin. Restart cost is zero (the st18 index
  * lesson: state in files, not stream state — here there is no state
  * at all).
  *
  * Scale shape per batch: gram explosion is map-side; the membership
  * join is a broadcast hash semi-join (bench grams are eval-set
  * bounded); the per-doc count is a doc-keyed map-side-combinable
  * aggregation within the batch. At 100 TB of crawl this is the same
  * per-batch plan at any history length — the contrast with c11's
  * batch run is WHEN the gate runs, not what it costs. At production
  * eval-set sizes the broadcast gram set is the d14 note's 64-bit
  * fingerprint, not the string.
  */
object StreamDecontam {

  def st21StreamDecontam(s: SparkSession, d: String): DataFrame =
    CatchupConf.withBoundedStatePartitions(s) {
    import graft.queries.Curation
    // materialized once: the quote-injected corpus (a union with two
    // joins) otherwise derives twice — once under the bench-gram build,
    // once under the train staging write
    val corpus = Curation.c11Corpus(
      graft.Tables.documents(s, d).select("doc_id", "text"))
      .localCheckpoint()
    val isBench = col("doc_id") % 25 === 0 && col("doc_id") < 1000000L
    // the fixed eval side: distinct bench grams, built once up front
    val benchGrams = Curation.c11GramsOf(corpus.filter(isBench))
      .select("gram").distinct().localCheckpoint()
    val train = corpus.filter(!isBench)

    val dir = java.nio.file.Files.createTempDirectory("graft_st21_")
    val inDir = dir.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    val sinkDir = dir.resolve("flagged").toString
    try {
      // two mtime-ordered arrival waves in ONE clustered staging job;
      // the split is id-parity so both waves carry planted contaminated
      // docs
      CatchupConf.stageTagged(train,
        when(col("doc_id") % 2 === 0, lit("a_even")).otherwise(lit("b_odd")),
        inDir, Seq("a_even", "b_odd"))

      val stream = s.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          gateBatch(s, benchGrams, sinkDir, batch)
        }
        .trigger(Trigger.AvailableNow()).start()
      CatchupConf.awaitBounded(q, "st21")
      require(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "st21: the staged waves collapsed into one micro-batch — the " +
          "cross-batch claim would be untested")
      s.read.parquet(sinkDir).localCheckpoint().orderBy("train_doc")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  /** The foreachBatch body, factored for `StreamDecontamSpec`: explode
    * the batch's grams map-side, count collisions against the broadcast
    * bench membership set per document, append flagged docs to the
    * sink. */
  private[graft] def gateBatch(s: SparkSession, benchGrams: DataFrame,
      sinkDir: String, batch: DataFrame): Unit =
    gateRelation(benchGrams, batch)
      .write.mode("append").parquet(sinkDir)

  /** The per-batch gate as a relation (the plan `DumpPlans` renders):
    * map-side gram explosion → broadcast bench semi-join → doc-keyed
    * map-side-combinable count. */
  private[graft] def gateRelation(benchGrams: DataFrame,
      batch: DataFrame): DataFrame =
    graft.queries.Curation.c11GramsOf(batch)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id").as("train_doc"))
      .agg(count(lit(1)).as("n_hit_grams"))

  val st21Sql: String =
    s"""${graft.queries.Curation.c11CorpusGramsSqlCtes},
      |bg AS (SELECT DISTINCT gram FROM grams
      |       WHERE doc_id % 25 = 0 AND doc_id < 1000000),
      |tg AS (SELECT doc_id AS train_doc, gram FROM grams
      |       WHERE NOT (doc_id % 25 = 0 AND doc_id < 1000000))
      |SELECT train_doc, CAST(count(*) AS BIGINT) AS n_hit_grams
      |FROM tg JOIN bg USING (gram)
      |GROUP BY train_doc ORDER BY train_doc""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st21_stream_decontam" -> st21StreamDecontam,
  )

  val oracle: Map[String, String] = Map(
    "st21_stream_decontam" -> st21Sql,
  )
}
