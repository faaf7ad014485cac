package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** st21 streaming decontamination: result identity with the batch twin
  * under the two-wave staging (batching must not change what gets
  * flagged — the operator is stateless by construction), planted-doc
  * reachability at both quote lengths, and the per-batch gate's exact
  * counting on a synthetic batch.
  */
class StreamDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private val benchPred =
    col("doc_id") % 25 === 0 && col("doc_id") < 1000000L

  test("the stream flags exactly what the batch twin flags") {
    val corpus = graft.queries.Curation.c11Corpus(
      graft.Tables.documents(spark, sf).select("doc_id", "text")).persist()
    try {
      val batchTwin = graft.queries.Curation.c11GramsOf(
          corpus.filter(!benchPred))
        .join(graft.queries.Curation.c11GramsOf(corpus.filter(benchPred))
          .select("gram").distinct(), Seq("gram"), "left_semi")
        .groupBy(col("doc_id").as("train_doc"))
        .agg(count(lit(1)).as("n_hit_grams"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val streamed = StreamDecontam.st21StreamDecontam(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batchTwin,
        s"stream/batch divergence: ${streamed.toSet diff batchTwin.toSet} " +
          s"vs ${batchTwin.toSet diff streamed.toSet}")
      assert(streamed.nonEmpty, "no contamination flagged — injection lost")
    } finally corpus.unpersist()
  }

  test("every eligible planted quote doc is flagged, at its quote's gram count or more") {
    val flagged = StreamDecontam.st21StreamDecontam(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .filter(benchPred)
    val elig13 = docs.filter(col("n") >= 30).select("doc_id")
      .collect().map(_.getLong(0) + 2000000L)
    val elig20 = docs.filter(col("n") >= 48).select("doc_id")
      .collect().map(_.getLong(0) + 3000000L)
    assert(elig13.nonEmpty && elig20.nonEmpty)
    elig13.foreach(id => assert(flagged.getOrElse(id, 0L) >= 1L,
      s"13-token plant $id not flagged"))
    // a 20-token quote carries 8 distinct 13-grams
    elig20.foreach(id => assert(flagged.getOrElse(id, 0L) >= 8L,
      s"20-token plant $id under-counted: ${flagged.get(id)}"))
  }

  test("the gate counts colliding gram positions exactly; clean docs never land") {
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val quote = uniq("q", 20)
    val bench = Seq((0L, quote)).toDF("doc_id", "text")
    val benchGrams = graft.queries.Curation.c11GramsOf(bench)
      .select("gram").distinct()
    val batch = Seq(
      (10L, uniq("host", 40) + " " + quote),  // full 20-token quote: 8 grams
      (11L, uniq("clean", 40))).toDF("doc_id", "text")
    val sink = java.nio.file.Files.createTempDirectory("graft_st21spec_")
      .resolve("out").toString
    try {
      StreamDecontam.gateBatch(spark, benchGrams, sink, batch)
      val got = spark.read.parquet(sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(10L -> 8L), s"got $got")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(sink).getParentFile)
  }
}
