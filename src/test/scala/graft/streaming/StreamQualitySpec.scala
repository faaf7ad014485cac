package graft.streaming

import graft.SparkSpecBase
import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins st22's streaming quality gate: the streamed result is
  * IDENTICAL to the batch twin (same frozen model, same frozen cuts,
  * one pass — batching invariance is structural because the gate is
  * stateless and the cuts are frozen), the coverage ledger closes
  * (output ∪ reference = every scoreable doc), and the frozen-cut
  * labeling is monotone in the score.
  */
class StreamQualitySpec extends SparkSpecBase {

  private lazy val docs = graft.Tables.documentsSpread(spark, sf)
    .select(col("doc_id"), col("lang"), col("text"))
  private val isRef = col("lang") === "en" && col("doc_id") % 2 === 0

  private lazy val streamed =
    StreamQuality.st22StreamQualityGate(spark, sf).localCheckpoint()

  test("the streamed gate equals its batch twin exactly") {
    val (cab0, ca0, v) = TextAnalysis.lmTrain(docs, isRef)
    val cab = cab0.localCheckpoint()
    val ca = ca0.localCheckpoint()
    val refScored = TextAnalysis.lmScore(docs.filter(isRef), cab, ca, v)
      .localCheckpoint()
    val (qmin, width, cut1, cut2) = TextAnalysis.tercileCutsOf(refScored)
    val dir = java.nio.file.Files.createTempDirectory("graft_st22twin_")
    try {
      // the whole crawl as ONE batch through the same foreachBatch body
      StreamQuality.gateBatch(cab, ca, v, qmin, width, cut1, cut2,
        dir.toString, docs.filter(!isRef))
      val twin = spark.read.parquet(dir.toString)
      val cols = Seq("doc_id", "lang", "n_pairs", "total_bits",
        "mean_bits", "bucket")
      assert(streamed.count() == twin.count())
      assert(streamed.join(twin, cols, "left_anti").isEmpty &&
        twin.join(streamed, cols, "left_anti").isEmpty,
        "streamed result diverged from the single-batch twin")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("coverage: output is exactly the scoreable crawl; the reference never leaks") {
    // scoreable = at least one adjacent pair (>= 2 non-empty tokens)
    val scoreableCrawl = TextAnalysis.lmPairs(docs.filter(!isRef))
      .select("doc_id").distinct()
    assert(streamed.count() == scoreableCrawl.count())
    assert(streamed.join(scoreableCrawl, Seq("doc_id"), "left_anti").isEmpty)
    assert(streamed.filter(isRef).isEmpty,
      "a reference-slice doc leaked into the gated crawl output")
  }

  test("frozen-cut labels are monotone in the score and all terciles engage") {
    val byBucket = streamed.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("mean_bits").as("lo"),
        max("mean_bits").as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"),
      s"a tercile never engaged: ${byBucket.keySet}")
    val (_, _, headHi) = byBucket("head")
    val (_, midLo, midHi) = byBucket("middle")
    val (_, tailLo, _) = byBucket("tail")
    assert(headHi < midLo && midHi < tailLo,
      s"bucket boundaries not monotone: head<=$headHi, " +
        s"middle=[$midLo,$midHi], tail>=$tailLo")
  }
}
