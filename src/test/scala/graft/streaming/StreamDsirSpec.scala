package graft.streaming

import graft.SparkSpecBase
import graft.queries.Curation
import org.apache.spark.sql.functions._

/** Pins st23's streaming DSIR gate: streamed result identical to the
  * single-batch twin (frozen weights + frozen cut ⇒ batching-invariant
  * by construction), coverage closure over the scoreable crawl, and
  * the gate's selection semantics (bin-monotone threshold; target-
  * language docs outselect the rest on the crawl side — the DSIR
  * property surviving the freeze).
  */
class StreamDsirSpec extends SparkSpecBase {

  private lazy val docs = graft.Tables.documentsSpread(spark, sf)
    .select(col("doc_id"), col("lang"), col("text"))
  private val isCalib = col("doc_id") % 2 === 0

  private lazy val streamed =
    StreamDsir.st23StreamDsirGate(spark, sf).localCheckpoint()

  test("the streamed gate equals its single-batch twin exactly") {
    val (model0, _) = Curation.c13Freeze(docs.filter(isCalib),
      col("lang") === "en")
    val model = model0.copy(weights = model0.weights.localCheckpoint())
    val dir = java.nio.file.Files.createTempDirectory("graft_st23twin_")
    try {
      StreamDsir.gateBatch(model, dir.toString, docs.filter(!isCalib))
      val twin = spark.read.parquet(dir.toString)
      val cols = Seq("doc_id", "lang", "n_feats", "logw_bits", "bin",
        "selected")
      assert(streamed.count() == twin.count())
      assert(streamed.join(twin, cols, "left_anti").isEmpty &&
        twin.join(streamed, cols, "left_anti").isEmpty,
        "streamed result diverged from the single-batch twin")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("coverage: exactly the scoreable odd-id crawl; calibration never leaks") {
    val scoreable = docs.filter(!isCalib)
      .filter(size(expr(
        "filter(split(trim(text), '\\\\s+'), x -> length(x) > 0)")) > 0)
    assert(streamed.count() == scoreable.count())
    assert(streamed.join(scoreable.select("doc_id"),
      Seq("doc_id"), "left_anti").isEmpty)
    assert(streamed.filter(isCalib).isEmpty,
      "a calibration doc leaked into the gated crawl output")
  }

  test("selection is exactly the frozen bin threshold and it separates the crawl") {
    val sel = streamed.filter(col("selected"))
    val unsel = streamed.filter(!col("selected"))
    assert(sel.count() > 0 && unsel.count() > 0,
      "the frozen cut did not separate the crawl - the gate is vacuous")
    val minSelBin = sel.agg(min("bin")).head().getInt(0)
    val maxUnselBin = unsel.agg(max("bin")).head().getInt(0)
    assert(minSelBin > maxUnselBin,
      s"selection is not a bin threshold ($maxUnselBin >= $minSelBin)")
  }

  /** Frozenness with teeth: the label of a document depends ONLY on
    * the document and the frozen model — gating an arbitrary strict
    * subset of the crawl (a third batch composition, on top of the
    * registered query's two waves and the twin's single batch) yields
    * bit-identical rows for those documents. A per-batch recomputation
    * of weights, envelope, or cut would flip labels here. (The
    * language-separation property itself is pinned on c13 in DsirSpec
    * with FULL-corpus calibration — separation power scales with the
    * target sample, exactly the paper's finding, and the halved
    * calibration slice at these toy corpus sizes sits below the
    * shared-vocabulary noise floor; st23's claims are the freeze, the
    * twin identity, and the threshold.) */
  test("an arbitrary subset batch reproduces the full run's labels exactly") {
    val (model0, _) = Curation.c13Freeze(docs.filter(isCalib),
      col("lang") === "en")
    val model = model0.copy(weights = model0.weights.localCheckpoint())
    val subset = docs.filter(!isCalib).filter(col("doc_id") % 7 === 2)
    assert(subset.count() > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_st23sub_")
    try {
      StreamDsir.gateBatch(model, dir.toString, subset)
      val got = spark.read.parquet(dir.toString)
      val cols = Seq("doc_id", "lang", "n_feats", "logw_bits", "bin",
        "selected")
      val expected = streamed.join(subset.select("doc_id"), "doc_id")
      assert(got.count() == expected.count())
      assert(got.join(expected, cols, "left_anti").isEmpty &&
        expected.join(got, cols, "left_anti").isEmpty,
        "a different batch composition changed a document's label")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
