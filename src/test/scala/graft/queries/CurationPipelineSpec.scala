package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The training-data curation story end-to-end: quality scoring →
  * language routing → exact + near-dup removal compose into one curated
  * corpus — each stage is a registered operator, and the composition is
  * itself pure DataFrame algebra (no intermediate materialization
  * required).
  */
class CurationPipelineSpec extends SparkSpecBase {

  test("quality filter -> lang route -> dedup composes to a curated corpus") {
    val quality = TextAnalysis.t2QualityScore(spark, sf)
      .filter(col("quality") >= 0.3)
      .select("doc_id")
    val lang = TextAnalysis.t1LangId(spark, sf)
      .select(col("doc_id"), col("predicted_lang"))
    val keepers = Dedup.d1ExactDedup(spark, sf)
      .select(col("keep_id").as("doc_id"))
    val nearDupLosers = Dedup.d2NgramJaccard(spark, sf)
      .select(col("doc_b").as("doc_id")) // drop the higher id of each pair

    val curated = quality
      .join(keepers, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(lang, "doc_id")

    val total = graft.Tables.documents(spark, sf).count()
    val n = curated.count()
    assert(n > 0 && n < total)
    // deterministic: same pipeline, same result
    assert(curated.count() == n)
    // near-dup losers are really gone
    val losers = nearDupLosers.distinct().collect().map(_.getLong(0)).toSet
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(losers).isEmpty)
    // every survivor carries a language route
    assert(curated.filter(col("predicted_lang").isNull).count() == 0)
  }

  test("c1 cascade: every gate fires on the corpus and order is first-fail") {
    val c1 = Curation.c1CurationDecision(spark, "/root/testdata/sf0.01")
      .persist()
    try {
      val reasons = c1.select("reason").distinct()
        .collect().map(_.getString(0)).toSet
      // every DATA-REACHABLE gate is exercised by the sf0.01 corpus
      // (+ the t5 deterministic PII tail) -- a silent gate is a dead
      // gate. exact_dup needs byte-identical texts, which this corpus
      // does not contain (500 distinct md5s; the d1 oracle covers the
      // exact-dup logic itself).
      for (r <- Seq("near_dup", "lang", "repetition", "pii",
          "low_quality", "keep"))
        assert(reasons.contains(r), s"gate '$r' never fired")
      // first-fail semantics: a doc flagged 'pii' must have PASSED every
      // earlier gate (dup, lang, repetition)
      val badPii = c1.filter(col("reason") === "pii" &&
        (col("doc_id") =!= col("exact_keep_id") ||
          col("doc_id") =!= col("cluster_id") ||
          col("predicted_lang") === "unknown" ||
          col("dup_frac") >= 0.08)).count()
      assert(badPii == 0L, s"$badPii pii rows failed an earlier gate")
      // keeps pass everything
      val badKeep = c1.filter(col("keep") &&
        (col("n_pii") > 0 || col("quality") < 0.5 ||
          col("dup_frac") >= 0.08)).count()
      assert(badKeep == 0L, s"$badKeep keeps fail a gate")
    } finally c1.unpersist()
  }

  test("c1b dup-inject: clones fail exact_dup, originals keep their verdict") {
    val d = "/root/testdata/sf0.01"
    val base = Curation.c1CurationDecision(spark, d)
      .select(col("doc_id"), col("reason").as("base_reason"))
    val c1b = Curation.c1DupInject(spark, d).persist()
    try {
      // every injected clone (id >= 1e9, the clone-offset discipline)
      // fails the FIRST gate with
      // its source as the keeper — regardless of how the source scores
      val clones = c1b.filter(col("doc_id") >= 1000000L)
      assert(clones.count() == 25)
      assert(clones.filter(col("reason") =!= "exact_dup").count() == 0)
      assert(clones.filter(
        col("exact_keep_id") =!= col("doc_id") - 1000000000L).count() == 0)
      // original docs are untouched by the injection: same reason as the
      // base cascade for every one of the 500 (clusters recompute on the
      // injected frame, but a clone only ever attaches to its source's
      // component with a LARGER id, so no original's cluster_id moves)
      val moved = c1b.filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("reason"))
        .join(base, "doc_id")
        .filter(col("reason") =!= col("base_reason"))
        .count()
      assert(moved == 0L, s"$moved originals changed verdict under injection")
    } finally c1b.unpersist()
  }

  test("c2 hash split is stable under corpus appends and repartitioning") {
    val base = Curation.c2TrainSplit(spark, sf)
      .select("doc_id", "split")
    // append a disjoint id range and reshuffle -- the hash-mod bucket of
    // every ORIGINAL doc must not move (row_number-based splits fail
    // exactly this: the property that justifies the hash design)
    val docs = graft.Tables.documents(spark, sf)
    val shiftedCols = (col("doc_id") + 1000000L).as("doc_id") +:
      docs.columns.toSeq.filter(_ != "doc_id").map(col)
    val appended = docs.unionByName(docs.select(shiftedCols: _*))
      .repartition(7, col("source"))
    val again = appended
      .select(col("doc_id"),
        pmod(graft.Tables.md5Hash32(concat(lit("split:"), col("doc_id"))),
          lit(100)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 98, "train")
          .when(col("bucket") === 98, "val")
          .otherwise("test"))
      .filter(col("doc_id") < 1000000L)
      .select("doc_id", "split")
    assert(base.exceptAll(again).count() == 0L)
    assert(again.exceptAll(base).count() == 0L)
  }
}
