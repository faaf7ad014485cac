package graft.queries

import graft.SparkSpecBase
import graft.Tables.r6
import org.apache.spark.sql.functions._

/** d12 semantic dedup (the SemDeDup shape): the keep/drop rule is "drop
  * b iff some lower-id cluster-mate sits within tau cosine" — so the
  * SURVIVOR set must be an independent set under the within-cluster
  * tau relation, every dup_of must witness a real violating pair, and
  * the quadratic must stay cluster-bounded (no cross-cluster pair is
  * ever considered, by construction of the cell-keyed join).
  */
class SemanticDedupSpec extends SparkSpecBase {

  private lazy val out = Dedup.d12SemanticDedup(spark, sf)

  test("d12 survivors form an independent set within each cluster") {
    val kept = out.filter(col("is_dup") === 0)
      .select(col("vec_id"), col("cell"))
    val e = Similarity.withNorm(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val offenders = kept.join(e, "vec_id")
      .select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
      .join(kept.join(e, "vec_id").select(col("cell"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb")), "cell")
      .filter(col("a_id") < col("b_id"))
      .filter(r6(Similarity.cosineHof(col("a_emb"), col("b_emb")))
        >= lit(Dedup.D12Tau))
      .count()
    assert(offenders === 0L,
      "two kept vectors in one cluster must never be within tau")
  }

  test("d12 every dup_of witnesses a real violating pair") {
    val dups = out.filter(col("is_dup") === 1)
    assert(dups.count() > 0, "tau must bite on this corpus")
    val e = Similarity.withNorm(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val bad = dups
      .join(e, "vec_id")
      .join(e.select(col("vec_id").as("dup_of"),
        col("embedding").as("k_emb")), "dup_of")
      .filter(col("dup_of") >= col("vec_id") ||
        r6(Similarity.cosineHof(col("embedding"), col("k_emb")))
          < lit(Dedup.D12Tau))
      .count()
    assert(bad === 0L,
      "dup_of must be a lower-id vector within tau of the victim")
  }

  test("d12 dup_of stays within the victim's cluster") {
    val cellsOf = out.select(col("vec_id").as("dup_of"),
      col("cell").as("k_cell"))
    val crossCluster = out.filter(col("is_dup") === 1)
      .join(cellsOf, "dup_of")
      .filter(col("cell") =!= col("k_cell"))
      .count()
    assert(crossCluster === 0L,
      "the pair stage must be cluster-bounded - no cross-cell pairs")
  }

  /** The r13 verdict's fix condition for the hierarchical quantizer:
    * the O(√k)-per-vector assignment must agree with the brute-force
    * O(k) argmax on this corpus, or its disagreement must be bounded
    * and visible. Measured at k=64 — the regime d12 actually routes
    * through [[Similarity.hierAssign]] (above HierThreshold; the s23
    * oracle row hash-certifies the same path) — for both passes: seed
    * centroids and the refit centroids derived from the hierarchical
    * first pass. */
  test("d12 hierarchical assignment tracks the brute-force argmax") {
    val k = 64
    assert(k > Similarity.HierThreshold,
      "the pin must exercise the hierarchical regime")
    val e = Similarity.withNorm(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val seeds = Similarity.seedCentroids(e, k)
    val n = e.count().toDouble
    val h1 = Similarity.hierAssign(e, seeds, k)
    val b1 = Similarity.lloydAssign(e, seeds)
    val agree1 = h1.join(b1.withColumnRenamed("cell", "bcell"), "vec_id")
      .filter(col("cell") === col("bcell")).count() / n
    val cent1 = Similarity.lloydRefit(e, h1)
    val h2 = Similarity.hierAssign(e, cent1, k)
    val b2 = Similarity.lloydAssign(e, cent1)
    val agree2 = h2.join(b2.withColumnRenamed("cell", "bcell"), "vec_id")
      .filter(col("cell") === col("bcell")).count() / n
    // measured at k=64 with 4 probes: 0.864 / 0.958 (2 probes gave
    // 0.634 / 0.826); floor leaves regeneration slack while still
    // failing the low-probe variants this design replaced
    assert(agree1 >= 0.80 && agree2 >= 0.80,
      f"hierarchical vs brute-force agreement degraded: " +
        f"pass1 $agree1%.3f pass2 $agree2%.3f (floor 0.80)")
    info(f"agreement pass1 $agree1%.3f pass2 $agree2%.3f")
  }
}
