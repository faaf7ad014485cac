package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Recall of the approximate similarity paths (S2 sign-LSH, S4 IVF)
  * against the exact all-pairs reference ([[Similarity.exactNearDupPairs]])
  * on the full sf0.01 embedding set — the measurement that justifies
  * shipping the approximate operators as the 100 TB production paths.
  *
  * The floors asserted here are pinned ~10 points under the measured
  * values so data regeneration noise does not flake the suite; a real
  * recall regression (e.g. a broken bucket key) lands far below them.
  */
class SimilarityRecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("s2 sign-LSH: perfect precision, measured recall floor vs exact") {
    val exact = Similarity
      .exactNearDupPairs(Similarity.withNorm(spark, dir), 0.35)
      .select("vec_a", "vec_b")
    val approx = Similarity.s2LshNearDup(spark, dir)
      .filter(col("cos_sim") >= 0.35)
      .select("vec_a", "vec_b")
    val nExact = exact.count()
    val nApprox = approx.count()
    val nHit = approx.intersect(exact).count()
    assert(nExact > 0, "degenerate test data: no exact near-dup pairs")
    // every emitted pair is exact-verified inside its bucket -> subset
    assert(nHit == nApprox, s"LSH emitted ${nApprox - nHit} non-exact pairs")
    val recall = nHit.toDouble / nExact
    info(f"s2 recall = $recall%.3f ($nHit of $nExact)")
    assert(recall >= 0.05, f"sign-LSH recall collapsed: $recall%.3f")
  }

  test("s2 finds every exact clone pair (true near-dup recall = 1)") {
    // clones collide on EVERY band, so banded sign-LSH recall on true
    // duplicates is 1.0 by construction -- the property that makes it a
    // near-dup production path even though moderate-similarity recall is
    // band-probability-bounded.
    val base = Similarity.withNorm(spark, dir).filter(col("vec_id") < 100)
      .select("vec_id", "embedding", "nrm")
    val clones = base.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"), col("nrm"))
    val pairs = Similarity.lshNearDup(base.unionByName(clones))
    val clonePairs = pairs
      .filter(col("vec_b") === col("vec_a") + 100000L &&
        col("cos_sim") === 1.0)
      .count()
    assert(clonePairs == 100L, s"clone recall incomplete: $clonePairs of 100")
  }

  test("s4 IVF top-k: measured overlap floor vs brute-force top-k") {
    val e = Similarity.withNorm(spark, dir)
    val q = e.filter(col("vec_id") >= 8 && col("vec_id") < 13)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("cos"), col("vec_id"))
    val exactTop = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        expr("graft_dot(qe, embedding)") / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val ivfTop = Similarity.s4IvfTopK(spark, dir)
      .select("query_id", "neighbor_id")
    val nExact = exactTop.count()
    val nHit = ivfTop.intersect(exactTop).count()
    assert(nExact == 15L, s"expected 5 queries x top-3, got $nExact")
    val overlap = nHit.toDouble / nExact
    info(f"s4 top-3 overlap = $overlap%.3f ($nHit of $nExact)")
    assert(overlap >= 0.2, f"IVF top-k overlap collapsed: $overlap%.3f")
  }
}
