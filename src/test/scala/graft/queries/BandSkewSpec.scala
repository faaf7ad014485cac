package graft.queries

import graft.SparkSpecBase
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** Hot-band skew contract for the banded LSH joins (r6/r7 verdict ask:
  * the skew-boundedness claim in the Dedup/Similarity scaladoc, as a
  * test instead of an assertion). A skewed corpus — one dominant band
  * bucket holding a clone clique, everything else spread — must:
  *
  *  1. emit exactly C(k,2) candidate pairs for a k-clone clique, ONCE
  *     each (the first-match emission dedups across bands even when the
  *     clique collides on EVERY band — the skewed case is precisely
  *     where emit-all + distinct would pay k² per band);
  *  2. emit nothing for vectors/docs whose band buckets are singletons
  *     (candidate volume is Σ_buckets C(|bucket|,2), not C(n,2) —
  *     all-pairs over this corpus would be ~29k pairs, the banded join
  *     generates 780);
  *  3. keep the equi-join shape under skew: the physical plan must not
  *     degrade to a cartesian/broadcast-nested-loop product.
  */
class BandSkewSpec extends SparkSpecBase {

  private val hotK = 40     // clone clique size (the hot bucket)
  private val diverseN = 200 // singleton-bucket background

  /** Sign pattern of vector i: every band shows the 8-bit pattern of i,
    * so two diverse vectors share a band key iff their ids are equal —
    * all their buckets are singletons. The hot clique is all-plus
    * (key 255 in every band, disjoint from diverse ids 0..199).
    */
  private def emb(bits: Int): Array[Float] =
    (0 until 32).map { j =>
      if (((bits >> (j % 8)) & 1) == 1) 1.0f else -1.0f
    }.toArray

  private lazy val skewed = {
    import spark.implicits._
    val hot = (0 until hotK).map(i =>
      (1000L + i, emb(255), math.sqrt(32).toFloat))
    val diverse = (0 until diverseN).map(i =>
      (i.toLong, emb(i % 200), math.sqrt(32).toFloat))
    (hot ++ diverse).toDF("vec_id", "embedding", "nrm")
  }

  test("s2 banded join under a hot band: C(k,2) pairs, each emitted once") {
    GraftExtensions.ensureRegistered(spark)
    val pairs = Similarity.lshNearDup(skewed)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every pair is inside the clone clique, each exactly once
    assert(pairs.length == hotK * (hotK - 1) / 2,
      s"expected C($hotK,2) candidate pairs, got ${pairs.length}")
    assert(pairs.distinct.length == pairs.length,
      "a pair was emitted more than once across bands")
    assert(pairs.forall { case (a, b) => a >= 1000L && b >= 1000L },
      "a singleton-bucket vector leaked into the candidate set")
  }

  test("s2 band buckets: clique key is the only non-singleton bucket") {
    // recompute the operator's banding independently: 4 bands × 8 bits
    // over the sign of dims 1..32
    val sgn = concat((1 to 32).map(i =>
      when(try_element_at(col("embedding"), lit(i)) >= 0f, lit("1"))
        .otherwise(lit("0"))): _*)
    val buckets = skewed.withColumn("sgn", sgn)
      .select(col("vec_id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("sgn"), b * 8 + 1, 8).as("key"))): _*)).as("bk"))
      .groupBy(col("bk.band"), col("bk.key"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val hotBuckets = buckets.filter(_.getLong(2) > 1)
    // the clique collides on all 4 bands (max skew) at key 11111111
    assert(hotBuckets.length == 4)
    assert(hotBuckets.forall(r =>
      r.getString(1) == "1" * 8 && r.getLong(2) == hotK))
  }

  test("s2/d5 skewed plans stay equi-joins — no cartesian degradation") {
    GraftExtensions.ensureRegistered(spark)
    val s2Plan = Similarity.lshNearDup(skewed)
      .queryExecution.executedPlan.toString
    assert(!s2Plan.contains("CartesianProduct") &&
      !s2Plan.contains("BroadcastNestedLoopJoin"),
      s"s2 degraded under skew:\n$s2Plan")
    val d5Plan = Dedup.d5PairsOf(skewDocs)
      .queryExecution.executedPlan.toString
    assert(!d5Plan.contains("CartesianProduct") &&
      !d5Plan.contains("BroadcastNestedLoopJoin"),
      s"d5 degraded under skew:\n$d5Plan")
  }

  private val cloneK = 30

  /** Documents twin: a 30-clone text (simhash-identical — collides on
    * all 6 byte-pair bands) over a distinct-text background.
    */
  private lazy val skewDocs = {
    import spark.implicits._
    val cloneText = "the quick brown fox jumps over the lazy dog again"
    val clones = (0 until cloneK).map(i => (5000L + i, cloneText))
    val diverse = (0 until 150).map { i =>
      (i.toLong, s"unique document body number $i with marker " +
        s"alpha${i * 7} beta${i * 13} gamma${i * 31} delta${i * 57}")
    }
    (clones ++ diverse).toDF("doc_id", "text")
  }

  test("d5 byte-pair bands under a clone clique: C(k,2) pairs, once each") {
    val pairs = Dedup.d5PairsOf(skewDocs)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val clonePairs = pairs.filter { case (a, b, _) => a >= 5000L && b >= 5000L }
    assert(clonePairs.length == cloneK * (cloneK - 1) / 2,
      s"expected C($cloneK,2) clone pairs, got ${clonePairs.length}")
    assert(clonePairs.forall(_._3 == 0), "clone pair with nonzero hamming")
    assert(pairs.distinct.length == pairs.length,
      "a pair was emitted more than once across byte-pair bands")
    // no clone-diverse pair: the clique's band keys are its own
    assert(pairs.forall { case (a, b, _) =>
      (a >= 5000L) == (b >= 5000L) },
      "a diverse doc collided into the clone bucket")
  }
}
