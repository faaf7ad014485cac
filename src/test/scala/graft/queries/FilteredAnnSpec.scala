package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins WHY s22 pre-filters: post-filtering a global top-k is not a
  * cheaper approximation of filtered search, it is a different (wrong)
  * query — global neighbors failing the predicate leave holes, so the
  * per-query result count drops below k, while the pre-filtered search
  * always returns k eligible neighbors (given ≥ k candidates exist).
  */
class FilteredAnnSpec extends SparkSpecBase {

  test("pre-filter returns full k per query; post-filtering the global top-k loses results") {
    val k = 5
    val pre = Similarity.s22FilteredTopK(spark, sf).cache()
    val globalTop = Similarity.s1BruteForceTopK(spark, sf).cache()
    try {
      val nQueries = pre.select("query_id").distinct().count()
      assert(nQueries > 0)
      // enough eligible candidates exist → every query gets exactly k
      assert(pre.groupBy("query_id").count()
        .filter(col("count") =!= k).count() == 0)
      // every neighbor satisfies the predicate
      assert(pre.filter(pmod(col("neighbor_id"), lit(7)) =!=
        Similarity.FilterCategory).count() == 0)

      // post-filter: keep only predicate-passing rows of the GLOBAL top-k
      val post = globalTop.filter(pmod(col("neighbor_id"), lit(7)) ===
        Similarity.FilterCategory)
      assert(post.count() < nQueries * k,
        "post-filtering should lose results (global neighbors fail the " +
          "predicate); if not, this corpus stopped exercising the point")

      // and where post-filter DOES return a neighbor, pre-filter agrees
      // it is a top candidate (same scoring, subset relation)
      val preKeys = pre.select("query_id", "neighbor_id")
      assert(post.select("query_id", "neighbor_id")
        .except(preKeys).count() == 0,
        "every surviving post-filter neighbor must appear in the " +
          "pre-filtered top-k")
    } finally { pre.unpersist(); globalTop.unpersist() }
  }
}
