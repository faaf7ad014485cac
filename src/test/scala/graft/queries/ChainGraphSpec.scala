package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Convergence hardening for d6's label propagation (r3 verdict #3): a
  * path graph is the worst case for plain neighbor-min propagation
  * (O(diameter) rounds — a 10^4-vertex chain would blow any reasonable
  * iteration cap), and the pointer-jumping half-step must bring it to
  * O(log diameter). Also pins the session-shared cluster relation: c1
  * and the d6 query must resolve to the SAME memoized frame so the
  * propagation runs once per corpus per session (r3 verdict #1).
  */
class ChainGraphSpec extends SparkSpecBase {

  test("a 10^4-vertex chain graph converges within 20 rounds") {
    val n = 10000L
    // path 1-2-3-...-n as an explicit edge list; one connected component
    val pairs = spark.range(1, n)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val docs = spark.range(1, n + 1).select(col("id").as("doc_id"))
    // maxIters = 20: the pre-pointer-jumping algorithm needs ~diameter
    // rounds here and would THROW at the cap; the doubling recurrence
    // d' = 2(d+1) covers 10^4 in ~13 rounds.
    val clusters = Dedup.clustersOf(pairs, docs, maxIters = 20)
    val wrong = clusters.filter(col("cluster_id") =!= 1L).count()
    assert(wrong == 0L, s"$wrong vertices not labeled with the component min")
    assert(clusters.filter(col("is_canonical")).count() == 1L)
  }

  test("two disjoint chains resolve to their own minima") {
    val pairs = spark.range(1, 500)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .union(spark.range(1000, 1500)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")))
    val docs = spark.range(1, 1501).select(col("id").as("doc_id"))
    val clusters = Dedup.clustersOf(pairs, docs, maxIters = 20)
    assert(clusters.filter(col("doc_id") <= 500 && col("cluster_id") =!= 1L)
      .count() == 0L)
    assert(clusters
      .filter(col("doc_id").between(1000, 1500) && col("cluster_id") =!= 1000L)
      .count() == 0L)
    // vertices in neither chain are their own singleton clusters
    assert(clusters
      .filter(col("doc_id").between(501, 999) &&
        col("cluster_id") =!= col("doc_id"))
      .count() == 0L)
  }

  test("d6 cluster relation is memoized per session and corpus") {
    val first = Dedup.d6ClustersShared(spark, sf)
    val second = Dedup.d6ClustersShared(spark, sf)
    // the SAME resolved frame, not a re-run of the propagation — this is
    // what lets c1 and the d6 query share one clustering per session
    assert(first eq second)
    // release drops the memo: the next call builds (and re-registers) a
    // fresh resolved frame
    Dedup.releaseSharedCaches(spark)
    val third = Dedup.d6ClustersShared(spark, sf)
    assert(!(third eq first))
    Dedup.releaseSharedCaches(spark)
  }
}
