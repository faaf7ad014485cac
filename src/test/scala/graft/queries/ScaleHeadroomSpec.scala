package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Scale headroom: the dedup operators must keep working when the corpus
  * grows — here 10× via shifted clones, which also gives a known ground
  * truth (every doc gains 9 exact clones that MinHash must place in the
  * same buckets with est_jaccard = 1.0).
  */
class ScaleHeadroomSpec extends SparkSpecBase {

  test("minhash LSH on a 10x corpus finds every clone group, bounded time") {
    val base = Tables.documents(spark, sf).select("doc_id", "text")
    val copies = 10
    val big = (0 until copies).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val n = base.count()
    assert(big.count() == copies * n)

    val t0 = System.nanoTime()
    val cand = Dedup.minhashLsh(Dedup.shingleSetsOf(big))
    val clonePairs = cand.filter(col("est_jaccard") === 1.0)
      .withColumn("orig_a", pmod(col("doc_a"), lit(1000000L)))
      .withColumn("orig_b", pmod(col("doc_b"), lit(1000000L)))
    // every one of the C(10,2)=45 clone pairs per doc is found
    val perDoc = clonePairs.filter(col("orig_a") === col("orig_b"))
      .groupBy("orig_a").count()
    val complete = perDoc.filter(col("count") >= 45).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(complete == n, s"clone recall incomplete: $complete of $n")
    assert(secs < 120, s"10x corpus took ${secs}s")
  }

  test("near-dup clustering on a 10x clone corpus keeps every clone family together") {
    val base = Tables.documents(spark, sf).select("doc_id", "text")
    val copies = 10
    val big = (0 until copies).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_.unionByName(_))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val clusters = Dedup.neardupClustersOf(big)
      .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
      .persist()
    try {
      // clones have hamming 0, so every clone family MUST land in one
      // cluster (families may additionally merge via base-corpus
      // near-dups -- that is correct, so assert per-family cohesion,
      // not exact cluster count)
      val splitFamilies = clusters
        .groupBy(pmod(col("doc_id"), lit(1000000L)).as("orig"))
        .agg(countDistinct(col("cluster_id")).as("n_clusters"))
        .filter(col("n_clusters") > 1)
        .count()
      assert(splitFamilies == 0L, s"$splitFamilies clone families split")
      // exactly one canonical per cluster, and it is the cluster id
      val canonicals = clusters.filter(col("is_canonical")).count()
      val nClusters = clusters.select(countDistinct(col("cluster_id"))).head().getLong(0)
      assert(canonicals == nClusters,
        s"$canonicals canonicals for $nClusters clusters")
    } finally clusters.unpersist()
  }
}
