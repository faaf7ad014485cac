package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** c9 inverse-duplication sampling: singleton clusters always survive
  * (their expected contribution IS one document), the whole corpus is
  * covered exactly once, and the draw is deterministic across runs.
  */
class DedupSampleSpec extends SparkSpecBase {

  private lazy val out = Curation.c9DedupWeightedSample(spark, sf)

  test("c9 covers every document exactly once") {
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.count() === n)
    assert(out.select(col("doc_id")).distinct().count() === n)
  }

  test("c9 singletons are always kept; kept fraction shrinks with cluster size") {
    val singletonDropped = out
      .filter(col("n_members") === 1 && !col("sampled")).count()
    assert(singletonDropped === 0L,
      "a cluster of one must keep its single document with certainty")
    // the flag is exactly the integer keep test draw·n < 10^4
    val inconsistent = out.filter(
      (col("sampled") && col("draw") * col("n_members") >= 10000) ||
        (!col("sampled") && col("draw") * col("n_members") < 10000))
      .count()
    assert(inconsistent === 0L)
  }

  test("c9 is deterministic across runs") {
    val a = out.collect().map(_.toString).sorted
    val b = Curation.c9DedupWeightedSample(spark, sf)
      .collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
