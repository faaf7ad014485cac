package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** The 60-bit SimHash path (d9): fingerprint range, clone behavior
  * under the 3-block banding, first-match-only emission, and the
  * motivating claim — a lower random-collision floor than the 32-bit
  * fingerprint on the SAME corpus.
  */
class Simhash64Spec extends SparkSpecBase {

  private def docs = Tables.documentsSpread(spark, sf)

  test("fingerprints stay in the signed-safe 60-bit range") {
    val mm = Dedup.d4Simhash64Of(docs)
      .agg(min(col("simhash64")).as("lo"), max(col("simhash64")).as("hi"))
      .head()
    assert(mm.getLong(0) >= 0L)
    assert(mm.getLong(1) < (1L << 60))
  }

  test("exact clones pair at hamming 0, emitted exactly once") {
    val base = docs.select("doc_id", "text")
    val cloned = base.unionByName(
      base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text")))
    val pairs = Dedup.d9PairsOf(cloned)
      .filter(col("doc_b") >= 1000000000L && col("doc_a") === col("doc_b") - 1000000000L)
      .persist()
    try {
      val expected = base.filter(col("doc_id") % 50 === 0).count()
      assert(pairs.filter(col("hamming") === 0).count() == expected,
        "every clone pair must surface at hamming 0")
      // first-match-only: no (doc_a, doc_b) appears twice
      assert(pairs.groupBy("doc_a", "doc_b").count()
        .filter(col("count") > 1).count() == 0L)
    } finally pairs.unpersist()
  }

  test("60-bit fingerprint has a lower pair floor than 32-bit on the same corpus") {
    val p32 = Dedup.d5PairsOf(docs).count()
    val p60 = Dedup.d9PairsOf(docs).count()
    assert(p60 < p32,
      s"expected fewer hamming<=2 pairs at 60 bits ($p60) than 32 ($p32)")
  }
}
