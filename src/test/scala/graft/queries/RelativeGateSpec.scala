package graft.queries

import graft.SparkSpecBase

/** Pins c7's gate semantics: because equal scores share a bin and the
  * cut is a whole bin, the kept set is EXACTLY the top-K documents by
  * quality (strict score separation across the cut), with K at most
  * 80% of the corpus — the histogram quantizes the 20% target, it
  * never misorders a document.
  */
class RelativeGateSpec extends SparkSpecBase {

  test("kept set is exactly the top-K by quality; drop covers >= 20%") {
    val out = Curation.c7RelativeGate(spark, sf).collect()
    val n = out.map(_.getLong(1)).sum
    val k = out.map(_.getLong(2)).sum
    assert(k > 0 && k <= (0.8 * n).toLong,
      s"kept $k of $n - the cut must drop at least the 20% target")

    val scores = TextAnalysis.t2QualityScore(spark, sf).collect()
      .map(r => r.getDouble(5)).sorted(Ordering[Double].reverse)
    val minKept = scores(k.toInt - 1)
    val maxDropped = scores(k.toInt)
    assert(minKept > maxDropped,
      s"cut must fall between distinct scores: $minKept vs $maxDropped")
  }
}
