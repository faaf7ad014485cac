package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** d14 exact substring dedup: the injected shared-paragraph positive
  * that set-overlap dedup misses by construction (the r13 verdict's
  * defining case), run-length stitching across diagonals, the sub-K
  * negative, and non-stitching across gaps.
  */
class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = Dedup.D14K // 8

  private def uniq(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("d14 flags a shared paragraph that d2 Jaccard misses") {
    val para = (1 to 12).map(i => s"shared$i").mkString(" ") // 12 tokens
    // two long, otherwise-disjoint docs sharing only the paragraph:
    // 12 shared tokens vs ~100 unique ones keeps 3-gram Jaccard far
    // below d2's 0.4 threshold
    val docs = Seq(
      (1L, uniq("alpha", 100) + " " + para),
      (2L, uniq("beta", 100) + " " + para))
      .toDF("doc_id", "text")
    val d14 = Dedup.d14Of(docs).collect()
    assert(d14.length === 1)
    assert(d14.head.getLong(0) === 2L, "victim is the later doc")
    assert(d14.head.getLong(1) === 1L, "dup_of is the earlier doc")
    assert(d14.head.getLong(2) === 12L,
      s"stitched run must be the full 12-token paragraph: ${d14.head}")
    val d2 = Dedup.d2PairsOf(Dedup.shingleSetsPlain(docs)).collect()
    assert(d2.isEmpty,
      "d2's Jaccard threshold must miss the single shared paragraph - " +
        "that gap is exactly what d14 exists for")
  }

  test("d14 ignores shared runs shorter than K tokens") {
    val short = (1 to K - 1).map(i => s"run$i").mkString(" ") // K-1 tokens
    val docs = Seq(
      (1L, uniq("left", 40) + " " + short),
      (2L, uniq("right", 40) + " " + short))
      .toDF("doc_id", "text")
    assert(Dedup.d14Of(docs).collect().isEmpty,
      s"a ${K - 1}-token shared run must not flag")
  }

  test("d14 does not stitch two runs across a gap") {
    val runA = (1 to K).map(i => s"pa$i").mkString(" ")
    val runB = (1 to K).map(i => s"pb$i").mkString(" ")
    // both docs contain runA and runB but with DIFFERENT unique gaps,
    // so the diagonals differ and the runs must stay separate
    val docs = Seq(
      (1L, runA + " " + uniq("gapx", 20) + " " + runB),
      (2L, runA + " " + uniq("gapy", 31) + " " + runB))
      .toDF("doc_id", "text")
    val got = Dedup.d14Of(docs).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === K.toLong,
      s"two disjoint K-token runs must report K, not a stitched sum: ${got.head}")
  }

  test("d14 exact duplicates report the full document length") {
    val text = uniq("dup", 25)
    val docs = Seq((1L, text), (2L, text), (3L, uniq("other", 30)))
      .toDF("doc_id", "text")
    val got = Dedup.d14Of(docs).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 2L && got.head.getLong(1) === 1L &&
      got.head.getLong(2) === 25L, s"got: ${got.head}")
  }
}
