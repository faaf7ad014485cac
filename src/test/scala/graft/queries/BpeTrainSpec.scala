package graft.queries

import graft.SparkSpecBase

/** Pins the t10 BPE trainer's merge semantics on hand-computed
  * dictionaries: overlap-inclusive pair COUNTING vs greedy
  * non-overlapping MERGING (the classic convention pair), deterministic
  * tie-breaking, the max-pair-count monotonicity invariant (a new pair
  * needs an occurrence of the token just merged, so the best count can
  * never rise), and early exhaustion when no pairs remain.
  */
class BpeTrainSpec extends SparkSpecBase {
  import spark.implicits._

  private def train(dict: Seq[(String, Long)], rounds: Int) =
    TextAnalysis.bpeTrainOver(spark,
      dict.toDF("word", "freq"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand corpus: counts overlap, merges greedily, rebuilds sequences") {
    // abab×2 + abc×1: (a,b)=5, (b,a)=2, (b,c)=1 → merge ab
    // then [ab,ab]×2 + [ab,c]: (ab,ab)=2, (ab,c)=1 → merge abab
    // then [abab]×2 + [ab,c]: (ab,c)=1 → merge abc; round 4 exhausted
    val got = train(Seq("abab" -> 2L, "abc" -> 1L), 4)
    assert(got == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "ab", "abab", 2L),
      (3, "ab", "c", "abc", 1L)))
  }

  test("same-symbol runs: overlap counted, merges at even offsets only") {
    // aaaa×3 + aaa×2: (a,a) adjacencies = 3·3 + 2·2 = 13 (overlaps all
    // counted) but greedy merging yields [aa,aa] and [aa,a] — so round
    // 2 sees (aa,aa)=3 and (aa,a)=2, not 13 leftovers
    val got = train(Seq("aaaa" -> 3L, "aaa" -> 2L), 2)
    assert(got == Seq(
      (1, "a", "a", "aa", 13L),
      (2, "aa", "aa", "aaaa", 3L)))
  }

  test("ties break to the lexicographically smallest pair") {
    // xy and yz both count 1; (x,y) < (y,z)
    val got = train(Seq("xy" -> 1L, "yz" -> 1L), 1)
    assert(got == Seq((1, "x", "y", "xy", 1L)))
  }

  test("max pair count never rises across the corpus rounds") {
    val counts = TextAnalysis.t10BpeTrain(spark, sf)
      .collect().map(_.getLong(4)).toSeq
    assert(counts.size == 4, s"corpus must sustain 4 rounds, got $counts")
    assert(counts == counts.sorted.reverse,
      s"best-pair counts must be non-increasing: $counts")
  }
}
