package graft.queries

import graft.SparkSpecBase

/** t14 reference-LM bucketing: terciles are bin-resolution balanced,
  * mean surprisal orders head < middle < tail by construction, and the
  * CCNet property holds on real data — documents in the reference
  * language score as more reference-like than every other language
  * (head-enriched AND tail-depleted), even though this corpus shares
  * one vocabulary across languages (the BIGRAM statistics carry the
  * signal unigrams can't).
  */
class LmQualitySpec extends SparkSpecBase {

  test("t14 terciles are balanced, ordered, and reference-enriched") {
    val got = TextAnalysis.t14LmQualityFilter(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(4), r.getString(5)))
    val n = got.length.toDouble
    val byBucket = got.groupBy(_._3)
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    byBucket.foreach { case (b, rows) =>
      assert(rows.length > n * 0.2,
        s"bucket $b collapsed to ${rows.length}/$n - the bin-resolution " +
          "cut should stay near terciles")
    }
    // binning is monotone in mean_bits, so buckets must be ordered
    assert(byBucket("head").map(_._2).max <= byBucket("middle").map(_._2).min)
    assert(byBucket("middle").map(_._2).max <= byBucket("tail").map(_._2).min)
    // the CCNet property: the reference language is head-enriched and
    // tail-depleted relative to EVERY other language
    def frac(lang: String, bucket: String): Double = {
      val rows = got.filter(_._1 == lang)
      rows.count(_._3 == bucket).toDouble / rows.length
    }
    val others = got.map(_._1).distinct.filterNot(_ == "en")
    assert(others.nonEmpty)
    others.foreach { l =>
      assert(frac("en", "head") > frac(l, "head"),
        s"reference lang must be head-enriched vs $l: " +
          s"${frac("en", "head")} vs ${frac(l, "head")}")
      assert(frac("en", "tail") < frac(l, "tail"),
        s"reference lang must be tail-depleted vs $l: " +
          s"${frac("en", "tail")} vs ${frac(l, "tail")}")
    }
  }
}
