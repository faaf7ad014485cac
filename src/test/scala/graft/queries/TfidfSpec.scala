package graft.queries

import graft.SparkSpecBase

/** Pins t11's per-doc ranking shape: contiguous ranks from 1, scores
  * non-increasing within a doc, no repeated term within a doc's
  * keyword list. (Value-level correctness is the oracle's hash.)
  */
class TfidfSpec extends SparkSpecBase {

  test("per-doc keyword lists are ranked, contiguous, and term-unique") {
    val rows = TextAnalysis.t11Tfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq,
        s"doc $doc ranks not contiguous")
      val scores = sorted.map(_._4).toSeq
      assert(scores == scores.sorted.reverse,
        s"doc $doc scores rise with rank: $scores")
      assert(rs.map(_._3).distinct.length == rs.length,
        s"doc $doc repeats a term")
    }
  }
}
