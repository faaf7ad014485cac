package graft.queries

import graft.SparkSpecBase

/** e2e_dedup_pipeline: every injected class resolves to exactly its
  * intended verdict at exactly its intended stage — exact clones die
  * at stage 1, near-clones at stage 2, thin re-posts at stage 3, and
  * partial re-posts survive EDITED (the chain's whole point: three
  * granularities, each catching what the others miss).
  */
class DedupChainSpec extends SparkSpecBase {

  test("each injected class resolves at its intended stage") {
    val got = EndToEnd.e2eDedupPipeline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    def cls(lo: Long) = got.filter(r => r._1 >= lo && r._1 < lo + 1000000000L)

    val exact = cls(4000000000L)
    assert(exact.nonEmpty && exact.forall(_._3 == "exact_dup"),
      "every exact clone must die at stage 1")
    exact.foreach(r => assert(r._4 === r._1 - 4000000000L,
      s"exact dup_of must be the original: $r"))

    val near = cls(5000000000L)
    assert(near.nonEmpty && near.forall(_._3 == "near_dup"),
      "every near-clone must die at stage 2")
    // dup_of is the LOWEST-id partner: usually the original, but a
    // clone of a doc that itself has a natural earlier near-dup
    // attributes to that earlier doc (keep-lowest is transitive-ish
    // by construction)
    near.foreach(r => assert(r._4 >= 0L && r._4 <= r._1 - 5000000000L,
      s"near dup_of must be an earlier base doc: $r"))

    val partial = cls(6000000000L)
    assert(partial.nonEmpty && partial.forall(_._3 == "kept"),
      "partial re-posts must SURVIVE all three stages")
    partial.foreach { r =>
      assert(r._5 < r._2,
        s"a partial re-post must be visibly EDITED (quoted segments " +
          s"dropped): $r")
      assert(r._5 * 2 >= r._2, s"but keep at least half its words: $r")
    }

    val thin = cls(7000000000L)
    assert(thin.nonEmpty && thin.forall(_._3 == "paragraph_thin"),
      "thin re-posts must be caught by stage 3 - stages 1/2 miss them " +
        "by construction")
    thin.foreach(r => assert(r._4 === -1L && r._5 >= 0L,
      s"thin verdicts carry edit stats, not a dup partner: $r"))

    // the chain is a cascade: a doc gets exactly one verdict, and
    // kept/thin docs carry stage-3 stats while dups never do
    got.filter(r => r._3 == "exact_dup" || r._3 == "near_dup")
      .foreach(r => assert(r._5 === -1L,
        s"dropped docs never reach stage 3: $r"))
  }
}
