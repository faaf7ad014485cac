package graft.queries

import graft.SparkSpecBase

/** c8 domain PageRank: integer micro-unit arithmetic makes the ranks a
  * deterministic function of the corpus — pin determinism, the mass
  * envelope (every node holds at least its teleport share; floor
  * truncation only ever LOSES mass, so the total never exceeds the
  * initial N·unit), and that the overlap graph actually differentiates
  * the sources (a rank vector that stayed uniform would mean the graph
  * or the iteration is dead).
  */
class PagerankSpec extends SparkSpecBase {

  private lazy val ranks =
    Curation.c8DomainPagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))

  test("c8 is deterministic across runs") {
    val again = Curation.c8DomainPagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(ranks.toSeq === again.toSeq)
  }

  test("c8 mass envelope: teleport floor per node, global mass never grows") {
    val teleport = Curation.C8Unit * 15L / 100L
    assert(ranks.forall(_._2 >= teleport),
      "every node receives at least the teleport share")
    val total = ranks.map(_._2).sum
    assert(total <= Curation.C8Unit * ranks.length,
      "floor truncation + dangling loss can only shrink total mass")
    assert(total >= teleport * ranks.length)
  }

  test("c8 differentiates sources and sorts by authority") {
    assert(ranks.map(_._2).distinct.length > 1,
      "the overlap graph must differentiate the sources")
    assert(ranks.map(_._2).toSeq === ranks.map(_._2).sortBy(-_).toSeq,
      "output is ordered by rank descending")
  }
}
