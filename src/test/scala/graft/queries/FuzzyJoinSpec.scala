package graft.queries

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** e7 blocked fuzzy join: every corrupted string resolves to its true
  * entity (the Wu-Manber partitioning guarantee - one substitution
  * cannot break both halves, so corruptions in EITHER half must
  * resolve through the other), and the winner/ambiguity fields are
  * internally consistent.
  */
class FuzzyJoinSpec extends SparkSpecBase {

  test("e7 resolves every query to its true entity") {
    val truth = Tables.part(spark, sf)
      .select(col("p_partkey"),
        concat_ws(" ", col("p_name"), col("p_brand"), col("p_type"))
          .as("entity"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val canonical = truth.toSeq.groupBy(_._2)
      .map { case (e, ks) => e -> ks.map(_._1).min }
    val got = Enrich.e7BlockedFuzzyJoin(spark, sf).collect()
    val queries = truth.keys.filter(_ % 5 == 0)
    assert(got.length === queries.size, "every dirty row must resolve")
    var h1Corruptions, h2Corruptions = 0
    got.foreach { r =>
      val (qk, entId, ent, dist, nBest) = (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3), r.getLong(4))
      val e = truth(qk)
      val pos = (qk % e.length).toInt
      if (pos < (e.length + 1) / 2) h1Corruptions += 1 else h2Corruptions += 1
      assert(dist <= 1L, s"true entity is at distance <= 1: $r")
      if (nBest == 1L)
        assert(ent === e && entId === canonical(e),
          s"unique winner must be the true entity for $qk: $r")
      else
        // a tie at the best distance: truth must still be among the
        // tied candidates, so the reported distance can't exceed the
        // truth's
        assert(dist <= distance(q = corrupt(e, pos), e), s"tie sanity: $r")
    }
    assert(h1Corruptions > 0 && h2Corruptions > 0,
      "the corpus must exercise corruptions in BOTH halves - each must " +
        s"resolve through the other's block ($h1Corruptions/$h2Corruptions)")
  }

  private def corrupt(e: String, pos: Int): String =
    e.substring(0, pos) + "#" + e.substring(pos + 1)

  private def distance(q: String, e: String): Long =
    if (q == e) 0L else 1L // single substitution by construction
}
