package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** d13 containment dedup: every reported pair must be BELOW d2's 0.4
  * Jaccard line (the band symmetric dedup cannot see), each derived
  * page must contain its component articles at containment ~1, and the
  * score algebra containment ≥ jaccard must hold pairwise.
  */
class ContainmentSpec extends SparkSpecBase {

  private lazy val out = Dedup.d13ContainmentDedup(spark, sf).collect()

  test("d13 reports only the d2-blind band, containment dominates jaccard") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.8 && j < 0.4, s"outside the asymmetric band: $r")
      assert(c >= j, s"containment must dominate jaccard: $r")
    }
  }

  test("d13 finds every component article inside its derived page") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    // pages exist for every 20th doc whose two successors exist
    val nPages = (0L until nDocs by 20).count(d => d + 2 < nDocs)
    val pagePairs = out.filter(r =>
      r.getAs[Long]("doc_b") >= Dedup.D13Wrap &&
        r.getAs[Long]("doc_a") < Dedup.D13Wrap)
    // A component whose Jaccard to its page clears d2's 0.4 line lands
    // in d2's band instead (a dominant article in a short page) — d13
    // deliberately reports only the d2-blind remainder. The SMALLEST
    // component of each page is guaranteed here: its Jaccard is
    // n_min/n_page <= 1/3 < 0.4 by construction.
    assert(pagePairs.length >= nPages,
      s"expected >= $nPages component-in-page pairs (at least the " +
        s"smallest per page), got ${pagePairs.length}")
    pagePairs.foreach { r =>
      assert(r.getAs[Long]("contained_doc") === r.getAs[Long]("doc_a"),
        s"the component article must be the contained side: $r")
    }
    val componentsPerfect = pagePairs.count { r =>
      val page = r.getAs[Long]("doc_b") - Dedup.D13Wrap
      val comp = r.getAs[Long]("doc_a")
      comp >= page && comp <= page + 2 &&
        r.getAs[Double]("containment") === 1.0
    }
    assert(componentsPerfect >= nPages,
      "component articles must sit at containment 1.0 in their page")
  }
}
