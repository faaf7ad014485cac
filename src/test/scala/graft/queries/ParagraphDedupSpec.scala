package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** d16 paragraph-level dedup: the injected aligned re-post is stripped
  * to its header, originals are untouched, and the grid-alignment
  * contract is pinned in BOTH directions (an off-grid copy is missed —
  * the documented trade of fixed-width segmentation).
  */
class ParagraphDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = Dedup.D16SegWords // 8

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("d16 strips an aligned re-post down to its unique header") {
    val got = Dedup.d16ParagraphDedup(spark, sf).collect()
    val (quotes, base) =
      got.partition(_.getLong(0) >= Dedup.D16Quote)
    assert(quotes.nonEmpty, "injection must produce re-posts")
    quotes.foreach { r =>
      assert(r.getLong(2) === 1L,
        s"re-post must keep exactly its header segment: $r")
      assert(r.getLong(3) === r.getLong(1) - 1L,
        s"every quoted segment must be dropped: $r")
      assert(r.getLong(4) === W.toLong,
        s"kept words must be the $W-word header: $r")
    }
    // the small-vocabulary corpus produces a handful of NATURAL 8-gram
    // collisions across base docs ("batch batch batch" runs) - those are
    // real paragraph dedup, so pin only that the earliest doc drops
    // nothing and that natural collisions stay rare
    val minId = base.map(_.getLong(0)).min
    base.filter(_.getLong(0) == minId).foreach { r =>
      assert(r.getLong(3) === 0L, s"the first document can drop nothing: $r")
    }
    val dropped = base.map(_.getLong(3)).sum
    val total = base.map(_.getLong(1)).sum
    assert(dropped.toDouble / total < 0.15,
      s"natural collisions must stay a small minority (measured ~5.5% at " +
        s"sf0.001): $dropped/$total")
  }

  test("d16 keeps the first copy and edits only the later one") {
    val para = words("boiler", 2 * W) // two full segments
    val docs = Seq(
      (1L, words("alpha", W) + " " + para),
      (2L, words("beta", W) + " " + para)) // para lands on the grid
      .toDF("doc_id", "text")
    val got = Dedup.d16Of(docs).collect().sortBy(_.getLong(0))
    assert(got(0).getLong(2) === 3L && got(0).getLong(3) === 0L,
      s"earlier doc keeps all segments: ${got(0)}")
    assert(got(1).getLong(2) === 1L && got(1).getLong(3) === 2L,
      s"later doc keeps its unique head, drops the quoted body: ${got(1)}")
    assert(got(1).getLong(4) === W.toLong)
  }

  test("d16 misses an off-grid copy - the alignment contract") {
    val para = words("quoted", 2 * W)
    // the second doc shifts the copy by half a segment, so no quoted
    // 8-word window reproduces verbatim on the grid: fixed-width
    // segmentation documents exactly this recall trade (d14 is the
    // operator that catches unaligned verbatim reuse)
    val docs = Seq(
      (1L, words("left", W) + " " + para),
      (2L, words("right", W / 2) + " " + para))
      .toDF("doc_id", "text")
    val got = Dedup.d16Of(docs).collect().sortBy(_.getLong(0))
    assert(got(1).getLong(3) === 0L,
      s"off-grid copy must NOT dedup under the fixed grid: ${got(1)}")
    val d14 = Dedup.d14Of(docs).collect()
    assert(d14.nonEmpty,
      "d14 substring dedup must catch the same unaligned copy")
  }

  test("d16 partial tail segment dedups like any other paragraph") {
    val tail = words("tl", W / 2) // half-width final segment
    val docs = Seq(
      (1L, words("one", W) + " " + tail),
      (2L, words("two", W) + " " + tail))
      .toDF("doc_id", "text")
    val got = Dedup.d16Of(docs).collect().sortBy(_.getLong(0))
    assert(got(0).getLong(2) === 2L && got(0).getLong(3) === 0L)
    assert(got(1).getLong(2) === 1L && got(1).getLong(3) === 1L,
      s"the duplicate partial tail must drop: ${got(1)}")
    assert(got(1).getLong(4) === W.toLong)
  }
}
