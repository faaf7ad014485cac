package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** d17's banding S-curve: the measured detect/miss behavior behind
  * d3's (b,r)=(4,4) choice. The build is fully deterministic (md5
  * shingle hashes, fixed affine permutations, injected prefix plants),
  * so the pins are on exact counts with slack only for driver
  * testdata regeneration.
  */
class BandingSweepSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  private def sweep(): Map[(Int, Int, Long), (Long, Long)] =
    Dedup.d17BandingSweep(spark, d).collect().map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))
    }.toMap

  test("every decile bucket 2..9 is populated and counts are per-config equal") {
    val m = sweep()
    val buckets = m.keySet.map(_._3)
    assert((2L to 9L).toSet.subsetOf(buckets),
      s"prefix plants must populate buckets 2..9, got $buckets")
    // the pair universe is config-independent: n_pairs agrees across
    // configs within every bucket
    buckets.foreach { b =>
      val counts = m.collect { case ((_, _, `b`), (n, _)) => n }.toSet
      assert(counts.size == 1, s"bucket $b pair counts diverge: $counts")
    }
  }

  test("detection is monotone in r within every bucket") {
    val m = sweep()
    val byR = Dedup.d17Configs.sortBy(_._2) // r ascending = permissive first
    m.keySet.map(_._3).foreach { b =>
      val dets = byR.map { case (bb, rr) => m((bb, rr, b))._2 }
      assert(dets == dets.sorted.reverse,
        s"bucket $b: detections not non-increasing in r: " +
          s"${byR.map(_._2).zip(dets)}")
    }
  }

  test("(4,4)'s detect and miss bands hold") {
    val m = sweep()
    def rate(b: Long): Double = {
      val (n, det) = m((4, 4, b)); det.toDouble / n
    }
    assert(rate(9) == 1.0, s"(4,4) must catch every J>=0.9 pair: ${rate(9)}")
    assert(rate(8) >= 0.85, s"(4,4) detect band broken at bucket 8: ${rate(8)}")
    assert(rate(2) <= 0.05, s"(4,4) miss band broken at bucket 2: ${rate(2)}")
    assert(rate(3) <= 0.3 && rate(4) <= 0.3,
      s"(4,4) miss band broken: b3=${rate(3)} b4=${rate(4)}")
    // the S-curve's transition sits around J ~ 0.6 for (4,4)
    // (theory: J50 = (1-(1-0.5^(1/4)))^(1/4) ~ 0.57); measured 25/52
    val mid = rate(6)
    assert(mid > 0.2 && mid < 0.8,
      s"(4,4) transition left [0.2, 0.8] at bucket 6: $mid")
  }

  test("the flood and strict endpoints behave as the curve predicts") {
    val m = sweep()
    // r=1: any single minhash match collides - near-total flooding
    m.keySet.map(_._3).foreach { b =>
      val (n, det) = m((16, 1, b))
      assert(det.toDouble / n >= 0.9,
        s"(16,1) must flood bucket $b: $det/$n")
    }
    // r=16: only a full signature match collides - nothing below 0.8
    (2L to 6L).foreach { b =>
      val (n, det) = m((1, 16, b))
      assert(det.toDouble / n <= 0.05,
        s"(1,16) must miss bucket $b: $det/$n")
    }
  }

  test("exact clones are detected by every configuration") {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"uniq$i").mkString(" ")
    val sets = Dedup.shingleSetsPlain(
      Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text"))
    val got = Dedup.d17Of(sets).collect()
    assert(got.length == Dedup.d17Configs.length)
    got.foreach { r =>
      assert(r.getLong(2) == 9L && r.getLong(3) == 1L && r.getLong(4) == 1L,
        s"clone pair must land in bucket 9 detected under every config: $r")
    }
  }
}
