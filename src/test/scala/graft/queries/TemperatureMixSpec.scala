package graft.queries

import graft.SparkSpecBase

/** c10 temperature mixing: √-flattening is monotone (bigger domains
  * get strictly smaller rates), the token budget is conserved in
  * expectation, and realized sampling tracks the rates.
  */
class TemperatureMixSpec extends SparkSpecBase {

  test("c10 flattens monotonically and conserves the token budget") {
    val got = Curation.c10TemperatureMix(spark, sf).collect()
    assert(got.length === 20, "one row per source")
    val rows = got.map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
      r.getLong(5), r.getLong(6)))
    // monotone flattening: order by tok desc => rate non-decreasing is
    // WRONG for alpha<1; bigger domain must get strictly SMALLER rate
    val byTok = rows.sortBy(-_._2)
    byTok.sliding(2).foreach { case Array(a, b) =>
      if (a._2 > b._2)
        assert(a._3 < b._3,
          s"bigger domain must be downweighted harder: $a vs $b")
    }
    val b = rows.map(_._2).sum.toDouble
    val expected = rows.map(r => r._3 * r._2).sum
    assert(math.abs(expected - b) / b < 1e-4,
      s"expected mixed tokens must equal the budget: $expected vs $b")
    // head below 1 epoch, tail above - the whole point of flattening
    assert(byTok.head._3 < 1.0, s"largest domain must downsample: ${byTok.head}")
    assert(byTok.last._3 > 1.0, s"smallest domain must upsample: ${byTok.last}")
    // realized draw tracks the rate (loose: ~25 docs/source at sf0.001)
    rows.foreach { r =>
      assert(r._4 > 0, s"every source must survive the mix: $r")
      assert(math.abs(r._5 - r._3 * r._2) / (r._3 * r._2) < 0.5,
        s"realized tokens must track rate*tok: $r")
    }
  }
}
