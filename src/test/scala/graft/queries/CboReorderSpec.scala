package graft.queries

import graft.SparkSpecBase

/** Pins the a17 mechanism both ways: with ANALYZE'd stats and CBO on,
  * the optimizer moves the unfiltered fact to the END of the join tree
  * (filtered dims join first); with CBO off the textual order stands
  * (fact first) — and the rows are identical, so reordering is pure
  * schedule.
  */
class CboReorderSpec extends SparkSpecBase {

  test("CBO joins filtered dims first; control keeps textual order; same rows") {
    val (cboDf, cboLeaves) =
      Layout.runCboReorderWithPlan(spark, sf, cboEnabled = true)
    assert(cboLeaves.size == 3, s"expected 3 leaves: $cboLeaves")
    assert(cboLeaves.last.contains("a17_li_"),
      s"fact must join last under CBO: $cboLeaves")

    val (ctlDf, ctlLeaves) =
      Layout.runCboReorderWithPlan(spark, sf, cboEnabled = false)
    assert(ctlLeaves.head.contains("a17_li_"),
      s"without stats the textual order stands (fact first): $ctlLeaves")

    val a = cboDf.collect().toSeq
    val b = ctlDf.collect().toSeq
    assert(a == b && a.nonEmpty, "reordering must not change the result")
  }
}
