package graft.queries

import graft.SparkSpecBase

/** Pins the j7 runtime Bloom-filter mechanism on executed-plan metrics:
  * the injected `might_contain` probe drops non-joining fact rows BELOW
  * the shuffle (probe output ≥ true joining population, < scan output),
  * and the bloom-off control carries no probe yet returns identical
  * rows — runtime filtering changes the data volume shuffled, never the
  * result.
  */
class BloomRuntimeFilterSpec extends SparkSpecBase {

  test("bloom probe prunes fact rows pre-shuffle; control is unfiltered, same rows") {
    val (bloomDf, bloomPlan, executed) =
      Joins.runBloomFilterJoinExecuted(spark, sf, bloomEnabled = true)
    assert(bloomPlan.contains("might_contain"), "probe missing on fact side")
    assert(bloomPlan.contains("bloom_filter_agg"),
      "bloom build missing on dim side")

    val factRows = ScanMetrics.executedScanRows(executed,
      _.contains("lineitem"))
    val probeOut = ScanMetrics.filterOutputRows(executed,
      _.contains("might_contain"))

    // true joining population, computed independently
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val urgentKeys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val joining = li.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()

    assert(joining > 0 && joining < factRows,
      s"harness degenerate: joining=$joining of $factRows fact rows")
    // one-sided error: the probe may pass false positives, never drop a match
    assert(probeOut >= joining,
      s"bloom dropped joining rows: probe=$probeOut < joining=$joining")
    assert(probeOut < factRows,
      s"probe pruned nothing pre-shuffle: probe=$probeOut of $factRows")

    val (controlDf, controlPlan) =
      Joins.runBloomFilterJoinWithPlan(spark, sf, bloomEnabled = false)
    assert(!controlPlan.contains("might_contain"),
      "control must not carry a bloom probe")
    assert(bloomDf.collect().toSeq == controlDf.collect().toSeq,
      "runtime filtering must not change the result")
  }
}
