package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** a18 column profiling: the stats must agree with directly-computed
  * aggregates, and the "one-pass" claim is a plan property — a single
  * relation leaf (one scan) with the multi-countDistinct planned as an
  * Expand, not as one scan per column.
  */
class ProfileSpec extends SparkSpecBase {

  test("a18 stats match directly computed aggregates") {
    val prof = Layout.a18Profile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    val li = graft.Tables.lineitem(spark, sf)
    val direct = li.agg(
      count(col("l_returnflag")), countDistinct(col("l_returnflag")),
      min(col("l_returnflag")), max(col("l_returnflag"))).head()
    assert(prof("l_returnflag") ===
      ((direct.getLong(0), direct.getLong(1),
        direct.getString(2), direct.getString(3))))
    val (nnQ, ndQ, mnQ, mxQ) = prof("l_quantity")
    val dq = li.agg(count(col("l_quantity")),
      countDistinct(col("l_quantity")),
      min(col("l_quantity")), max(col("l_quantity"))).head()
    assert((nnQ, ndQ) === ((dq.getLong(0), dq.getLong(1))))
    assert(mnQ === f"${dq.getDouble(2)}%.6f" && mxQ === f"${dq.getDouble(3)}%.6f")
  }

  test("a18 is one pass and its data-sized stage stays hash-based") {
    val q = Layout.a18Profile(spark, sf)
    assert(q.queryExecution.optimizedPlan.collectLeaves().size === 1,
      "profile must read the table exactly once")
    // the level-1 distinct aggregation (the only data-sized stage) must
    // be a HashAggregate: a string min/max sharing an aggregate with the
    // distinct counting would demote the whole pipeline to SortAggregate
    // (fixed-size-buffer rule), a measured 4x regression at sf0.1
    val sparkPlan = q.queryExecution.sparkPlan.toString
    val firstAgg = sparkPlan.linesIterator.toSeq.reverse
      .find(l => l.contains("Aggregate(") && l.contains("occ"))
    assert(firstAgg.exists(_.contains("HashAggregate")),
      s"level-1 distinct aggregation must be hash-based, got: $firstAgg")
  }
}
