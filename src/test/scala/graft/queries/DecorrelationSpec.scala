package graft.queries

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Cross-validates q5's decorrelated subquery against the hand-built
  * semi/anti join composition — the plan Catalyst should (and the
  * in-query require proves it does) rewrite to.
  */
class DecorrelationSpec extends SparkSpecBase {

  test("EXISTS/NOT EXISTS query equals the explicit semi/anti join plan") {
    val viaSubquery = Relational.q5DecorrelatedExists(spark, sf)
      .collect().toSeq

    val cust = Tables.customer(spark, sf)
    val orders = Tables.orders(spark, sf)
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val fStatus = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val byHand = cust
      .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(fStatus, col("c_custkey") === fStatus("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), min(col("c_custkey")).as("first_cust"))
      .orderBy("segment")
      .collect().toSeq

    assert(viaSubquery == byHand)
    assert(viaSubquery.nonEmpty)
  }
}
