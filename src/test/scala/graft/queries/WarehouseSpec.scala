package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the structural contracts of the warehouse operators beyond the
  * oracle's row-for-row replay: o9's interval algebra (gapless,
  * non-overlapping, exactly one open version per user) and o10's key
  * algebra (result keys = base − deleted + inserted; exactly the
  * upserted keys change).
  */
class WarehouseSpec extends SparkSpecBase {

  test("o9: versions are gapless, intervals chain without overlap, one current per user") {
    val hist = Warehouse.o9Scd2History(spark, sf).cache()
    try {
      assert(hist.count() > 0)
      // exactly one open (is_current) version per user, and it is the last
      val perUser = hist.groupBy("user_id").agg(
        sum("is_current").as("n_current"),
        max("version").as("max_v"),
        count(lit(1)).as("n_v"),
        max(when(col("is_current") === 1, col("version"))).as("cur_v"))
      assert(perUser.filter(col("n_current") =!= 1).count() == 0)
      assert(perUser.filter(col("max_v") =!= col("n_v")).count() == 0,
        "versions must be gapless 1..n")
      assert(perUser.filter(col("cur_v") =!= col("max_v")).count() == 0,
        "the open version must be the latest")
      // intervals chain exactly: valid_to of version v == valid_from of v+1
      val chain = hist.alias("a").join(hist.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
      assert(chain.filter(col("a.valid_to_us") =!= col("b.valid_from_us"))
        .count() == 0, "closed intervals must chain without gap or overlap")
      // every closed interval is non-empty
      assert(hist.filter(col("valid_to_us") =!= -1L &&
        col("valid_to_us") <= col("valid_from_us")).count() == 0)
    } finally hist.unpersist()
  }

  test("o10: result keys = base minus deleted plus inserted; only changed keys differ") {
    import graft.Tables
    val base = Tables.customer(spark, sf).select(
      col("c_custkey").as("cust_id"), col("c_mktsegment").as("segment"),
      col("c_acctbal").as("bal")).cache()
    val chg = Warehouse.o10Changes(spark, sf).cache()
    val out = Warehouse.o10MergeUpsert(spark, sf).cache()
    try {
      val baseKeys = base.select("cust_id")
      val deleted = chg.filter(col("op") === "D").select("cust_id")
      val upserted = chg.filter(col("op") === "U").select("cust_id")
      val expectedKeys = baseKeys.except(deleted)
        .union(upserted.except(baseKeys)).distinct()
      assert(out.select("cust_id").except(expectedKeys).count() == 0)
      assert(expectedKeys.except(out.select("cust_id")).count() == 0)
      assert(deleted.count() > 0 && upserted.count() > 0,
        "the change-set must exercise both delete and upsert")

      // untouched base rows pass through byte-identical; upserts differ
      val touched = chg.select("cust_id")
      val untouchedOut = out.join(touched, Seq("cust_id"), "left_anti")
      val untouchedBase = base.join(touched, Seq("cust_id"), "left_anti")
      assert(untouchedOut.except(untouchedBase).count() == 0 &&
        untouchedBase.except(untouchedOut).count() == 0)
      // every upserted key carries the change's balance
      val upOut = out.join(chg.filter(col("op") === "U"), Seq("cust_id"))
      assert(upOut.filter(col("bal") =!= col("new_bal")).count() == 0)
    } finally { base.unpersist(); chg.unpersist(); out.unpersist() }
  }
}
