package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Pins the j6 runtime-skew-handling contract: over the multi-file
  * skewed fact, AQE splits the hot join partition (the in-query require
  * enforces the `skew=true` marker), the identical plan with skew
  * handling disabled carries no marker, and both produce identical rows
  * — runtime splitting changes the schedule, never the result.
  */
class AqeSkewJoinSpec extends SparkSpecBase {

  test("skew handling splits the hot partition; control does not; rows identical") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_j6spec_" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Tables.events(spark, sf).select(
          when(expr("user_id % 10") < 7, lit(1L))
            .otherwise(col("user_id")).as("cust_id"),
          col("event_id"), col("value"))
        .repartition(8)
        .write.parquet(s"$base/fact")
      val factM = spark.read.parquet(s"$base/fact")
      val dim = Tables.customer(spark, sf).select(
        col("c_custkey").as("cust_id"), col("c_mktsegment").as("segment"))

      // skew-enabled run: the require inside the runner pins the
      // skew=true marker, so completing at all IS the mechanism proof —
      // but assert it here too, on the final adaptive plan
      val (skewedDf, skewedPlan) =
        Joins.runAqeSkewJoinWithPlan(spark, factM, dim, skewEnabled = true)
      assert(skewedPlan.contains("skew=true"))
      val skewed = skewedDf.collect().toSeq

      // control: same plan, skew handling off → no marker, same rows
      val (controlDf, controlPlan) =
        Joins.runAqeSkewJoinWithPlan(spark, factM, dim, skewEnabled = false)
      assert(!controlPlan.contains("skew=true"),
        "control run must not skew-split")
      assert(controlDf.collect().toSeq == skewed,
        "skew-split and plain execution must agree row-for-row")
    } finally fs.delete(new Path(base), true)
  }
}
