package graft.reshape

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {

  test("salted two-phase agg is bit-identical to the unsalted plan") {
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedCountSum(ev, Seq("event_type"), "value",
        uniqueCol = "event_id", buckets = 7)
      .orderBy("event_type").collect()
    val plain = Skew.plainCountSum(ev, Seq("event_type"), "value")
      .orderBy("event_type").collect()
    assert(salted.toSeq == plain.toSeq)
    assert(salted.nonEmpty)
  }

  test("salting actually splits groups in phase 1") {
    val ev = Tables.events(spark, sf)
    val phase1Groups = ev
      .withColumn("__salt", pmod(hash(col("event_id")), lit(7)))
      .groupBy(col("event_type"), col("__salt")).count()
    val keys = ev.select("event_type").distinct().count()
    assert(phase1Groups.count() > keys, "salt produced no sub-groups")
  }
}
