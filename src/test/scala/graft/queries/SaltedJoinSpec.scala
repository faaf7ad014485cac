package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two halves of j5's salting contract: (1) the salted join
  * computes exactly the plain join's relation (salting may change the
  * distribution and nothing else), and (2) it actually fixes the
  * balance — the manufactured hot key (70% of events on customer 1)
  * floods one shuffle partition unsalted and spreads across salts
  * salted. Balance is measured on the REAL hash-partitioned layout
  * (`repartition` by the join key vs by (key, salt)), the same
  * distribution the shuffle join would produce.
  */
class SaltedJoinSpec extends SparkSpecBase {

  private def skewedFact: DataFrame =
    Tables.events(spark, sf).select(
      when(pmod(col("user_id"), lit(10)) < 7, lit(1L))
        .otherwise(col("user_id")).as("cust_id"),
      col("event_id"), col("value"))

  private def maxPartitionShare(df: DataFrame, keys: Seq[Column]): Double = {
    val n = df.count().toDouble
    val biggest = df.repartition(32, keys: _*)
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").count()
      .agg(max("count")).head().getLong(0)
    biggest / n
  }

  test("salted join == plain join; salt spreads the hot key across partitions") {
    val fact = skewedFact
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("cust_id"), col("c_mktsegment").as("segment"))

    // (1) identical relation
    val salted = Joins.saltedFactOf(fact)
      .join(Joins.saltedDimOf(dim), Seq("cust_id", "salt"))
      .select("cust_id", "event_id", "value", "segment")
    val plain = fact.join(dim, "cust_id")
      .select("cust_id", "event_id", "value", "segment")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // (2) balance: unsalted, the hot key (~70% of rows) floods one
    // partition; salted, no partition holds more than ~2× the ideal
    // hot-share/saltCount slice (slack for the uniform remainder)
    val unsalted = maxPartitionShare(fact, Seq(col("cust_id")))
    val saltedShare = maxPartitionShare(
      Joins.saltedFactOf(fact), Seq(col("cust_id"), col("salt")))
    assert(unsalted >= 0.6,
      s"skew fixture lost its hot key (max share $unsalted)")
    assert(saltedShare <= 0.15,
      s"salting failed to spread the hot key (max share $saltedShare)")
  }
}
