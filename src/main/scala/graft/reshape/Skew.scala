package graft.reshape

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation for hot grouping keys: salted two-phase aggregation.
  *
  * A single `groupBy(key)` sends every row of a hot key to one reducer.
  * Salting splits each key into `buckets` sub-groups (phase 1, map-side
  * combined like any hash aggregate), then merges the bounded per-salt
  * partials (phase 2, ≤ buckets rows per key). Only algebraic aggregates
  * (count/sum/min/max) compose this way — and double sums go through
  * decimal so the result is bit-identical to the unsalted plan no matter
  * how rows land in salt buckets (decimal adds are associative; raw
  * double adds are not).
  *
  * Note Spark's AQE skew handling (`spark.sql.adaptive.skewJoin`) covers
  * skewed JOINS at runtime; skewed AGGREGATION keys still need explicit
  * salting — that is what this is for.
  */
object Skew {

  /** Salted count + exact sum per key.
    *
    * @param uniqueCol any row-distinguishing column; the salt is its hash
    *                  mod `buckets` — deterministic per row, uniform for
    *                  high-cardinality uniques.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      uniqueCol: String, buckets: Int = 16): DataFrame = {
    val dec: Column = col(valueCol).cast(DecimalType(18, 6))
    df.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(dec).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }

  /** Unsalted reference plan (same output contract, one-phase). */
  def plainCountSum(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double").as("total"))
}
