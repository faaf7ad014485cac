package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-equality of d2's codegen pair emission (posexplode + explode over
  * the tail slice + plain filter) against the r2 higher-order-function
  * formulation (flatten∘transform∘filter∘slice) it replaced — the HOF
  * chain is CodegenFallback in Spark, but it is the independently-written
  * reference semantics for ordered in-list pair generation with the
  * integer length-ratio prune (r3 verdict #2).
  */
class PairEmissionSpec extends SparkSpecBase {

  /** The r2 HOF formulation, verbatim, over the same grouped id lists. */
  private def hofPairs(grouped: DataFrame): DataFrame =
    grouped
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  filter(
          |    transform(slice(ids, i + 2, size(ids) - i - 1),
          |      y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
          |                  x.n_sh AS na, y.n_sh AS nb)),
          |    p -> 139 * least(p.na, p.nb) >= 39 * (p.na + p.nb))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.na").as("na"), col("p.nb").as("nb"))

  test("codegen emission ≡ HOF emission on the real shingle groups") {
    val sh = Dedup.shingleSetsOf(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
    val keepSh = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 100)
      .select("sh")
    val grouped = sh.join(keepSh, "sh")
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ids"))
      .persist()
    try {
      val codegen = grouped
        .select(col("ids"), posexplode(col("ids")))
        .select(col("col.doc_id").as("doc_a"), col("col.n_sh").as("na"),
          explode(slice(col("ids"), col("pos") + lit(2),
            size(col("ids")) - col("pos") - lit(1))).as("y"))
        .filter(lit(139) * least(col("na"), col("y.n_sh")) >=
          lit(39) * (col("na") + col("y.n_sh")))
        .select(col("doc_a"), col("y.doc_id").as("doc_b"),
          col("na"), col("y.n_sh").as("nb"))
      val hof = hofPairs(grouped)
      assert(codegen.count() === hof.count())
      assert(codegen.exceptAll(hof).count() === 0L)
      assert(hof.exceptAll(codegen).count() === 0L)
    } finally grouped.unpersist()
  }

  test("full d2 query matches an HOF-emission replica end to end") {
    val d2 = Dedup.d2NgramJaccard(spark, sf)
    // replica: identical query with the emission swapped for the HOF form
    val sh = Dedup.shingleSetsOf(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
    val keepSh = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 100)
      .select("sh")
    val grouped = sh.join(keepSh, "sh")
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ids"))
    val replica = hofPairs(grouped)
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        Tables.r6(col("inter") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jaccard") >= 0.4)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    assert(d2.exceptAll(replica).count() === 0L)
    assert(replica.exceptAll(d2).count() === 0L)
  }
}
