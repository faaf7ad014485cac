package graft.functions

import graft.SparkSpecBase
import graft.plans.GraftExtensions
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Contracts for the bounded-heap `graft_topk` aggregate: bit-equality
  * with the window/row_number formulation it replaces on the s1 hot
  * path, plus unit behaviors (tie order, null skipping, k larger than
  * the group).
  */
class TopKAggSpec extends SparkSpecBase {

  test("s1 heap aggregate == window formulation, bit for bit") {
    val viaAgg = Similarity.s1BruteForceTopK(spark, sf).collect().toSeq
    val viaWin = Similarity.s1TopKWindowed(spark, sf).collect().toSeq
    assert(viaAgg == viaWin)
  }

  test("ties break by ascending id; nulls are skipped; short groups truncate") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq[(String, Option[Double], Long)](
      ("g", Some(1.0), 30L), ("g", Some(1.0), 10L), ("g", Some(1.0), 20L),
      ("g", Some(2.0), 99L), ("g", None, 1L),
      ("h", Some(0.5), 7L))
      .toDF("grp", "score", "id")
    val out = df.groupBy("grp")
      .agg(expr("graft_topk(score, id, 3)").as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1))))
      .toMap
    // best first: 2.0 then the 1.0 ties by ascending id; null row ignored
    assert(out("g") == Seq((2.0, 99L), (1.0, 10L), (1.0, 20L)))
    // group smaller than k returns what exists
    assert(out("h") == Seq((0.5, 7L)))
  }

  test("buffer compaction keeps exactly the global top-k across partitions") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    // 10k rows, many partitions: the winner set is known by construction
    val df = spark.range(10000)
      .select(lit("g").as("grp"), (col("id") % 97).cast("double").as("score"),
        col("id").as("id"))
      .repartition(13)
    val out = df.groupBy("grp")
      .agg(expr("graft_topk(score, id, 4)").as("top"))
      .selectExpr("inline(top)")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // score 96 occurs at ids 96, 193, 290, 387 -> top-4 by (score desc, id asc)
    assert(out == Seq((96.0, 96L), (96.0, 193L), (96.0, 290L), (96.0, 387L)))
  }

  test("numeric arguments widen at the builder: float score, int id") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(("g", 2.0f, 9), ("g", 1.0f, 3), ("g", 3.0f, 5))
      .toDF("grp", "score", "id")
    // float score / int id / int k — the r2 signature rejected this with
    // a type error; the builder now widens numeric args to double/bigint
    val out = df.groupBy("grp")
      .agg(expr("graft_topk(score, id, 2)").as("top"))
      .selectExpr("inline(top)")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((3.0, 5L), (2.0, 9L)))
  }

  test("bigint score widens to double and matches the window formulation") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    // Cast.canUpCast(LongType, DoubleType) is false, so this exercises the
    // score-specific integral widening path (r5 advice) — a long score is
    // an ordering key where long→double cannot flip integral comparisons
    // below 2^53.
    val df = spark.range(1000)
      .select((col("id") % 7).as("grp"), (col("id") * 1000003L).as("score"),
        col("id").as("id"))
    val viaAgg = df.groupBy("grp")
      .agg(expr("graft_topk(score, id, 3)").as("top"))
      .selectExpr("grp", "inline(top)")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq.sorted
    val viaWin = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp")
        .orderBy(col("score").cast("double").desc, col("id").asc)
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("grp"), col("score").cast("double").as("score"), col("id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq.sorted
    }
    assert(viaAgg == viaWin)
  }

  test("double id and fractional k still fail the strict type check") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(("g", 1.0, 2.0)).toDF("grp", "score", "did")
    // a narrowing cast on id would corrupt VALUES, so the builder must not
    // insert one — the expression's own strict check rejects it instead
    val e1 = intercept[Exception] {
      df.groupBy("grp").agg(expr("graft_topk(score, did, 2)")).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("bigint") ||
      e1.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[Exception] {
      df.groupBy("grp").agg(expr("graft_topk(score, 1L, 2.5)")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("int") ||
      e2.getMessage.toLowerCase.contains("type"))
  }
}
