package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Contracts for c4 benchmark decontamination and c5 stratified
  * sampling beyond the oracle hash: the contamination guarantees a
  * user relies on (every injected clone of a bench doc flags at
  * overlap 1.0; a bench doc never pairs with itself) and the scale
  * shape (the benchmark side joins via broadcast, never a train-side
  * shuffle join; the c5 draw is partition-invariant).
  */
class DecontaminateSpec extends SparkSpecBase {

  private val d = "/root/testdata/sf0.01"

  test("every clone of a bench doc is flagged contaminated at overlap 1.0") {
    val c4 = Curation.c4Decontaminate(spark, d).persist()
    try {
      // clones are bench_doc + 1e9 with identical text -> full overlap
      val clonePairs = c4.filter(col("train_doc") === col("bench_doc") + 1000000000L)
      val n = clonePairs.count()
      assert(n > 0, "no clone pairs surfaced — injection not reaching c4")
      assert(clonePairs.filter(!col("contaminated")).count() == 0)
      assert(clonePairs.filter(col("overlap") =!= 1.0).count() == 0)
      assert(clonePairs.filter(col("n_shared") =!= col("bench_n")).count() == 0)
      // every bench doc with >= 2 shingles has its clone pair present
      val expected = graft.Tables.documents(spark, d)
        .filter(col("doc_id") % 100 === 0 &&
          size(split(col("text"), "\\s+")) >= 4)
        .count()
      assert(n == expected, s"clone pairs $n != cloneable bench docs $expected")
    } finally c4.unpersist()
  }

  test("a bench doc never pairs with itself and bench docs are not train docs") {
    val c4 = Curation.c4Decontaminate(spark, d)
    assert(c4.filter(col("train_doc") === col("bench_doc")).count() == 0)
    // train side excludes original bench ids entirely
    assert(c4.filter(col("train_doc") % 100 === 0 &&
      col("train_doc") < 1000000L).count() == 0)
  }

  test("the benchmark side joins via broadcast (no train-side shuffle join)") {
    // plan string, not collect: AQE wraps the join subtree in an
    // AdaptiveSparkPlan whose children aren't traversable pre-execution
    val plan = Curation.c4Decontaminate(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "c4 candidate join degraded to a sort-merge join")
  }

  test("c5 sampling is deterministic and partition-invariant") {
    val a = Curation.c5StratifiedSample(spark, d).collect().toSeq
    val b = Curation.c5StratifiedSample(spark, d).collect().toSeq
    assert(a == b)
    // the draw depends only on doc_id — a repartitioned input agrees
    val repart = graft.Tables.documents(spark, d).repartition(7)
      .select(col("doc_id"),
        pmod(graft.Tables.md5Hash32(concat(lit("sample:"), col("doc_id"))),
          lit(10000)).as("draw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(repart(r.getLong(0)) == r.getLong(2))
    }
  }

  test("c5 keeps roughly the configured fraction per stratum") {
    val c5 = Curation.c5StratifiedSample(spark, d)
      .groupBy("lang", "rate")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sampled"), 1).otherwise(0)).as("kept"))
      .collect()
    c5.foreach { r =>
      val rate = r.getDouble(1)
      val frac = r.getLong(3).toDouble / r.getLong(2)
      // md5 is uniform; at n>=64 per stratum a 0.2 absolute band is safe
      assert(math.abs(frac - rate) < 0.2,
        s"${r.getString(0)}: kept fraction $frac vs rate $rate")
    }
  }
}
