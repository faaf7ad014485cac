package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Contract for the hard-cap greedy packer: no pack exceeds the budget
  * unless it holds exactly one oversized document, document boundaries
  * are preserved, every doc is packed exactly once, and the assignment
  * is deterministic across runs and partitionings.
  */
class HardCapPackSpec extends SparkSpecBase {

  private val budget = 256

  test("packs respect the budget except single oversized docs") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val packed = Curation.packHardCap(docs, budget).persist()
    try {
      assert(packed.count() == docs.count(), "every doc packed exactly once")
      val packs = packed.groupBy("shard", "pack_id")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      val overBudget = packs.filter(col("fill") > budget && col("n_docs") > 1)
      assert(overBudget.count() == 0,
        s"multi-doc packs over budget:\n${overBudget.collect().mkString("\n")}")
      // greedy never leaves a pack that the NEXT doc of the same shard
      // could have joined: consecutive pack ids per shard
      val gaps = packed.groupBy("shard")
        .agg(max("pack_id").as("mx"), countDistinct("pack_id").as("n"))
        .filter(col("mx") =!= col("n") - 1)
      assert(gaps.count() == 0, "pack ids must be dense per shard")
      // deterministic under a different upstream layout
      val repacked = Curation.packHardCap(docs.repartition(7), budget)
      assert(repacked.exceptAll(packed).count() == 0 &&
        packed.exceptAll(repacked).count() == 0)
    } finally packed.unpersist()
  }
}
