package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The training-data curation story end-to-end: quality scoring →
  * language routing → exact + near-dup removal compose into one curated
  * corpus — each stage is a registered operator, and the composition is
  * itself pure DataFrame algebra (no intermediate materialization
  * required).
  */
class CurationPipelineSpec extends SparkSpecBase {

  test("quality filter -> lang route -> dedup composes to a curated corpus") {
    val quality = TextAnalysis.t2QualityScore(spark, sf)
      .filter(col("quality") >= 0.3)
      .select("doc_id")
    val lang = TextAnalysis.t1LangId(spark, sf)
      .select(col("doc_id"), col("predicted_lang"))
    val keepers = Dedup.d1ExactDedup(spark, sf)
      .select(col("keep_id").as("doc_id"))
    val nearDupLosers = Dedup.d2NgramJaccard(spark, sf)
      .select(col("doc_b").as("doc_id")) // drop the higher id of each pair

    val curated = quality
      .join(keepers, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(lang, "doc_id")

    val total = graft.Tables.documents(spark, sf).count()
    val n = curated.count()
    assert(n > 0 && n < total)
    // deterministic: same pipeline, same result
    assert(curated.count() == n)
    // near-dup losers are really gone
    val losers = nearDupLosers.distinct().collect().map(_.getLong(0)).toSet
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(losers).isEmpty)
    // every survivor carries a language route
    assert(curated.filter(col("predicted_lang").isNull).count() == 0)
  }
}
