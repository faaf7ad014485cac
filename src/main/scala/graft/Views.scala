package graft

import org.apache.spark.sql.SparkSession

/** SQL-first entry point: register the test-data tables as temp views and
  * the graft native functions on a session, so the whole engine is usable
  * from `spark.sql(...)` alone — `SELECT graft_topk(...) FROM documents`,
  * no DataFrame code required. Views are plain parquet scans, so every
  * pushdown/pruning behavior of the DataFrame path applies identically.
  */
object Views {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Register `<name>` temp views over `dir` plus the graft functions.
    * `events` is registered through [[Tables.events]] (nanos handling)
    * and `documents` through [[Tables.documentsSpread]] — SQL users get
    * the same per-row-parallel layout the DataFrame-path text/dedup
    * queries use, instead of the single-split scan the raw test parquet
    * would give them. The rest are direct parquet scans.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    tableNames.filterNot(_ == "documents").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.documentsSpread(spark, dir).createOrReplaceTempView("documents")
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
