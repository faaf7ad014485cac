package graft.sources

import graft.SparkSpecBase
import graft.ingest.Readers
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class RawTableSourceSpec extends SparkSpecBase {

  private def load() = spark.read
    .format("graft.sources.RawTableSource")
    .option("path", getClass.getResource("/fixtures/raw_table.json").getPath)
    .option("tableId", "roster")
    .load()

  test("DSv2 source exposes the normalized wide schema and same rows") {
    val v2 = load()
    val v1 = Readers.rawTable(spark,
      getClass.getResource("/fixtures/raw_table.json").getPath, "roster")
    assert(v2.schema.fieldNames.toSeq == v1.schema.fieldNames.toSeq)
    val a = v2.orderBy("row_idx").collect().map(_.toSeq).toSeq
    val b = v1.orderBy("row_idx").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 5)
  }

  test("column pruning is pushed into the source scan") {
    val pruned = load().select("Player", "row_idx")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec found")
    assert(scans.head.schema.fieldNames.toSet == Set("Player", "row_idx"),
      s"scan not pruned: ${scans.head.schema.fieldNames.mkString(",")}")
  }

  test("scan parallelizes across line-range partitions") {
    assert(load().rdd.getNumPartitions > 1)
  }

  test("team/row_idx filters push into the source scan") {
    import org.apache.spark.sql.functions.col
    val filtered = load()
      .filter(col("team") === "BOS" && col("row_idx") >= 1 && col("row_idx") < 4)
    // pushed filters appear in the scan description
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(team,BOS)") &&
      plan.contains("GreaterThanOrEqual(row_idx,1)"),
      s"filters not pushed:\n$plan")
    // and the source applies them correctly
    assert(filtered.count() == 3)
    assert(filtered.select("row_idx").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
