package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the a14 data-skipping proof (r12 verdict "next round" #2): on a
  * ts-range-clustered layout, a range query's parquet scan emits ONLY
  * the row groups whose footer envelope intersects the slice, while the
  * same query over a round-robin control layout of identical file count
  * scans the entire corpus — min/max skipping is a property of the
  * write layout, not the plan. Also pins that both layouts return
  * identical results (pruning loses nothing) and that the range
  * predicate reaches the scan as a pushed filter.
  */
class MinMaxPruneSpec extends SparkSpecBase {

  private def scanOutputRows(df: DataFrame): Long =
    ScanMetrics.scanOutputRows(df)

  test("range-clustered layout prunes; round-robin control cannot") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mmprune_" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Layout.writeSortedLayout(spark, sf, s"$base/sorted")
      Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("user_id"), col("value"))
        .repartition(Layout.PruneFileCount)
        .write.parquet(s"$base/control")

      def slice(path: String): DataFrame =
        spark.read.parquet(path)
          .filter(col("ts") >= lit(Layout.PruneLo).cast("timestamp") &&
            col("ts") < lit(Layout.PruneHi).cast("timestamp"))

      val total = spark.read.parquet(s"$base/sorted").count()
      val matching = slice(s"$base/sorted").count()
      assert(matching > 0 && matching < total / 5,
        s"slice must be selective: $matching of $total")

      val sortedScan = scanOutputRows(slice(s"$base/sorted"))
      val controlScan = scanOutputRows(slice(s"$base/control"))

      // control: every file's ts envelope spans the whole corpus range,
      // so footer stats can never exclude a row group
      assert(controlScan == total,
        s"control layout should scan everything: $controlScan vs $total")
      // clustered: only intersecting files' row groups are read — at 8
      // disjoint ranges over 30 days, a 3-day slice touches ≤ 2 files
      assert(sortedScan >= matching)
      assert(sortedScan <= (2 * total) / Layout.PruneFileCount,
        s"clustered layout scanned $sortedScan of $total rows — no pruning")

      // pruning loses nothing: identical result sets
      val a = slice(s"$base/sorted").orderBy("event_id").collect().toSeq
      val b = slice(s"$base/control").orderBy("event_id").collect().toSeq
      assert(a == b)

      // the predicate is pushed, not post-scan
      val plan = slice(s"$base/sorted").queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(ts"))
    } finally fs.delete(new Path(base), true)
  }
}
