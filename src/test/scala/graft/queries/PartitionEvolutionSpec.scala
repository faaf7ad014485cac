package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o19 — partition evolution. The registered query's oracle hash
  * certifies CONTENT across the evolution; this spec pins the pruning
  * mechanics a hash cannot see: after the spec change, a filter on the
  * OLD partition column partition-prunes the old segment's directories
  * (fewer FILES read, not just fewer rows) while the new segment — laid
  * out under the new spec — is row-filtered; and symmetrically for the
  * new column. Also pins the read discipline (uncommitted layout fails
  * loudly).
  */
class PartitionEvolutionSpec extends SparkSpecBase {

  private val cols = Seq("doc_id", "lang", "source")

  private def build(): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_o19s_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(cols.map(col): _*)
    docs.write.partitionBy("lang").parquet(s"$base/seg-a")
    assert(Warehouse.o19Commit(base, 1, Seq("a" -> "lang")))
    docs.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + lit(5000000000L)).as("doc_id"), col("lang"),
        lit("late-crawl").as("source"))
      .write.partitionBy("source").parquet(s"$base/seg-b")
    assert(Warehouse.o19Commit(base, 2, Seq("a" -> "lang", "b" -> "source")))
    base
  }

  test("old-spec filter partition-prunes old segment, row-filters the new one") {
    val base = build()
    try {
      def segFiles(seg: String, filter: Option[org.apache.spark.sql.Column]): Long = {
        val df = filter.foldLeft(
          Warehouse.o19Read(spark, base, 2, cols))(_ filter _)
        df.collect()
        ScanMetrics.executedScanMetric(df, _.contains(s"seg-$seg"), "numFiles")
      }
      val aAll = segFiles("a", None)
      val bAll = segFiles("b", None)
      assert(aAll > 1, "harness needs a multi-partition old segment")
      // filter on the OLD spec's column: the old segment reads FEWER
      // FILES (directory pruning), the new segment still reads all its
      // files (lang is a data column there)
      val aPruned = segFiles("a", Some(col("lang") === "en"))
      val bUnpruned = segFiles("b", Some(col("lang") === "en"))
      assert(aPruned < aAll,
        s"lang filter must partition-prune seg-a ($aPruned vs $aAll files)")
      assert(bUnpruned == bAll,
        "the new segment has no lang directories to prune")
      // and symmetrically for the NEW spec's column
      val bPruned = segFiles("b", Some(col("source") === "nonexistent"))
      val aUnprunedBySource = segFiles("a", Some(col("source") === "late-crawl"))
      assert(bPruned == 0 || bPruned < bAll,
        "source filter must partition-prune seg-b")
      assert(aUnprunedBySource == aAll,
        "the old segment has no source directories to prune")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }

  test("reads resolve strictly through the layout manifest") {
    val base = build()
    try {
      // both layouts visible through v2; v1 sees only the old segment
      val v1 = Warehouse.o19Read(spark, base, 1, cols)
      val v2 = Warehouse.o19Read(spark, base, 2, cols)
      assert(v2.count() > v1.count())
      assert(v1.filter(col("source") === "late-crawl").count() == 0)
      assertThrows[IllegalArgumentException] {
        Warehouse.o19Read(spark, base, 3, cols)
      }
      // layout commits are CAS: a duplicate version create loses loudly
      assert(!Warehouse.o19Commit(base, 2, Seq("a" -> "lang")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(base))
  }
}
