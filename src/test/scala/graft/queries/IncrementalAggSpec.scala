package graft.queries

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the o11 incremental-view contract: the merge LAW (partials of
  * any slicing merge to the partials of the whole — the algebraic
  * property the refresh depends on) and the mechanism (a refresh scans
  * only delta rows from the fact, never history).
  */
class IncrementalAggSpec extends SparkSpecBase {

  test("merge law: partials of any slicing merge to partials of the whole") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val whole = Warehouse.o11Finalize(
        Warehouse.o11Merge(Warehouse.o11PartialsOf(ev)))
      .orderBy("user_id").collect().toSeq
    // three uneven slices by event_id modulus — arbitrary, overlapping
    // none, covering all
    val slices = (0 until 3).map(m =>
      Warehouse.o11PartialsOf(ev.filter(pmod(col("event_id"), lit(3)) === m)))
    val merged = Warehouse.o11Finalize(
        Warehouse.o11Merge(slices.reduce(_ unionByName _)))
      .orderBy("user_id").collect().toSeq
    assert(merged == whole)
    assert(whole.nonEmpty)
  }

  test("refresh scans only delta rows from a file-per-batch fact layout") {
    // production shape: history and delta arrive as SEPARATE files of
    // one fact directory (each append is a new file), so the refresh's
    // event_id predicate prunes history at FILE granularity via footer
    // min/max stats — inside a single file, row-group stats make the
    // same cut only at row-group size, which this corpus is far below
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val boundary = 3L * (ev.agg(max(col("event_id"))).head().getLong(0) + 1) / 4
    val deltaRows = ev.filter(col("event_id") >= boundary).count()
    val dir = java.nio.file.Files.createTempDirectory("graft_o11spec_")
    try {
      val staged = s"$dir/fact"
      ev.filter(col("event_id") < boundary).coalesce(1)
        .write.mode("append").parquet(staged)
      ev.filter(col("event_id") >= boundary).coalesce(1)
        .write.mode("append").parquet(staged)
      val fact = spark.read.parquet(staged)
      Warehouse.o11PartialsOf(fact.filter(col("event_id") < boundary))
        .write.parquet(s"$dir/view")
      val viewR = spark.read.parquet(s"$dir/view")
      val refresh = Warehouse.o11Finalize(Warehouse.o11Merge(
        viewR.unionByName(Warehouse.o11PartialsOf(
          fact.filter(col("event_id") >= boundary)))))
      val factScan = ScanMetrics.scanOutputRows(refresh, _.contains("fact"))
      assert(factScan == deltaRows,
        s"refresh read $factScan fact rows, delta is $deltaRows - " +
          "history must come from the materialized state")
      // and the refreshed view equals a full recompute
      val full = Warehouse.o11Finalize(
          Warehouse.o11Merge(Warehouse.o11PartialsOf(fact)))
        .orderBy("user_id").collect().toSeq
      val inc = Warehouse.o11Finalize(Warehouse.o11Merge(
          viewR.unionByName(Warehouse.o11PartialsOf(
            fact.filter(col("event_id") >= boundary)))))
        .orderBy("user_id").collect().toSeq
      assert(inc == full)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
