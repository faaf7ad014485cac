package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o12 snapshot versioning: commits are manifest-gated and append-only,
  * committed versions are immutable under later commits, uncommitted or
  * staged-debris versions are unreadable — loudly, not as partial data.
  */
class TimeTravelSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_o12spec_").toString

  test("o12 committed versions are immutable and manifest-ordered") {
    val base = freshTable()
    try {
      val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      Warehouse.o12Commit(base, 0, v0)
      val v0Pre = Warehouse.o12ReadAsOf(spark, base, 0).collect().sortBy(_.getLong(0))
      Warehouse.o12Commit(base, 1, Seq((1L, "a2"), (3L, "c")).toDF("k", "v"))
      assert(Warehouse.o12Versions(base) === Seq(0, 1))
      val v0Post = Warehouse.o12ReadAsOf(spark, base, 0).collect().sortBy(_.getLong(0))
      assert(v0Pre.toSeq === v0Post.toSeq,
        "a later commit must not change an earlier version's rows")
      assert(Warehouse.o12ReadAsOf(spark, base, 1).count() === 2L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(base))
  }

  test("o12 uncommitted versions fail loudly; staged debris is invisible") {
    val base = freshTable()
    try {
      Warehouse.o12Commit(base, 0, Seq((1L, "a")).toDF("k", "v"))
      val e = intercept[IllegalArgumentException] {
        Warehouse.o12ReadAsOf(spark, base, 7)
      }
      assert(e.getMessage.contains("not committed"))
      // simulate a crash between data write and manifest swap: a staged
      // dir exists but the manifest never learned of it
      Seq((9L, "z")).toDF("k", "v").write
        .parquet(s"$base/.v2.staging")
      assert(Warehouse.o12Versions(base) === Seq(0),
        "staged debris must not appear in the manifest")
      val e2 = intercept[IllegalArgumentException] {
        Warehouse.o12ReadAsOf(spark, base, 2)
      }
      assert(e2.getMessage.contains("not committed"))
      // re-running the crashed commit completes it
      Warehouse.o12Commit(base, 2, Seq((9L, "z")).toDF("k", "v"))
      assert(Warehouse.o12Versions(base) === Seq(0, 2))
      assert(Warehouse.o12ReadAsOf(spark, base, 2)
        .collect().map(_.getLong(0)).toSeq === Seq(9L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(base))
  }

  test("o12 crash between data rename and manifest swap is re-runnable") {
    val base = freshTable()
    try {
      Warehouse.o12Commit(base, 0, Seq((1L, "a")).toDF("k", "v"))
      // simulate crash window 2: the data dir was renamed into place
      // (with stale content, as a partial earlier attempt would leave)
      // but the manifest swap never happened
      Seq((8L, "stale")).toDF("k", "v").write.parquet(s"$base/v=1")
      assert(Warehouse.o12Versions(base) === Seq(0))
      val e = intercept[IllegalArgumentException] {
        Warehouse.o12ReadAsOf(spark, base, 1)
      }
      assert(e.getMessage.contains("not committed"))
      // re-running the commit must replace the debris, not ENOTEMPTY-fail
      Warehouse.o12Commit(base, 1, Seq((9L, "z")).toDF("k", "v"))
      assert(Warehouse.o12Versions(base) === Seq(0, 1))
      assert(Warehouse.o12ReadAsOf(spark, base, 1)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((9L, "z")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(base))
  }

  test("o12 v1 equals the o10 merge applied to the committed v0") {
    val out = Warehouse.o12TimeTravel(spark, sf)
    val v1 = out.filter(col("version") === 1)
      .select("cust_id", "segment", "bal")
    val merged = Warehouse.o10MergeUpsert(spark, sf)
    assert(v1.count() === merged.count())
    assert(v1.exceptAll(merged).count() === 0L,
      "time-travelled v1 must be exactly the merge of v0 + changes")
  }
}
