package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the two contracts st16's oracle cannot see in isolation:
  *
  *  1. ORDER-SENSITIVITY — sequential batch application is a different
  *     function than one global latest-per-key merge: a key deleted in
  *     batch 1 and upserted in batch 2 re-enters with default attributes
  *     (original segment lost), where a global merge keeps them. A CDC
  *     consumer that "optimizes" by merging all pending changes in one
  *     pass silently changes semantics.
  *  2. IDEMPOTENT REPLAY — re-running a batch whose commit marker exists
  *     leaves the snapshot byte-identical (the at-least-once → effective
  *     exactly-once bridge st14 certifies for appends, here for merges).
  */
class CdcMergeSpec extends SparkSpecBase {

  import spark.implicits._

  private val ts0 = 1704067200000000L

  private def ev(id: Long, user: Long, typ: String, value: Double) =
    (id, new java.sql.Timestamp(ts0 / 1000 + id), user, typ, value)

  private def evDf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sequential delete-then-upsert re-enters with default attributes; global merge keeps them") {
    val base = Seq((7L, "BUILDING", 100.0), (8L, "MACHINERY", 50.0))
      .toDF("cust_id", "segment", "bal")
    val batch1 = evDf(Seq(ev(1, 7, "error", 0.0)))   // delete key 7
    val batch2 = evDf(Seq(ev(2, 7, "purchase", 9.0))) // upsert key 7

    val sequential = graft.queries.Warehouse.o10Apply(
      graft.queries.Warehouse.o10Apply(base,
        graft.queries.Warehouse.o10ChangesOf(batch1)),
      graft.queries.Warehouse.o10ChangesOf(batch2))
    val global = graft.queries.Warehouse.o10Apply(base,
      graft.queries.Warehouse.o10ChangesOf(
        evDf(Seq(ev(1, 7, "error", 0.0), ev(2, 7, "purchase", 9.0)))))

    val seq7 = sequential.filter(col("cust_id") === 7).head()
    val glob7 = global.filter(col("cust_id") === 7).head()
    assert(seq7.getAs[String]("segment") == "UNKNOWN",
      "sequential: the deleted key re-enters as a NEW row")
    assert(glob7.getAs[String]("segment") == "BUILDING",
      "global: latest change is an update, base attributes kept")
    assert(seq7.getAs[Double]("bal") == 9.0 && glob7.getAs[Double]("bal") == 9.0)
  }

  test("a replayed batch with a commit marker leaves the snapshot untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st16spec_")
    try {
      val snapRoot = dir.toString
      Seq((7L, "BUILDING", 100.0), (8L, "MACHINERY", 50.0))
        .toDF("cust_id", "segment", "bal")
        .write.parquet(s"$snapRoot/current")
      val batch = evDf(Seq(ev(1, 7, "purchase", 9.0)))

      CdcMerge.mergeBatch(spark, snapRoot, batch, batchId = 0L)
      val after = spark.read.parquet(s"$snapRoot/current")
        .orderBy("cust_id").collect().toSeq
      assert(after.exists(r => r.getLong(0) == 7 && r.getDouble(2) == 9.0))

      // replay the SAME batch (and even a different change payload under
      // the same batchId — the marker, not the data, decides)
      CdcMerge.mergeBatch(spark, snapRoot, batch, batchId = 0L)
      CdcMerge.mergeBatch(spark, snapRoot,
        evDf(Seq(ev(1, 7, "error", 0.0))), batchId = 0L)
      val replayed = spark.read.parquet(s"$snapRoot/current")
        .orderBy("cust_id").collect().toSeq
      assert(replayed == after, "marker must make replay a no-op")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
