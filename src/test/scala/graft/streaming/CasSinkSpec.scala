package graft.streaming

import graft.SparkSpecBase
import graft.queries.Warehouse
import org.apache.spark.sql.functions._

/** st25 — the CAS-committed streaming sink. The registered query drives
  * the REAL crash/replay through a checkpointed restart; this spec pins
  * the commit-body invariants in isolation: replay idempotence (the log
  * dedupes, no side markers), conflict retry against interleaved
  * commits, and manifest-chain reads.
  */
class CasSinkSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("a replayed batch commits exactly once — the manifest chain IS the dedupe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st25s_")
    val base = dir.toString
    try {
      val b0 = df(Seq(1L -> "a", 2L -> "b"))
      CasSink.commitBatch(base, b0, 0L)
      CasSink.commitBatch(base, b0, 0L) // replay after successful commit
      CasSink.commitBatch(base, df(Seq(3L -> "c")), 1L)
      CasSink.commitBatch(base, df(Seq(3L -> "c")), 1L) // replay again
      assert(Warehouse.o16Latest(base) == 2,
        "two batches must land as exactly two versions")
      val log = CasSink.readLog(spark, base)
      assert(log.count() == 3, "no row may duplicate under replay")
      assert(log.select("version").distinct().count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("an interleaved foreign commit forces a retry, never a lost update") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st25s_")
    val base = dir.toString
    try {
      CasSink.commitBatch(base, df(Seq(1L -> "a")), 0L)
      // another shard/writer lands v2 under a token this stream never
      // probes as its own
      Warehouse.o16Stage(base, "foreign", df(Seq(9L -> "z")))
      assert(Warehouse.o16TryPublish(base, "foreign", 1))
      // this stream's next batch must retry past the foreign commit
      CasSink.commitBatch(base, df(Seq(2L -> "b")), 1L)
      assert(Warehouse.o16Latest(base) == 3)
      assert(CasSink.readLog(spark, base).count() == 3,
        "every writer's rows must survive the interleave")
      // and its OWN replay still skips despite the foreign manifest
      // sitting between its commits
      CasSink.commitBatch(base, df(Seq(2L -> "b")), 1L)
      assert(Warehouse.o16Latest(base) == 3,
        "replay across an interleaved foreign commit must still dedupe")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
