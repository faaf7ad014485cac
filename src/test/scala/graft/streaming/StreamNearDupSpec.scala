package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the st18 streaming near-dup admission contract on hand batches:
  * within-batch lower-id rejection, cross-batch rejection via the
  * persisted index, the index holding ADMITTED docs only, and the
  * staged-corpus run never admitting an injected clone.
  */
class StreamNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private val textX = "alpha beta gamma delta epsilon zeta eta theta"
  private val textY = "one two three four five six seven eight nine"
  private val textZ = "red green blue cyan magenta yellow black white"

  test("admitBatch: in-batch dup rejected; index holds admitted only; cross-batch via index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st18spec_")
    val indexRoot = dir.resolve("index").toString
    val sinkDir = dir.resolve("admitted").toString
    try {
      val b0 = Seq((1L, textX), (2L, textX), (3L, textY))
        .toDF("doc_id", "text")
      StreamNearDup.admitBatch(spark, indexRoot, sinkDir, b0, 0L)
      val idx0 = spark.read.parquet(s"$indexRoot/sig")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idx0 == Set(1L, 3L),
        s"index after batch 0 must hold admitted docs only: $idx0")

      val b1 = Seq((10L, textX), (11L, textZ)).toDF("doc_id", "text")
      StreamNearDup.admitBatch(spark, indexRoot, sinkDir, b1, 1L)

      val sink = spark.read.parquet(sinkDir)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(sink == Set((1L, 0), (3L, 0), (11L, 1)),
        s"admissions: $sink")
      val idx1 = spark.read.parquet(s"$indexRoot/sig")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idx1 == Set(1L, 3L, 11L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("staged corpus stream: no injected clone survives admission") {
    val out = StreamNearDup.st18StreamNearDup(spark, sf)
    val admitted = out.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(admitted.nonEmpty)
    assert(!admitted.exists(_._1 >= 1000000L),
      "every clone has an identical original earlier in the stream")
    // originals of the clones are themselves admitted (the clone's
    // rejection partner really is in the corpus)
    val ids = admitted.map(_._1).toSet
    assert(ids.contains(0L), "doc 0 (cloned) must be admitted")
    // most of the base corpus is unique enough to survive
    assert(ids.size >= 450, s"only ${ids.size} of 500 base docs admitted")
  }
}
