package graft.streaming

import graft.SparkSpecBase
import graft.sink.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming → partitioned-sink bridge: `foreachBatch` reuses the batch
  * sink layer (dynamic partition overwrite) per micro-batch — the
  * streaming form of the S9/S10 partitioned directory layout.
  */
class ForeachBatchSinkSpec extends SparkSpecBase {

  test("foreachBatch writes each micro-batch through the partitioned sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val mem = MemoryStream[(String, String, Int)]

    val q = mem.toDF().toDF("team", "page", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.writePartitioned(batch, out, Seq("team"))
      }
      .start()
    try {
      mem.addData(("t1", "a", 1), ("t2", "b", 2))
      q.processAllAvailable()
      // second batch overwrites t1's partition only
      mem.addData(("t1", "a", 99))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.parquet(out)
      .select("team", "v").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(back == Map("t1" -> 99, "t2" -> 2))
  }
}
