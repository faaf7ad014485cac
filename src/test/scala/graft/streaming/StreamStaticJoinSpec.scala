package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment: a streaming fact joined against a static
  * broadcast dimension — the streaming form of the J1 alias lookup. The
  * static side is re-read per micro-batch by Spark; with a broadcastable
  * dimension the stream side never shuffles.
  */
class StreamStaticJoinSpec extends SparkSpecBase {

  test("streaming events enrich against the static nation dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.nation(spark, sf)
      .select(col("n_nationkey").as("key"), col("n_name"))
    val mem = MemoryStream[(Long, Int)]

    val q = mem.toDF().toDF("event_id", "key")
      .join(broadcast(dim), "key")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, 0), (2L, 5), (3L, 999)) // 999: no dim match
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("enriched_stream")
      .select("event_id", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 2 && out.contains(1L) && out.contains(2L))
    assert(!out.contains(3L)) // inner join drops unmatched
    assert(out(1L).nonEmpty)
  }
}
