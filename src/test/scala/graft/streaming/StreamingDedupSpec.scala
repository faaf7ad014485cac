package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup with bounded state: the D1 hash-dedup operator
  * in streaming form — `dropDuplicatesWithinWatermark` keeps each content
  * hash only as long as the watermark horizon, so the state store stays
  * bounded on an infinite stream (the batch `dropDuplicates` twin would
  * accumulate state forever).
  */
class StreamingDedupSpec extends SparkSpecBase {

  test("dropDuplicatesWithinWatermark dedups inside the horizon, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]

    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 02:$min%02d:00")

    val deduped = mem.toDF().toDF("ts", "text")
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("text_hash")

    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      // duplicate inside the horizon → dropped
      mem.addData(ts(0) -> "doc A", ts(1) -> "doc A", ts(2) -> "doc B")
      q.processAllAvailable()
      // advance the watermark past doc A's expiry (00:00 + 10m) first …
      mem.addData(ts(40) -> "advance")
      q.processAllAvailable()
      // … then the same content is re-admitted (state expired)
      mem.addData(ts(45) -> "doc A")
      q.processAllAvailable()
      mem.addData(ts(59) -> "flush")
      q.processAllAvailable()

      val texts = spark.table("dedup_stream")
        .select("text").collect().map(_.getString(0)).toSeq
      assert(texts.count(_ == "doc A") == 2, s"got $texts") // once per horizon
      assert(texts.count(_ == "doc B") == 1)
    } finally q.stop()
  }
}
