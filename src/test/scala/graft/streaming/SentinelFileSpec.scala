package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The driver-written sentinel parquet must read back (through an
  * explicit reader schema, the way the stream stages consume it)
  * exactly like the Spark-job-written file it replaced — for every
  * `ts` encoding the events testdata has shipped (legacy nanos-as-long
  * LONG, µs TIMESTAMP_NTZ) plus plain TIMESTAMP.
  */
class SentinelFileSpec extends SparkSpecBase {

  private def schemaWith(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def roundTrip(tsType: DataType, tsValue: Any): Unit = {
    val schema = schemaWith(tsType)
    val rows = Seq(
      Row(-101L, tsValue, -1L, "click", 0.0, ""),
      Row(-102L, tsValue, -1L, "purchase", 1.5, "p"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sentinel_")
    try {
      val direct = dir.resolve("direct.parquet")
      SentinelFile.write(schema, rows, direct)
      val sparkDir = dir.resolve("spark")
      spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.parquet(sparkDir.toString)
      val got = spark.read.schema(schema).parquet(direct.toString)
        .collect().sortBy(_.getLong(0))
      val want = spark.read.schema(schema).parquet(sparkDir.toString)
        .collect().sortBy(_.getLong(0))
      assert(got.toSeq === want.toSeq, s"tsType=$tsType")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("nanos-as-long ts round-trips") {
    roundTrip(LongType, 1700000000123456789L)
  }

  test("TIMESTAMP_NTZ µs ts round-trips") {
    roundTrip(TimestampNTZType, java.time.LocalDateTime
      .of(2026, 2, 3, 4, 5, 6, 789012000))
  }

  test("TIMESTAMP µs ts round-trips") {
    roundTrip(TimestampType, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L, 123456000L)))
  }

  test("footer max(ts) equals the full-scan max on the corpus") {
    import org.apache.spark.sql.functions.max
    val raw = graft.Tables.eventsRaw(spark, sf)
    val scanned = raw.agg(max(graft.Tables.tsMicros(raw))).head().getLong(0)
    val footer = SentinelFile.maxTsMicrosFromFooter(
      s"$sf/events.parquet", raw.schema)
    assert(footer.contains(scanned))
  }
}
