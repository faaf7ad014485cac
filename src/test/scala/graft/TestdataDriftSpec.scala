package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-drift guard (r11 verdict #5): the driver regenerated
  * /root/testdata mid-round-11 with `events.ts` flipped from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP(µs), which surfaced as 12 cascading
  * analysis errors instead of one named assertion. This spec makes the
  * failure mode loud: every table the reader layer serves must be
  * scannable AS CURRENTLY ENCODED, and the events-ts normalization must
  * accept BOTH encodings it has ever shipped (nanos-as-long exercised
  * in-memory — Spark cannot WRITE a TIMESTAMP(NANOS) parquet — and the
  * µs path through a real written-and-reread parquet fixture).
  */
class TestdataDriftSpec extends SparkSpecBase {

  test("every testdata table is scannable through its Tables reader") {
    val readers: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (() => Tables.region(spark, sf)),
      "nation" -> (() => Tables.nation(spark, sf)),
      "customer" -> (() => Tables.customer(spark, sf)),
      "supplier" -> (() => Tables.supplier(spark, sf)),
      "part" -> (() => Tables.part(spark, sf)),
      "orders" -> (() => Tables.orders(spark, sf)),
      "lineitem" -> (() => Tables.lineitem(spark, sf)),
      "events" -> (() => Tables.events(spark, sf)),
      "documents" -> (() => Tables.documents(spark, sf)),
      "embeddings" -> (() => Tables.embeddings(spark, sf)),
    )
    readers.foreach { case (name, rd) =>
      val df =
        try rd()
        catch { case e: Throwable => fail(
          s"TESTDATA DRIFT: reader for '$name' rejects the current " +
            s"on-disk schema — ${e.getMessage}", e) }
      assert(df.limit(1).count() == 1, s"table '$name' is empty")
    }
  }

  test("events.ts current encoding normalizes to TimestampType with µs values") {
    val raw = Tables.eventsRaw(spark, sf)
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalized ts is ${ev.schema("ts").dataType}")
    // normalizeTs and tsMicros must agree on the same instants
    val viaTs = ev.select(col("event_id"), unix_micros(col("ts")).as("us"))
    val viaUs = raw.select(col("event_id"), Tables.tsMicros(raw).as("us"))
    assert(viaTs.exceptAll(viaUs).isEmpty && viaUs.exceptAll(viaTs).isEmpty)
  }

  test("normalizeTs/tsMicros/tsRawValue handle both historical ts encodings") {
    val micros = 1700000000123456L // µs-exact instant
    // nanos-as-long encoding (rounds ≤10) — in-memory frame, same branch
    val longSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    val asLong = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, micros * 1000L)), longSchema)
    assert(Tables.normalizeTs(asLong).schema("ts").dataType == TimestampType)
    assert(Tables.normalizeTs(asLong)
      .select(unix_micros(col("ts"))).head().getLong(0) == micros)
    assert(asLong.select(Tables.tsMicros(asLong)).head().getLong(0) == micros)
    assert(Tables.tsRawValue(longSchema, micros) == micros * 1000L)

    // µs TIMESTAMP_NTZ encoding (round 11+) — real parquet round-trip
    val ntzSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-drift")
    try {
      spark.createDataFrame(
          java.util.Arrays.asList(
            Row(1L, Tables.tsRawValue(ntzSchema, micros))),
          ntzSchema)
        .write.mode("overwrite").parquet(dir.toString)
      val back = spark.read.parquet(dir.toString)
      assert(back.schema("ts").dataType == TimestampNTZType,
        s"fixture round-trip changed dtype: ${back.schema("ts").dataType}")
      assert(Tables.normalizeTs(back).schema("ts").dataType == TimestampType)
      assert(Tables.normalizeTs(back)
        .select(unix_micros(col("ts"))).head().getLong(0) == micros)
      assert(back.select(Tables.tsMicros(back)).head().getLong(0) == micros)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
