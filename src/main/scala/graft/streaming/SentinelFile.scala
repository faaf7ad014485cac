package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Driver-side writer for the tiny watermark-sentinel parquet files the
  * stream-stream join harnesses stage (1–2 rows each).
  *
  * The previous shape — `createDataFrame(rows).coalesce(1)
  * .write.parquet(scratch)` + find-the-part-file + copy — scheduled a
  * whole Spark job (plan, task, commit protocol, directory rename) per
  * query to produce one file whose every byte is a driver-known
  * constant. Like a table-format commit log, such a file is written
  * from the driver (guide §1.2: remove work, not tune it). The file is
  * read back through an EXPLICIT reader schema (`readStream.schema`),
  * so it only needs physical-type compatibility, pinned for all three
  * `ts` encodings the testdata has shipped (`SentinelFileSpec`).
  *
  * Supported field types are exactly the events-schema surface:
  * LONG (incl. the legacy nanos-as-long ts), DOUBLE, STRING,
  * TIMESTAMP_NTZ and TIMESTAMP (µs).
  */
object SentinelFile {

  private def parquetSchemaOf(
      schema: StructType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val fb = f.dataType match {
        case LongType => Types.optional(INT64)
        case DoubleType => Types.optional(DOUBLE)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case TimestampNTZType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case dt => sys.error(s"SentinelFile: unsupported type $dt " +
          s"for field ${f.name}")
      }
      b.addField(fb.named(f.name))
    }
    b.named("spark_schema")
  }

  private def microsOf(v: Any): Long = v match {
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    case ts: java.sql.Timestamp =>
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => sys.error(s"SentinelFile: not a timestamp value: $other")
  }

  /** Max event-time in MICROS straight from the parquet footer
    * statistics of `path` — a metadata read instead of the full-scan
    * `agg(max(ts))` job the sentinel stagings used to pay (guide §6:
    * that is exactly what column statistics are for; the sentinel only
    * needs a value ≥ every real event time, and footer min/max for
    * INT64 is exact when present). Returns None when any block lacks a
    * usable statistic — callers fall back to the scan, so a
    * stats-stripped file changes cost, never results. Handles both
    * shipped `ts` encodings: legacy INT64 nanos (LongType in the read
    * schema — divided down) and µs timestamps. */
  def maxTsMicrosFromFooter(path: String,
      schema: StructType): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val perBlock = reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == "ts")
          .map(_.getStatistics)
          .filter(st => st != null && !st.isEmpty && st.hasNonNullValue)
          .flatMap(_.genericGetMax match {
            case l: java.lang.Long => Some(l.longValue())
            case _ => None
          })
      }
      if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
      else {
        val raw = perBlock.flatten.max
        Some(schema("ts").dataType match {
          case LongType => Math.floorDiv(raw, 1000L) // nanos -> micros
          case _ => raw // µs-precision timestamp
        })
      }
    } finally reader.close()
  }

  /** Write `rows` (shaped like `schema`) as one parquet file at
    * `target`, no Spark job. */
  def write(schema: StructType, rows: Seq[Row],
      target: java.nio.file.Path): Unit = {
    val mt = parquetSchemaOf(schema)
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(mt, conf)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(target.toString), conf))
      .withConf(conf)
      .build()
    val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(mt)
    try rows.foreach { r =>
      val g = gf.newGroup()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!r.isNullAt(i)) f.dataType match {
          case LongType => g.add(f.name, r.getLong(i))
          case DoubleType => g.add(f.name, r.getDouble(i))
          case StringType => g.add(f.name, r.getString(i))
          case TimestampNTZType | TimestampType =>
            g.add(f.name, microsOf(r.get(i)))
          case dt => sys.error(s"SentinelFile: unsupported type $dt")
        }
      }
      w.write(g)
    } finally w.close()
  }
}
