package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.normalize.Columns

/** DataSource V2 for the scraped raw-table family (SURVEY S1 "optional
  * DSv2 source"): reads the raw_table JSONL fixture shape (positional
  * headers/cells per row) and exposes it as an already-normalized wide
  * table — header flattening, canonical renaming, and duplicate
  * suffixing happen at the SOURCE, so every downstream query starts from
  * a stable schema.
  *
  * Spark-first mechanics demonstrated:
  *  - schema inference from one sample row at planning time (driver-side
  *    column algebra, no data pass);
  *  - `SupportsPushDownRequiredColumns`: column pruning reaches the
  *    source — pruned cells are never materialized into rows;
  *  - line-range input partitions: the file splits into `parallelism`
  *    ranges so the scan parallelizes like any multi-split source.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RawTableSource")
  *   .option("path", "/…/raw_table.json").option("tableId", "roster").load()
  * }}}
  */
class RawTableSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RawTableSource.buildSchema(options.get("path"), options.get("tableId"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RawTableTable(opts.get("path"), opts.get("tableId"), schema)
  }
}

object RawTableSource {
  private val mapper = new ObjectMapper()

  private[sources] def readLines(path: String, tableId: String): Seq[String] = {
    val all = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.toSeq
    all.filter { l =>
      l.nonEmpty && mapper.readTree(l).path("table_id").asText() == tableId
    }
  }

  /** Metadata columns + normalized header columns (strings at ingest). */
  private[sources] def buildSchema(path: String, tableId: String): StructType = {
    val meta = Seq(
      StructField("team", StringType), StructField("page", StringType),
      StructField("tab", StringType), StructField("row_idx", LongType))
    val headerFields = readLines(path, tableId).headOption.map { line =>
      val headers = mapper.readTree(line).path("headers")
        .elements().asScala.map(_.asText()).toSeq
      val reserved = Set("team", "page", "tab", "row_idx")
      Columns.dedupSuffix(
        headers.map(h => Columns.canonicalName(Columns.flattenHeader(Seq(h))))
          .map(n => if (reserved(n.toLowerCase)) s"${n}_col" else n))
        .map(StructField(_, StringType))
    }.getOrElse(Seq.empty)
    StructType(meta ++ headerFields)
  }
}

class RawTableTable(path: String, tableId: String, tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"raw_table($tableId)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RawTableScanBuilder(path, tableId, tableSchema)
}

class RawTableScanBuilder(path: String, tableId: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept `team` equality and `row_idx` range predicates — they are
    * evaluated while scanning lines, so filtered rows never become
    * InternalRows. Everything else stays with Spark as residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo("team", _: String) => true
      case GreaterThan("row_idx", _) | GreaterThanOrEqual("row_idx", _) |
           LessThan("row_idx", _) | LessThanOrEqual("row_idx", _) => true
      case _ => false
    }
    pushed = sup
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new RawTableScan(path, tableId, full, required, pushed)
}

class RawTableScan(path: String, tableId: String,
    full: StructType, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RawTableScan(tableId=$tableId, pushed=[${pushed.mkString(", ")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = RawTableSource.readLines(path, tableId).size
    val slices = math.max(1, math.min(4, n))
    val per = math.max(1, (n + slices - 1) / slices)
    (0 until n by per)
      .map(start => RawTableRange(start, math.min(start + per, n)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RawTableReaderFactory(path, tableId, full, required, pushed)
}

case class RawTableRange(start: Int, end: Int) extends InputPartition

class RawTableReaderFactory(path: String, tableId: String,
    full: StructType, required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val range = p.asInstanceOf[RawTableRange]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val lines = RawTableSource.readLines(path, tableId)
        .slice(range.start, range.end).iterator
      // source-side projection: only required ordinals materialize
      private val ordinals = required.fieldNames.map(full.fieldIndex)
      private var current: InternalRow = _

      private def passes(team: String, rowIdx: Long): Boolean =
        pushed.forall {
          case EqualTo("team", v: String) => team == v
          case GreaterThan("row_idx", v) => rowIdx > v.asInstanceOf[Number].longValue()
          case GreaterThanOrEqual("row_idx", v) => rowIdx >= v.asInstanceOf[Number].longValue()
          case LessThan("row_idx", v) => rowIdx < v.asInstanceOf[Number].longValue()
          case LessThanOrEqual("row_idx", v) => rowIdx <= v.asInstanceOf[Number].longValue()
          case _ => true
        }

      override def next(): Boolean = {
        while (lines.hasNext) {
          val node = mapper.readTree(lines.next())
          val team = node.path("team").asText()
          val rowIdx = node.path("row_idx").asLong()
          if (passes(team, rowIdx)) {
            val cells = node.path("cells").elements().asScala
              .map(_.asText(null)).toIndexedSeq
            def fullValue(i: Int): Any = i match {
              case 0 => UTF8String.fromString(team)
              case 1 => UTF8String.fromString(node.path("page").asText())
              case 2 => UTF8String.fromString(node.path("tab").asText())
              case 3 => rowIdx
              case c =>
                cells.lift(c - 4).flatMap(Option(_))
                  .map(UTF8String.fromString).orNull
            }
            current = InternalRow.fromSeq(ordinals.toIndexedSeq.map(fullValue))
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
