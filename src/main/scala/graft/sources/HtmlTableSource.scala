package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.ingest.HtmlTables
import graft.normalize.Columns

/** DataSource V2 over raw scraped HTML pages (SURVEY S1/S2 front end —
  * the extraction the reference performs with BeautifulSoup + pandas
  * `read_html`, `unified_nba_scraper.py:246-281`): each `.html` file is
  * one team page; the source extracts the named table (visible OR
  * comment-embedded — `Basketball_Refrence_alltables.py:226-234`) and
  * exposes it as an already-normalized wide relation.
  *
  * Scale model: the unit of parallelism is the PAGE, never rows within
  * one page — `planInputPartitions` emits one partition per page file,
  * so a directory of 30 team pages scans 30-wide exactly like a
  * multi-split file source, and a 100 TB crawl shards by page with no
  * cross-page coordination. Parsing happens inside the partition
  * reader (executor-side); the driver only lists files and parses ONE
  * page at planning time for schema inference.
  *
  * Pushdown:
  *  - `SupportsPushDownRequiredColumns`: pruned columns are never
  *    materialized into InternalRows;
  *  - `page = 'x'` / `page IN (…)` filters prune WHOLE FILES at
  *    planning time — the file-level analog of partition pruning (a
  *    non-matching page is never opened).
  *
  * Schema contract: every page renders a given table id from the same
  * site template, so the header set is page-invariant; the schema
  * inferred from the first page applies to all (matching the
  * reference, which unions per-page dicts without reconciliation).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.HtmlTableSource")
  *   .option("path", "/…/pages")          // file or directory of .html
  *   .option("tableId", "Roster")         // friendly name (post-map)
  *   .load()                              // wide: meta + header columns
  *
  * spark.read.format("graft.sources.HtmlTableSource")
  *   .option("path", "/…/pages")
  *   .option("tableId", "*")              // ALL tables, ONE parse/page
  *   .load()                              // long: page, table_id,
  *                                        //   from_comment, row_idx, col, value
  * }}}
  */
class HtmlTableSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlTableSource.buildSchema(options.get("path"), options.get("tableId"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HtmlTableTable(opts.get("path"), opts.get("tableId"), schema)
  }
}

object HtmlTableSource {

  /** Reserved metadata columns prefixed to every relation. */
  private[sources] val metaFields = Seq(
    StructField("page", StringType),
    StructField("from_comment", BooleanType),
    StructField("row_idx", LongType))

  /** `tableId = "*"`: ALL tables of every page in ONE parse, as the
    * uniform long relation below — the reference's actual access
    * pattern (`unified_nba_scraper.py:260` iterates every table of a
    * page it has already parsed once). Per-table wide reads parse each
    * page once PER TABLE; a 13-table team page costs 13 parses that
    * way and one this way.
    */
  private[sources] val allTables = "*"

  private[sources] val longSchema: StructType = StructType(Seq(
    StructField("page", StringType),
    StructField("table_id", StringType),
    StructField("from_comment", BooleanType),
    StructField("row_idx", LongType),
    StructField("col", StringType),
    StructField("value", StringType)))

  /** Page files under `path`: the file itself, or the lexicographically
    * sorted `*.html`/`*.htm` children of a directory (sorted so page
    * order — and therefore schema-inference choice — is deterministic).
    */
  private[sources] def pageFiles(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(c => c.isFile &&
          (c.getName.endsWith(".html") || c.getName.endsWith(".htm")))
        .sortBy(_.getName).toSeq
    else Seq(f)
  }

  private[sources] def pageName(f: java.io.File): String =
    f.getName.replaceAll("\\.html?$", "")

  /** Parse ONE page and return the named table, if present. LAST match
    * wins when several raw ids map to one friendly name (advanced /
    * advanced_stats → Advanced): the reference assigns tables into a
    * dict keyed by name (`unified_nba_scraper.py:262-274`), so a later
    * variant overwrites an earlier one.
    */
  private[sources] def tableIn(file: java.io.File, tableId: String)
      : Option[HtmlTables.ParsedTable] = {
    val html = new String(
      java.nio.file.Files.readAllBytes(file.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    HtmlTables.extractAll(html).filter(_.tableId == tableId).lastOption
  }

  /** Normalized header names for the table (shared algebra with every
    * other raw-table path — [[Columns.normalizeRawHeaders]]). A
    * headerless table (no thead, no leading all-`<th>` row) gets
    * positional `col_{i}` names — pandas `read_html` keeps such data
    * under integer column labels rather than dropping it.
    */
  private[sources] def dataNames(t: HtmlTables.ParsedTable): Seq[String] = {
    val flat =
      if (t.flatHeaders.nonEmpty) t.flatHeaders
      else (0 until t.rows.map(_.size).maxOption.getOrElse(0))
        .map(i => s"col_$i")
    Columns.normalizeRawHeaders(flat,
      reserved = Set("page", "from_comment", "row_idx"))
  }

  private[sources] def buildSchema(path: String, tableId: String): StructType =
    if (tableId == allTables) longSchema
    else {
      val headerFields = pageFiles(path).iterator
        .flatMap(tableIn(_, tableId)).take(1).toSeq.headOption
        .map(t => dataNames(t).map(StructField(_, StringType)))
        .getOrElse(Seq.empty)
      StructType(metaFields ++ headerFields)
    }
}

class HtmlTableTable(path: String, tableId: String, tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"html_table($tableId)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HtmlTableScanBuilder(path, tableId, tableSchema)
}

class HtmlTableScanBuilder(path: String, tableId: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `page` equality/membership prunes whole files at planning time. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo("page", _: String) => true
      case In("page", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = sup
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new HtmlTableScan(path, tableId, full, required, pushed)
}

class HtmlTableScan(path: String, tableId: String,
    full: StructType, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"HtmlTableScan(tableId=$tableId, pushed=[${pushed.mkString(", ")}])"

  private def pageAccepted(page: String): Boolean = pushed.forall {
    case EqualTo("page", v: String) => page == v
    case In("page", vs) => vs.exists(_ == page)
    case _ => true
  }

  /** One partition per surviving page file — pages are the scale unit. */
  override def planInputPartitions(): Array[InputPartition] =
    HtmlTableSource.pageFiles(path)
      .filter(f => pageAccepted(HtmlTableSource.pageName(f)))
      .map(f => HtmlPagePartition(f.getAbsolutePath))
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new HtmlTableReaderFactory(tableId, full, required)
}

case class HtmlPagePartition(file: String) extends InputPartition

class HtmlTableReaderFactory(tableId: String,
    full: StructType, required: StructType) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = new java.io.File(p.asInstanceOf[HtmlPagePartition].file)
    if (tableId == HtmlTableSource.allTables) longReader(file)
    else wideReader(file)
  }

  /** Per-table wide relation: meta columns + one column per header. */
  private def wideReader(file: java.io.File): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val page = HtmlTableSource.pageName(file)
      private val rows: Iterator[(Long, Boolean, Seq[String])] =
        HtmlTableSource.tableIn(file, tableId) match {
          case Some(t) =>
            // schema-drift guard: the schema was inferred from the first
            // page carrying this table; a page whose headers differ would
            // otherwise misalign cells POSITIONALLY and silently corrupt
            // every downstream value. Fail loudly with the page name
            // instead (the reference re-reads each page's own headers,
            // `unified_nba_scraper.py:284-289`, so it cannot misalign).
            val names = HtmlTableSource.dataNames(t)
            val expected = full.fieldNames.drop(HtmlTableSource.metaFields.size).toSeq
            if (names != expected)
              throw new IllegalStateException(
                s"html table '$tableId' on page '$page' has drifted headers: " +
                  s"expected $expected, found $names")
            t.rows.iterator.zipWithIndex
              .map { case (r, i) => (i.toLong, t.fromComment, r) }
          case None => Iterator.empty
        }
      // source-side projection: only required ordinals materialize
      private val ordinals = required.fieldNames.map(full.fieldIndex)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val (idx, fromComment, cells) = rows.next()
        def fullValue(i: Int): Any = i match {
          case 0 => UTF8String.fromString(page)
          case 1 => fromComment
          case 2 => idx
          case c => cells.lift(c - 3).flatMap(Option(_))
            .map(UTF8String.fromString).orNull
        }
        current = InternalRow.fromSeq(ordinals.toIndexedSeq.map(fullValue))
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }

  /** All tables in one parse: one long row per cell, header
    * normalization identical to the wide path (same [[HtmlTableSource
    * .dataNames]] algebra, so wide and long reads of a table agree on
    * column names by construction).
    */
  private def longReader(file: java.io.File): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val page = HtmlTableSource.pageName(file)
      private val cells: Iterator[(String, Boolean, Long, String, String)] = {
        val html = new String(
          java.nio.file.Files.readAllBytes(file.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        graft.ingest.HtmlTables.extractAll(html).iterator.flatMap { t =>
          val names = HtmlTableSource.dataNames(t)
          t.rows.iterator.zipWithIndex.flatMap { case (r, i) =>
            names.iterator.zip(r.iterator).map { case (n, v) =>
              (t.tableId, t.fromComment, i.toLong, n, v)
            }
          }
        }
      }
      private val ordinals = required.fieldNames.map(full.fieldIndex)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!cells.hasNext) return false
        val (tid, fromComment, idx, colName, value) = cells.next()
        def fullValue(i: Int): Any = i match {
          case 0 => UTF8String.fromString(page)
          case 1 => UTF8String.fromString(tid)
          case 2 => fromComment
          case 3 => idx
          case 4 => UTF8String.fromString(colName)
          case 5 => Option(value).map(UTF8String.fromString).orNull
        }
        current = InternalRow.fromSeq(ordinals.toIndexedSeq.map(fullValue))
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
