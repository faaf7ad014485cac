package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sink.Sinks

/** S13 incremental skip-if-exists as an oracle-comparable decision table
  * (`get_basketball_stats_all_teams_Version6.py:219-222`): which
  * (source, lang) partitions would a new run skip because a previous run
  * already wrote them?
  *
  * The Spark side runs the REAL job-level gate: a deterministic
  * "previous run" subset is written through [[Sinks.writePartitioned]]
  * (S9/S10 dynamic layout) into a scratch directory, then every desired
  * partition is probed with [[Sinks.partitionExists]] — the actual
  * filesystem check the incremental pipeline uses. The DuckDB oracle
  * replays the previous-run membership rule relationally, so the
  * hash-compare certifies that the filesystem decision matches the
  * declarative rule partition-for-partition.
  *
  * The probe loop is driver-side over the DISTINCT partition list —
  * bounded by partition-space cardinality (like the reference's per-team
  * loop), never by row count.
  */
object Incremental {

  private def existsRule =
    (ascii(substring(col("source"), 1, 1)) +
      ascii(substring(col("lang"), 1, 1))) % 3 === 0

  def s13SkipExisting(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Scratch is scoped by applicationId (two concurrent sessions probing
    // the same dataset must never delete/rewrite each other's layout
    // mid-probe) AND a per-invocation unique suffix (r3 advice: two
    // concurrent invocations in the SAME application — parallel test
    // suites sharing a session — raced on the delete/write/probe
    // sequence and could flip decisions flakily).
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_s13_" +
      s.sparkContext.applicationId + "_" + Integer.toHexString(d.hashCode) +
      "_" + java.util.UUID.randomUUID().toString.take(8)
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true) // fresh scratch: only THIS write may count
    val prev = documents(s, d)
      .filter(existsRule)
      .select(col("doc_id"), col("source"), col("lang"))
    Sinks.writePartitioned(prev, base, Seq("source", "lang"))
    val desired = documents(s, d)
      .select(col("source"), col("lang")).distinct()
      .orderBy("source", "lang")
      .collect()
    val decisions = desired.toSeq.map { r =>
      val (src, lg) = (r.getString(0), r.getString(1))
      // Probe paths through Spark's own partition-value escaping — a raw
      // string concat would never match the written directory for any
      // value containing a char Spark escapes (space, ':', '%').
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName _
      val exists = Sinks.partitionExists(prev,
        s"$base/source=${esc(src)}/lang=${esc(lg)}")
      (src, lg, exists, if (exists) "skip" else "write")
    }
    fs.delete(basePath, true) // decisions are driver values now; no trace left
    decisions.toDF("source", "lang", "already_exists", "action")
      .orderBy("source", "lang")
  }

  val s13Sql: String =
    """SELECT source, lang,
      |  ((ascii(substr(source, 1, 1)) + ascii(substr(lang, 1, 1))) % 3 = 0)
      |    AS already_exists,
      |  CASE WHEN (ascii(substr(source, 1, 1)) + ascii(substr(lang, 1, 1))) % 3 = 0
      |    THEN 'skip' ELSE 'write' END AS action
      |FROM (SELECT DISTINCT source, lang FROM documents)
      |ORDER BY source, lang""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s13_skip_existing" -> s13SkipExisting,
  )

  val oracle: Map[String, String] = Map(
    "s13_skip_existing" -> s13Sql,
  )
}
