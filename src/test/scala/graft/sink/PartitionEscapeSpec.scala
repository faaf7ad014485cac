package graft.sink

import graft.SparkSpecBase
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

/** The skip-if-exists gate must probe partition directories the way
  * Spark WRITES them: partition values with filesystem-hostile chars
  * (space, colon, percent) are escaped on disk, so a raw string-concat
  * probe path would never match. This pins the escaped round-trip the
  * s13 decision path relies on.
  */
class PartitionEscapeSpec extends SparkSpecBase {

  test("partitionExists finds partitions whose values need path escaping") {
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_escape_spec_" +
      spark.sparkContext.applicationId
    val hostile = Seq(("a b", 1L), ("x:y", 2L), ("p%q", 3L), ("plain", 4L))
      .toDF("source", "doc_id")
    Sinks.writePartitioned(hostile, base, Seq("source"))
    try {
      for (v <- Seq("a b", "x:y", "p%q", "plain")) {
        val esc = ExternalCatalogUtils.escapePathName(v)
        assert(Sinks.partitionExists(hostile, s"$base/source=$esc"),
          s"escaped probe missed partition '$v'")
      }
      // the raw concat path must NOT exist for a value needing escaping —
      // proving the escape is load-bearing, not decorative
      assert(!Sinks.partitionExists(hostile, s"$base/source=x:y"))
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
