package graft.queries

import graft.SparkSpecBase
import graft.Tables.documents
import graft.sink.Sinks
import org.apache.spark.sql.functions._

/** Pins the a1 fan-out read-back plan shape (r10 verdict #3): ONE scan
  * relation whose size is independent of key cardinality. The previous
  * implementation reduced per-key frames with `unionByName`, growing
  * the plan tree by one branch per distinct key — invisible at 20
  * sources, a driver-side planning bottleneck at 10⁴.
  */
class FanoutPlanSpec extends SparkSpecBase {

  private def withFanout[A](nKeys: Int)(body: (String, Seq[String]) => A): A = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_fanout_spec_" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val docs = documents(spark, sf)
        .select(col("doc_id"),
          concat(lit("k"), pmod(crc32(col("doc_id").cast("string")),
            lit(nKeys)).cast("string")).as("source"))
      Sinks.writePartitioned(docs, base, Seq("source"))
      val keys = (0 until nKeys).map(i => s"k$i")
      body(base, keys)
    } finally fs.delete(new org.apache.hadoop.fs.Path(base), true)
  }

  test("a1 read-back is a single scan, no Union, at any key cardinality") {
    val plans = Seq(3, 12).map { n =>
      withFanout(n) { (base, keys) =>
        val df = Incremental.fanoutReadBack(spark, base, keys)
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("Union"),
          s"read-back regressed to an N-ary union at $n keys:\n$p")
        assert("Scan parquet".r.findAllIn(p).size == 1,
          s"expected exactly one scan relation at $n keys:\n$p")
        // provenance really comes from the directory, decoded by the
        // engine's own partition-value handling
        assert(df.select("source_dir").distinct().count() == n.toLong)
        p.linesIterator.size
      }
    }
    // plan HEIGHT must not grow with key count (3 vs 12 keys): the path
    // list lives in the scan's file index, not the plan tree
    assert(plans.distinct.size == 1,
      s"plan size varies with key cardinality: ${plans.mkString(", ")}")
  }

  test("a1 read-back fails loudly on a missing per-key directory") {
    withFanout(3) { (base, keys) =>
      intercept[Exception] {
        Incremental.fanoutReadBack(spark, base, keys :+ "k_missing").count()
      }
    }
  }
}
