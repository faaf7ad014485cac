package graft.streaming

import graft.SparkSpecBase
import graft.queries.Warehouse
import org.apache.spark.sql.functions._

/** st26 — streaming the change data feed. The registered query drives
  * the real two-run incremental consumption (attempts ledger + apply
  * algebra in-op); this spec pins BATCH-TWIN PARITY: the streamed feed
  * equals the pure-batch o20 diff chain computed over independently
  * rebuilt versions — same rows, same tags, version by version.
  */
class CdfStreamSpec extends SparkSpecBase {

  test("streamed feed == batch o20 diff chain, version by version") {
    val streamed = CdfStream.st26StreamChangeFeed(spark, sf)
      .collect().map(_.toSeq).toSeq

    // the batch twin: the same three versions derived directly (no
    // manifests, no stream), diffed with the batch-certified o20 core
    val v1 = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("cust_id"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("bal"))
    val v2 = Warehouse.o10Apply(v1,
      Warehouse.o10ChangesOf(graft.Tables.events(spark, sf)))
    val v3 = v2.filter(col("cust_id") % 101 =!= 0)
      .withColumn("bal", when(col("cust_id") % 5 === 0, col("bal") * 2)
        .otherwise(col("bal")))
    val cols = Seq("segment", "bal")
    val batch = Warehouse.o20Diff(v1.limit(0), v1, "cust_id", cols)
      .withColumn("version", lit(1))
      .unionByName(Warehouse.o20Diff(v1, v2, "cust_id", cols)
        .withColumn("version", lit(2)))
      .unionByName(Warehouse.o20Diff(v2, v3, "cust_id", cols)
        .withColumn("version", lit(3)))
      .select(col("version"), col("cust_id"), col("segment"), col("bal"),
        col("change_type"))
      .orderBy("version", "cust_id", "change_type")
      .collect().map(_.toSeq).toSeq

    assert(streamed == batch,
      "the stream must carry exactly the batch diff chain")
    // and the feed is O(changes): the untouched majority emits nothing
    // after the bootstrap version
    val post = streamed.filter(_.head != 1)
    val tableSize = v1.count()
    assert(post.nonEmpty && post.size < tableSize,
      s"feed rows past bootstrap (${post.size}) must be fewer than " +
        s"table rows ($tableSize) — the diff is O(changes)")
  }
}
