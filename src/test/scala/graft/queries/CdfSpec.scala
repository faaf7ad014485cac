package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o20 — change data feed. The registered query pins the feed algebra
  * (apply(v0, feed) == v1) in-op; this spec pins the row-shape
  * semantics on crafted frames: insert/delete classification, update
  * pre/post pairing, the NO-ROW contract for value-identical keys, and
  * null-safe change detection.
  */
class CdfSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String, java.lang.Double)]) = {
    import spark.implicits._
    rows.map { case (k, s, b) =>
      (k, s, Option(b).map(_.doubleValue)) }.toDF("cust_id", "segment", "bal")
  }

  test("insert/delete/update classification; no-op keys emit nothing") {
    val prev = df(Seq(
      (1L, "A", 10.0), // unchanged -> no row
      (2L, "B", 20.0), // deleted
      (3L, "C", 30.0))) // bal changes
    val next = df(Seq(
      (1L, "A", 10.0),
      (3L, "C", 31.0),
      (4L, "D", 40.0))) // inserted
    val feed = Warehouse.o20Diff(prev, next, "cust_id",
        Seq("segment", "bal"))
      .orderBy("cust_id", "change_type")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(feed == Seq(
      2L -> "delete",
      3L -> "update_postimage", 3L -> "update_preimage",
      4L -> "insert"))
  }

  test("null-safe change detection: null->value and value->null are updates; null->null is not") {
    val prev = df(Seq((1L, "A", null), (2L, "B", null)))
    val next = df(Seq((1L, "A", 5.0), (2L, "B", null)))
    val types = Warehouse.o20Diff(prev, next, "cust_id",
        Seq("segment", "bal"))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(types == Set(1L -> "update_preimage", 1L -> "update_postimage"),
      s"null-safe comparison broke: $types")
  }

  test("the feed is O(changes): an identical snapshot pair yields an empty feed") {
    val snap = df(Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "C", 3.0)))
    assert(Warehouse.o20Diff(snap, snap, "cust_id",
      Seq("segment", "bal")).isEmpty)
  }
}
