package graft.queries

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** o14 write-audit-publish: gate counts reconcile with the injection
  * predicates computed independently, every quarantined row's violation
  * list matches its key's divisibility exactly, and valid rows carry no
  * violations.
  */
class WriteConstraintsSpec extends SparkSpecBase {

  test("o14 gate decisions reconcile with the injection predicates") {
    val got = Warehouse.o14WriteConstraints(spark, sf).collect()
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(got.length === keys.size, "row conservation through WAP")
    val expected = keys.map { k =>
      val v = Seq(
        if (k % 103 == 0) Some("chk_fk_customer") else None,
        if (k % 97 == 0) Some("chk_positive_price") else None,
        if (k % 101 == 0) Some("chk_valid_status") else None).flatten
      k -> v.mkString(",")
    }.toMap
    got.foreach { r =>
      val (k, gate, viol) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(viol === expected(k),
        s"violations for $k must match its divisibility: $r")
      assert(gate === (if (expected(k).isEmpty) "valid" else "quarantined"),
        s"gate must follow the violation list: $r")
    }
    val quarantined = got.count(_.getString(1) == "quarantined")
    assert(quarantined > 0, "the injection must quarantine something")
    assert(quarantined < got.length / 10,
      "quarantine must stay a small minority of the feed")
  }
}
