package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the e2e ingest lifecycle (r16 verdict ask #3): i10 quarantine
  * landing → o14 write-audit-publish → o12 snapshot commit, with the
  * two invariants the chain exists to certify — a quarantined line
  * never reaches the published snapshot, and the quarantine ledger
  * reconciles exactly to the input row count.
  */
class IngestPipelineSpec extends SparkSpecBase {

  private lazy val out =
    EndToEnd.e2eIngestPipeline(spark, sf).localCheckpoint()

  test("the ledger reconciles: every input row exits with exactly one verdict") {
    val nIn = graft.Tables.documents(spark, sf).count()
    assert(out.count() == nIn)
    // one row per input key — no doc duplicated or dropped across stages
    assert(out.select("doc_id").distinct().count() == nIn)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet ==
      Set("published", "quarantined_parse", "quarantined_audit"))
    assert(byStatus.values.sum == nIn)
  }

  test("no quarantined key reaches the published snapshot") {
    val pub = out.filter(col("status") === "published")
    val quar = out.filter(col("status") =!= "published")
    assert(pub.join(quar.select("doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty)
    // and published rows carry no violations
    assert(pub.filter(col("violations") =!= "").isEmpty)
  }

  test("parse quarantine recovered every key; audit quarantine names its constraint") {
    val pq = out.filter(col("status") === "quarantined_parse")
    assert(pq.count() > 0, "harness lost its planted corruption")
    assert(pq.filter(col("doc_id").isNull).isEmpty,
      "best-effort key recovery missed a corrupt line")
    // parse quarantine is exactly the planted predicate
    assert(pq.filter(!Ingest.i10IsCorrupt(col("doc_id"))).isEmpty)
    val aq = out.filter(col("status") === "quarantined_audit")
    assert(aq.count() > 0, "harness lost its injected violations")
    assert(aq.filter(col("violations") === "").isEmpty,
      "an audit-quarantined row names no violated constraint")
    // each injected mutation maps to its named constraint
    assert(aq.filter(col("doc_id") % 11 === 5)
      .filter(!col("violations").contains("chk_lang_known")).isEmpty)
    assert(aq.filter(col("doc_id") % 9 === 4)
      .filter(!col("violations").contains("chk_nchars_positive")).isEmpty)
  }

  test("stage precedence: a line that fails parsing never reaches the audit") {
    // doc_id ≡ 27 (mod 110) satisfies BOTH the parse plant (%10=7) and
    // the audit mutation (%11=5); parse quarantine must win
    val both = out.filter(Ingest.i10IsCorrupt(col("doc_id")) &&
      col("doc_id") % 11 === 5)
    assert(both.filter(col("status") =!= "quarantined_parse").isEmpty)
  }
}
