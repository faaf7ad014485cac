package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** c11 substring-collision decontamination: the headline behavioral
  * contrast its scaladoc claims — c4's directional doc-level Jaccard
  * scores a quoted-benchmark-question pair BELOW its 0.5 threshold
  * (the denominator is the whole benchmark doc, so one quote barely
  * moves it) while c11's exact 13-gram collision flags every one —
  * plus exact-run pins on synthetic docs and the scale-shape pin that
  * the corpus-sized train gram stream is pruned by a BROADCAST bench
  * semi-join before any train-keyed exchange.
  */
class SubstringDecontamSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"
  private val benchPred =
    col("doc_id") % 25 === 0 && col("doc_id") < 1000000L

  private def uniq(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("c4 misses every planted quote pair that c11 flags") {
    val corpus = Curation.c11Corpus(
      graft.Tables.documents(spark, d).select("doc_id", "text")).persist()
    try {
      val c11 = Curation.c11Of(corpus, benchPred)
        .filter(col("train_doc") >= 2000000L)
        .filter(col("train_doc") - 2000000L === col("bench_doc") ||
          col("train_doc") - 3000000L === col("bench_doc"))
        .persist()
      // every eligible bench doc's plant is flagged, at >= the quote len
      val docs = graft.Tables.documents(spark, d)
        .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
        .filter(benchPred)
      val elig13 = docs.filter(col("n") >= 30).count()
      val elig20 = docs.filter(col("n") >= 48).count()
      assert(elig13 > 0 && elig20 > 0, "injection not data-reachable")
      val got13 = c11.filter(col("train_doc") < 3000000L)
      val got20 = c11.filter(col("train_doc") >= 3000000L)
      assert(got13.count() == elig13,
        s"c11 must flag all $elig13 13-token plants, got ${got13.count()}")
      assert(got20.count() == elig20,
        s"c11 must flag all $elig20 20-token plants, got ${got20.count()}")
      assert(got13.filter(col("max_run") < 13).count() == 0)
      // run stitching: the 20-token quote is 8 grams on ONE diagonal,
      // so the stitched run must recover the full quote length
      assert(got20.filter(col("max_run") < 20).count() == 0)

      // c4's directional 3-gram ratio over the SAME corpus and bench
      // predicate: every planted pair it surfaces scores below 0.5 —
      // the provable miss c11 exists for
      val c4 = Curation.decontaminateOf(
          Dedup.shingleSetsPlain(corpus), benchPred)
        .filter(col("train_doc") - 2000000L === col("bench_doc") ||
          col("train_doc") - 3000000L === col("bench_doc"))
      assert(c4.filter(col("contaminated")).count() == 0,
        "c4 flagged a quote pair — the c11 contrast claim is wrong")
      assert(c4.filter(col("overlap") >= 0.5).count() == 0)
    } finally corpus.unpersist()
  }

  test("exact runs on synthetic docs: minimal 13-gram hit and 20-token stitch") {
    val quote = uniq("q", 30)
    val toks = quote.split(" ")
    // plants mirror c11Corpus: quote tokens 5..5+len-1, host unrelated
    val host13 = uniq("hostA", 60) + " " + toks.slice(4, 4 + 13).mkString(" ")
    val host20 = uniq("hostB", 60) + " " + toks.slice(4, 4 + 20).mkString(" ")
    val docs = Seq((0L, quote), (2000001L, host13), (3000001L, host20))
      .toDF("doc_id", "text")
    val got = Curation.c11Of(docs, benchPred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // (train, bench, n_runs, max_run, n_hits)
    assert(got.toSeq == Seq(
      (2000001L, 0L, 1L, 13L, 1L), // minimal: exactly one colliding gram
      (3000001L, 0L, 1L, 20L, 8L)), // 8 grams, one diagonal, stitched
      s"got: ${got.toSeq}")
  }

  test("a shared run below 13 tokens never flags") {
    val quote = uniq("q", 30)
    val host = uniq("hostC", 60) + " " +
      quote.split(" ").slice(4, 4 + 12).mkString(" ")
    val docs = Seq((0L, quote), (2000001L, host)).toDF("doc_id", "text")
    assert(Curation.c11Of(docs, benchPred).collect().isEmpty,
      "a 12-token shared run must not collide on any 13-gram")
  }

  test("the bench semi-join is broadcast: no train-side exchange before it") {
    // the corpus-sized train gram stream must be pruned MAP-SIDE by the
    // broadcast bench gram set; a sort-merge (or shuffled-hash) semi
    // join would shuffle ~13x the corpus bytes before any filtering
    val df = Curation.c11SubstringDecontam(spark, d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, s"no semi join in the c11 plan:\n$plan")
    semiLines.foreach { l =>
      assert(l.contains("BroadcastHashJoin"),
        s"bench semi-join is not broadcast: $l")
    }
  }
}
