package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** t13 BPE apply: tokenizing with trained rules must (a) reconstruct —
  * per word, the concatenation of its tokens in merge order is the
  * word, so per doc the summed token lengths equal the summed word
  * lengths; (b) bite — every learned merged token actually appears in
  * the output stream; (c) transfer — the factored apply core tokenizes
  * a corpus the trainer never saw, the production train→apply shape.
  */
class BpeApplySpec extends SparkSpecBase {
  import spark.implicits._

  test("t13 token lengths reconstruct the corpus' non-space chars") {
    val tok = TextAnalysis.t13BpeApply(spark, sf)
    val gotLens = tok
      .select(col("doc_id"), (length(col("token")) * col("cnt")).as("l"))
      .groupBy("doc_id").agg(sum(col("l")).as("tok_chars"))
    val wantLens = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("doc_chars"))
    val mismatches = gotLens.join(wantLens, "doc_id")
      .filter(col("tok_chars") =!= col("doc_chars")).count()
    assert(mismatches === 0L,
      "tokens must cover each document's non-space characters exactly")
    assert(tok.select(countDistinct(col("doc_id"))).head().getLong(0) ===
      graft.Tables.documents(spark, sf).count(),
      "every document must be tokenized")
  }

  test("t13 learned merges appear in the token stream") {
    val docs = graft.Tables.documents(spark, sf)
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val rules = TextAnalysis.bpeTrainOver(spark, words,
      4).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(rules.nonEmpty, "the corpus must train at least one rule")
    val tok = TextAnalysis.t13BpeApply(spark, sf)
    val present = tok.select(col("token")).distinct()
      .collect().map(_.getString(0)).toSet
    // every merged token whose pair count the trainer saw must surface
    // in the applied stream (training and apply run on the same corpus)
    val missing = rules.map(_._3).filterNot(present.contains)
    assert(missing.isEmpty, s"merged tokens never emitted: $missing")
  }

  test("t13 apply core transfers trained rules to an unseen corpus") {
    val trainWords = Seq(("abab", 5L), ("abc", 3L))
      .toDF("word", "freq")
    val rules = TextAnalysis.bpeTrainOver(spark, trainWords, 2)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2)))
    // round 1 merges (a,b); round 2 merges (ab,ab)
    assert(rules.toSeq === Seq(("a", "b"), ("ab", "ab")))
    val newDocs = Seq((1L, "abx abab"), (2L, "ba"))
      .toDF("doc_id", "text")
    val newWords = newDocs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val got = TextAnalysis.t13ApplyOver(newDocs, newWords, rules.toSeq)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    // abx → [ab, x]; abab → [abab]; ba → [b, a] (no rule matches)
    assert(got === Set(
      (1L, "ab", 1L), (1L, "x", 1L), (1L, "abab", 1L),
      (2L, "b", 1L), (2L, "a", 1L)))
  }
}
