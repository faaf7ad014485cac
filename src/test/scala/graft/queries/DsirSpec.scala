package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** c13 DSIR importance-resampling selection: exact integer weights
  * against an independent reference computation on a tiny corpus, the
  * bin-resolution top-slice contract, the broadcast shape of the
  * weight join, and the operator's purpose on the organic corpus —
  * target-language documents score and select above every other
  * language.
  */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private val isEn = col("lang") === "en"

  /** Independent reference: the same DSIR formula over plain Scala
    * maps (no Spark), to pin the operator's integer arithmetic. */
  private def refLogw(docs: Seq[(Long, String, String)],
      target: String => Boolean): Map[Long, Long] = {
    def feats(text: String): Seq[String] = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, x) => s"$a $x" }
    }
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dsir:$f".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Curation.C13Buckets
    }
    def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val byDoc = docs.map { case (id, lang, text) =>
      (id, target(lang), feats(text).map(bucket)) }
    val cr = byDoc.flatMap(_._3).groupBy(identity).map { case (b, xs) =>
      b -> xs.size.toLong }
    val ct = byDoc.filter(_._2).flatMap(_._3).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val rTot = cr.values.sum
    val tTot = ct.values.sum
    val nbits = ilog2(rTot + Curation.C13Buckets) -
      ilog2(tTot + Curation.C13Buckets)
    byDoc.map { case (id, _, bks) =>
      id -> (bks.map(b => ilog2(ct.getOrElse(b, 0L) + 1) -
        ilog2(cr(b) + 1)).sum + bks.size * nbits)
    }.toMap
  }

  test("integer weights match an independent reference computation") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha beta"),
      (2L, "en", "alpha gamma beta"),
      (3L, "xx", "alpha beta gamma delta"),   // target-like transitions
      (4L, "xx", "zulu yankee xray whiskey"), // disjoint vocabulary
      (5L, "xx", "zulu"))                     // 1 token: no bigrams
    val expected = refLogw(docs, _ == "en")
    val got = Curation.c13Of(docs.toDF("doc_id", "lang", "text"), isEn)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected, s"got $got expected $expected")
    // and the weights order domains the way DSIR promises: the
    // target-vocabulary doc above the disjoint-vocabulary doc
    assert(got(3L) > got(4L))
  }

  test("docs blank after tokenization are excluded; 1-token docs are not") {
    val docs = Seq((1L, "en", "alpha beta"), (2L, "xx", "   "),
      (3L, "xx", "zulu")).toDF("doc_id", "lang", "text")
    val got = Curation.c13Of(docs, isEn).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(got.find(_.getLong(0) == 3L).get.getLong(2) == 1L) // n_feats
  }

  test("selection is a bin-resolution top slice of at least ceil(n/5)") {
    val got = Curation.c13DsirSelection(spark, sf).persist()
    try {
      val n = got.count()
      val k = math.ceil(n / Curation.C13Frac.toDouble).toLong
      val nSel = got.filter(col("selected")).count()
      assert(nSel >= k, s"selected $nSel < k=$k")
      // guard the degenerate all-selected histogram (every doc in the
      // top bin) BEFORE reading max(bin) on the unselected side — an
      // empty aggregate yields null and the bare getInt would NPE
      // instead of failing with a meaningful message (r16 advice)
      val nUnsel = got.filter(!col("selected")).count()
      assert(nUnsel > 0,
        s"degenerate histogram: all $n docs selected - the strict " +
          "top-slice separation check needs a non-empty unselected side")
      val minSelBin = got.filter(col("selected")).agg(min("bin"))
        .head().getInt(0)
      val maxUnselBin = got.filter(!col("selected")).agg(max("bin"))
        .head().getInt(0)
      assert(minSelBin > maxUnselBin,
        "selection must be exactly the top bins")
    } finally got.unpersist()
  }

  test("sf0.01: target-language docs outscore and outselect every other lang") {
    val got = Curation.c13DsirSelection(spark, "/root/testdata/sf0.01")
      .persist()
    try {
      val stats = got.groupBy("lang")
        .agg(avg(col("logw_bits")).as("mean_w"),
          avg(col("selected").cast("int")).as("sel_frac"))
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2)))).toMap
      val (enW, enF) = stats("en")
      stats.filterNot(_._1 == "en").foreach { case (l, (w, f)) =>
        assert(enW > w, s"mean logw: en $enW !> $l $w")
        assert(enF > f, s"selected fraction: en $enF !> $l $f")
      }
    } finally got.unpersist()
  }

  test("the weight join is broadcast; nothing in the scoring pass sort-merges") {
    // the registered query checkpoints the scored relation (lineage
    // truncation), so the pin targets the scoring STAGE itself — the
    // only corpus-sized join in the operator
    val docs = graft.Tables.documentsSpread(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val fb = Curation.c13FeatureStream(docs, isEn)
    val counts = fb.groupBy("bk")
      .agg(count(lit(1)).as("cr"),
        count(when(col("is_target"), lit(1))).as("ctg"))
    val weights = counts.select(col("bk"),
      ((length(expr("bin(ctg + 1)")) - lit(1)).cast("long") -
        (length(expr("bin(cr + 1)")) - lit(1)).cast("long")).as("bits"))
    val scored = Curation.c13ScoredStage(fb, weights, 0L)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized join side may sort-merge:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"per-doc aggregation must be hash-aggregated:\n$plan")
  }
}
