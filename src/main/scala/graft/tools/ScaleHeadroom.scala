package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftExtensions
import graft.queries.{Curation, Dedup, Similarity}

/** Scale-headroom measurement (r8 verdict #5): time the candidate-
  * generation family — d2 n-gram Jaccard, d3 MinHash+LSH, d5 SimHash
  * pairs, s2 sign-LSH, c4 decontamination — on the base corpus vs a
  * synthetically enlarged one, and report the time-growth ratio per
  * operator. The banding/df-cap math says each is near-linear in corpus
  * size; this converts the assertion into measured data.
  *
  * Enlargement model: `copies` shifted copies of the corpus where every
  * copy's words are TAGGED with the copy index (`regexp_replace` word
  * prefix), so copies share no shingles with each other or the base —
  * i.e. genuinely NEW content with the same length/shape distribution,
  * the honest model of "10× more crawl data". (Clone-based enlargement
  * — the ScaleHeadroomSpec corpus — grows duplicate DENSITY
  * quadratically instead, which measures output-size growth, not
  * operator scaling.) Embeddings enlarge by rotating each vector by
  * `copy` positions: norm-preserving, different sign pattern, so no
  * cross-copy LSH collisions by construction. The c4 bench side stays
  * the base benches (production shape: eval sets don't grow with the
  * crawl).
  *
  * Output: one JSON line per (operator, scale) with wall seconds (min
  * over `reps`), plus a final summary line with the growth ratios and
  * the sub-quadratic verdict per operator (ratio < copies² — and the
  * near-linear target is ratio ≈ copies).
  *
  * Usage: `sbt "runMain graft.tools.ScaleHeadroom /root/testdata/sf0.1 10 2"`
  */
object ScaleHeadroom {

  private def enlargeDocs(base: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      if (i == 0) base
      else base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c$i$$1").as("text"))
    }.reduce(_ unionByName _)

  private def enlargeEmb(base: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      if (i == 0) base
      else base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        concat(slice(col("embedding"), lit(i + 1),
            size(col("embedding")) - lit(i)),
          slice(col("embedding"), lit(1), lit(i))).as("embedding"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensureRegistered(spark)
    val par = spark.sparkContext.defaultParallelism

    def docsAt(scale: Int): DataFrame = {
      val base = Tables.documents(spark, sfDir).select("doc_id", "text")
      enlargeDocs(base, scale).repartition(par, col("doc_id"))
    }
    def embAt(scale: Int): DataFrame = {
      val base = Tables.embeddings(spark, sfDir)
        .select("vec_id", "embedding")
      enlargeEmb(base, scale).repartition(par, col("vec_id"))
        .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
    }

    // fresh (non-shared-cache) shingle sets so each scale pays its own
    // shingling cost and nothing leaks across measurements
    def setsOf(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        array_distinct(expr(Tables.ngramsExpr("w", 3))).as("shingles"))

    val isBench = col("doc_id") % 100 === 0 && col("doc_id") < 1000000L
    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "d2_ngram_jaccard" -> (n => Dedup.d2PairsOf(setsOf(docsAt(n)))),
      "d3_minhash_lsh" -> (n => Dedup.minhashLsh(setsOf(docsAt(n)))),
      "d5_simhash_pairs" -> (n => Dedup.d5PairsOf(docsAt(n))),
      "d9_simhash64_pairs" -> (n => Dedup.d9PairsOf(docsAt(n))),
      "s2_lsh_neardup" -> (n => Similarity.lshNearDup(embAt(n))),
      "c4_decontaminate" ->
        (n => Curation.decontaminateOf(setsOf(docsAt(n)), isBench)))

    // warm up session/codegen outside the timed region
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    docsAt(1).count(); embAt(1).count()

    val results = ops.map { case (name, f) =>
      def time(scale: Int): (Double, Long) = {
        var rows = 0L
        val t = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = f(scale).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, rows)
      }
      val (t1, r1) = time(1)
      val (tn, rn) = time(copies)
      val ratio = tn / t1
      println(f"""{"op":"$name","base_sec":$t1%.2f,"scaled_sec":$tn%.2f,"scale":$copies,"ratio":$ratio%.2f,"base_rows":$r1,"scaled_rows":$rn}""")
      (name, t1, tn, ratio)
    }
    val verdicts = results.map { case (n, _, _, r) =>
      s""""$n":${f"$r%.2f"}"""
    }.mkString("{", ",", "}")
    val allSub = results.forall { case (_, _, _, r) =>
      r < copies.toDouble * copies }
    println(s"""{"metric":"scale_headroom","copies":$copies,"ratios":$verdicts,"all_subquadratic":$allSub}""")
    spark.stop()
  }
}
