package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the e6 inverted-index contains rewrite: result-identical to the
  * direct e4 nested-loop algorithm on the same pairs, and — the reason
  * it exists — still runs at a dimension size the e4 guard refuses,
  * with every join an equi-join.
  */
class InvertedContainsSpec extends SparkSpecBase {
  import spark.implicits._

  test("rewrite is result-identical to the direct BNLJ contains join") {
    val pairs = Enrich.e6Pairs.toDF("kw1", "kw2")
    val direct = Enrich.e4ContainsJoinGuarded(spark, sf, pairs, 1000L)
      .collect().toSeq
    val rewritten = Enrich.e6InvertedContainsOver(spark, sf, pairs)
      .collect().toSeq
    assert(rewritten == direct)
    assert(direct.nonEmpty)
  }

  test("runs past the e4 ceiling; synthetic no-match pairs add nothing") {
    // 20k pairs: the 8 real ones + 19992 keywords absent from the corpus
    val synth = spark.range(19992).select(
      concat(lit("kwx"), col("id")).as("kw1"), lit("kwy").as("kw2"))
    val big = Enrich.e6Pairs.toDF("kw1", "kw2").unionByName(synth)

    val thrown = intercept[IllegalStateException] {
      Enrich.e4ContainsJoinGuarded(spark, sf, big,
        10L * 1000) // e4's production ceiling
    }
    assert(thrown.getMessage.contains("inverted"))

    val viaIndex = Enrich.e6InvertedContainsOver(spark, sf, big)
      .collect().toSeq
    val realOnly = Enrich.e6InvertedContainsOver(spark, sf,
      Enrich.e6Pairs.toDF("kw1", "kw2")).collect().toSeq
    assert(viaIndex == realOnly,
      "no-match keywords must fall out at the index, not in the result")
  }

  test("short keywords are refused with the direct-scan pointer") {
    val bad = Seq(("ab", "order")).toDF("kw1", "kw2")
    val e = intercept[IllegalArgumentException] {
      Enrich.e6InvertedContainsOver(spark, sf, bad)
    }
    assert(e.getMessage.contains("3"))
  }
}
