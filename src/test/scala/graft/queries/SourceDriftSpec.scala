package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** t12 source drift: the integer L1 statistic has closed-form anchors —
  * a source with exactly the corpus mixture scores 0, a source with a
  * fully disjoint vocabulary scores the 2·Tₛ·T·(1−Tₛ/T) ceiling — and
  * the absent-word fold means the result never needs the source×vocab
  * grid to be materialized.
  */
class SourceDriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("t12 identical-mixture sources have zero drift") {
    val docs = Seq(
      ("a", "x y z x"), ("b", "x y z x"), ("c", "x y z x"))
      .toDF("source", "text")
    val out = TextAnalysis.t12Of(docs).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("l1_scaled") === 0L,
        s"identical mixture must have exact zero drift: $r")
      assert(r.getAs[Long]("drift_ppm") === 0L)
    }
  }

  test("t12 disjoint-vocabulary source hits the L1 ceiling") {
    // source a: 6 of 8 tokens; source b: 2 of 8, fully disjoint vocab
    val docs = Seq(
      ("a", "x y x y x y"), ("b", "q r")).toDF("source", "text")
    val out = TextAnalysis.t12Of(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("l1_scaled")).toMap
    // closed form: L1_scaled = 2·Ts·(T − Ts)
    assert(out("a") === 2L * 6 * (8 - 6))
    assert(out("b") === 2L * 2 * (8 - 2))
  }

  test("t12 real corpus: ppm within (0, 1e6), every source covered") {
    val out = TextAnalysis.t12SourceDrift(spark, sf).collect()
    val nSources = graft.Tables.documents(spark, sf)
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(out.length.toLong === nSources)
    out.foreach { r =>
      val ppm = r.getAs[Long]("drift_ppm")
      assert(ppm > 0L && ppm < 1000000L,
        s"drift_ppm out of range for ${r.getString(0)}: $ppm")
    }
  }
}
