package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The array-adjacency rewrite of [[TextAnalysis.lmPairs]] must emit
  * exactly the rows of the old lag-window formulation (kept as
  * [[TextAnalysis.lmPairsWindowed]]): the rewrite removed a per-pass
  * Exchange+Sort of every token string, not a single pair.
  */
class LmPairsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private def pairsOf(df: org.apache.spark.sql.DataFrame) = {
    def key(r: Row) = (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3))
    (TextAnalysis.lmPairs(df)
       .select("doc_id", "lang", "prev", "word").collect().map(key).sorted,
     TextAnalysis.lmPairsWindowed(df)
       .select("doc_id", "lang", "prev", "word").collect().map(key).sorted)
  }

  test("array pairs == window pairs on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
    val (got, want) = pairsOf(docs)
    assert(want.nonEmpty, "corpus produced no pairs - vacuous")
    assert(got.toSeq === want.toSeq)
  }

  test("array pairs == window pairs on the degenerate shapes") {
    val rows = java.util.Arrays.asList(
      Row(1L, "en", "a b c"), // plain
      Row(2L, "en", "  leading and trailing   "), // trim matters
      Row(3L, "en", "single"), // 1 token: no pairs
      Row(4L, "en", ""), // empty: no pairs
      Row(5L, "en", "   "), // whitespace-only: no pairs
      Row(6L, "en", "a\tb\nc  d"), // mixed whitespace runs
      Row(7L, "en", "x x x x"), // repeated token
      Row(8L, "en", null)) // null text: no pairs
    val df = spark.createDataFrame(rows, schema)
    val (got, want) = pairsOf(df)
    assert(got.toSeq === want.toSeq)
    // the plain doc's pairs, spelled out, so the spec fails loudly if
    // BOTH forms drift together
    assert(got.count(_._1 == 1L) == 2)
    assert(got.filter(_._1 == 6L).map(p => (p._3, p._4)).toSeq ===
      Seq(("a", "b"), ("b", "c"), ("c", "d")))
  }
}
