package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** i10 quarantine-tolerant JSONL ingest: both split sides on the
  * planted corpus (clean rows round-trip exactly, corrupt rows carry
  * the best-effort key with blanked fields), and a gnarly-text round
  * trip — embedded quotes, newlines, backslashes, unicode — through
  * the real staged file.
  */
class JsonlQuarantineSpec extends SparkSpecBase {
  import spark.implicits._

  test("split sides: clean rows round-trip, corrupt rows quarantine with their key") {
    val got = Ingest.i10JsonlQuarantine(spark, sf).persist()
    try {
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = docs.count()
      assert(got.count() == n, "every input line must land exactly once")
      val q = got.filter(col("status") === "quarantined")
      assert(q.count() == docs.filter(Ingest.i10IsCorrupt(col("doc_id")))
        .count(), "quarantine count must equal the planted corruption")
      assert(q.filter(!Ingest.i10IsCorrupt(col("doc_id"))).count() == 0,
        "a clean line was quarantined")
      assert(q.filter(col("lang") =!= "" || col("n_chars") =!= -1L)
        .count() == 0, "quarantined rows must blank unparsed fields")
      // clean side: exact field round trip against the source table
      val clean = got.filter(col("status") === "ok")
        .join(docs.withColumnRenamed("lang", "src_lang")
          .withColumnRenamed("n_chars", "src_n"), "doc_id")
      assert(clean.filter(col("lang") =!= col("src_lang") ||
        col("n_chars") =!= col("src_n")).count() == 0,
        "a parsed row diverged from its source")
    } finally got.unpersist()
  }

  test("gnarly text survives the JSONL round trip; truncation always quarantines") {
    val gnarly = "line1\nline2\t\"quoted\" back\\slash é中 {\"doc_id\":999}"
    val docs = Seq(
      (1L, "en", 10L, gnarly),
      (7L, "en", 10L, gnarly),   // corrupt-planted id, same hostile text
      (17L, "zh", 3L, ""))       // corrupt-planted id, EMPTY text tail
      .toDF("doc_id", "lang", "n_chars", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_i10spec_")
    try {
      val got = Ingest.i10Of(spark, docs, dir.toString)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
      // the embedded {"doc_id":999} in TEXT must not shadow the real
      // key: the payload renders doc_id first, regex takes the first
      assert(got == Map(
        1L -> (("en", 10L, "ok")),
        7L -> (("", -1L, "quarantined")),
        17L -> (("", -1L, "quarantined"))), s"got $got")
      // and the staged file is genuinely line-per-record (escaping
      // kept the embedded newlines out of the line structure)
      val lines = spark.read.text(s"$dir/in").count()
      assert(lines == 3, s"JSONL line structure broken: $lines lines")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
