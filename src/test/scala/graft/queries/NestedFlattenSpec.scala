package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins i11's nested-JSON ingest: the flatten shape (exactly the tag
  * fan-out, dotted struct paths land as columns), and the nested-read
  * null contract — records missing the struct or the array surface as
  * nulls / no rows under the SUPPLIED schema, never as a crash or an
  * inference-dependent shape.
  */
class NestedFlattenSpec extends SparkSpecBase {

  test("flatten shape: two tag rows per doc, struct paths columnar") {
    val out = Ingest.i11NestedFlatten(spark, sf).cache()
    try {
      val nDocs = graft.Tables.documents(spark, sf).count()
      assert(out.count() == 2 * nDocs, "tag fan-out lost rows")
      val perDoc = out.groupBy("doc_id").count()
        .filter(col("count") =!= 2)
      assert(perDoc.isEmpty)
      assert(out.columns.toSeq ==
        Seq("doc_id", "lang", "source", "rank", "tag"))
      // rank really came through the nested struct
      assert(out.filter(col("rank") =!= col("doc_id") % 50).isEmpty)
      assert(out.filter(!col("tag").rlike("^[tu][0-9]$")).isEmpty)
    } finally out.unpersist()
  }

  test("records missing the struct or array flatten to nulls, never a crash") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_i11spec_")
    try {
      java.nio.file.Files.writeString(dir.resolve("in.jsonl"),
        """{"doc_id":1,"meta":{"lang":"en","source":"cc","rank":7},"tags":["a","b"]}
          |{"doc_id":2,"tags":["c"]}
          |{"doc_id":3,"meta":{"lang":"de"}}
          |""".stripMargin)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("meta", StructType(Seq(
          StructField("lang", StringType),
          StructField("source", StringType),
          StructField("rank", LongType)))),
        StructField("tags", ArrayType(StringType))))
      val flat = spark.read.schema(schema).json(dir.toString)
        .select(col("doc_id"), col("meta.lang").as("lang"),
          col("meta.rank").as("rank"),
          explode_outer(col("tags")).as("tag"))
        .orderBy("doc_id", "tag").collect()
      assert(flat.length == 4) // 2 tags + 1 tag + 1 tagless row
      val d2 = flat.find(_.getLong(0) == 2L).get
      assert(d2.isNullAt(1) && d2.isNullAt(2) && d2.getString(3) == "c",
        "missing struct must flatten to null columns")
      val d3 = flat.find(_.getLong(0) == 3L).get
      assert(d3.getString(1) == "de" && d3.isNullAt(2) && d3.isNullAt(3),
        "partial struct keeps present fields; missing array -> null tag")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
