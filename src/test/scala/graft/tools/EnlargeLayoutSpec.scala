package graft.tools

import graft.SparkSpecBase

/** The enlargement tool's driver-layout contract: every table lands as
  * ONE parquet FILE named `<table>.parquet` (the streaming harnesses
  * stage inputs via java.nio Files.copy of that path — a directory
  * there copies EMPTY and a stream silently processes zero rows; the
  * first 10× composition run failed exactly that way), with row
  * counts scaled and id spaces disjoint across copies.
  */
class EnlargeLayoutSpec extends SparkSpecBase {

  test("every enlarged table is a single parquet FILE with scaled content") {
    val out = java.nio.file.Files.createTempDirectory("graft_enlarge_spec_")
    try {
      EnlargeTestdata.enlarge(spark, sf, out.toString, 3)
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach { t =>
        val p = out.resolve(s"$t.parquet")
        assert(java.nio.file.Files.isRegularFile(p),
          s"$t.parquet must be a single FILE (java.nio copy-ability), " +
            s"found ${if (java.nio.file.Files.isDirectory(p)) "directory"
              else "nothing"}")
      }
      def n(dir: String, t: String): Long =
        spark.read.parquet(s"$dir/$t.parquet").count()
      assert(n(out.toString, "documents") == 3 * n(sf, "documents"))
      assert(n(out.toString, "events") == 3 * n(sf, "events"))
      assert(n(out.toString, "customer") == n(sf, "customer"),
        "dims are copied verbatim, never enlarged")
      // copies mint disjoint ids: total distinct == total rows
      val docs = spark.read.parquet(s"$out/documents.parquet")
      assert(docs.select("doc_id").distinct().count() == docs.count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
  }
}
