package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** a22 — manifest-level bloom-filter file skipping. The registered
  * query pins envelope-can't/bloom-can on the corpus layout; this spec
  * pins the bloom semantics in isolation:
  *
  *  - NO FALSE NEGATIVES: for every stored key, the bloom selection
  *    includes the file that actually holds it (the property the
  *    lossless oracle hash rests on);
  *  - may-contain is one-sided: a key that was never stored selects
  *    few files (usually none) — and reading them finds nothing;
  *  - the manifest is one row per FILE with a bounded bitset.
  */
class BloomPruneSpec extends SparkSpecBase {

  private def layout(dir: String): (Seq[(String, Set[Long])], Seq[String]) = {
    import spark.implicits._
    val keys = (0 until 200).map(i => s"key-$i")
    keys.toDF("k").repartition(8, col("k"))
      .write.parquet(s"$dir/t")
    (Layout.a22BloomManifest(spark, s"$dir/t", "k"), keys)
  }

  private def bitsOf(keys: Seq[String]): Seq[Seq[Long]] = {
    import spark.implicits._
    keys.toDF("k").select(Layout.a22Positions(col("k")))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
  }

  test("no false negatives: every stored key's true file is selected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, keys) = layout(dir.toString)
      assert(manifest.size == 8)
      val trueFile = spark.read.parquet(s"$dir/t")
        .select(input_file_name().as("f"), col("k"))
        .collect().map(r => r.getString(1) -> r.getString(0)).toMap
      keys.foreach { k =>
        val sel = Layout.a22Select(manifest, bitsOf(Seq(k))).toSet
        assert(sel.contains(trueFile(k)),
          s"false negative: $k's file not selected")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("an absent key selects few files, and reading them finds nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, _) = layout(dir.toString)
      val sel = Layout.a22Select(manifest, bitsOf(Seq("never-stored")))
      assert(sel.size <= manifest.size / 2,
        s"absent key selected ${sel.size} of ${manifest.size}")
      if (sel.nonEmpty) {
        assert(spark.read.parquet(sel: _*)
          .filter(col("k") === "never-stored").isEmpty)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("the manifest is one bounded row per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, _) = layout(dir.toString)
      val files = new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).length
      assert(manifest.size == files)
      assert(manifest.forall(_._2.size <= Layout.A22Bits))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
