package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** a22 — manifest-level bloom-filter file skipping. The registered
  * query pins envelope-can't/bloom-can on the corpus layout; this spec
  * pins the bloom semantics in isolation:
  *
  *  - NO FALSE NEGATIVES: for every stored key, the bloom selection
  *    includes the file that actually holds it (the property the
  *    lossless oracle hash rests on) — at ANY bit size, including a
  *    deliberately saturated one;
  *  - may-contain is one-sided: a key that was never stored selects
  *    few files (usually none) — and reading them finds nothing;
  *  - SIZING follows the data: an undersized bloom saturates and stops
  *    skipping (the failure the 10× composition bench caught when the
  *    first cut fixed 8192 bits), while [[Layout.a22BitsFor]] keeps
  *    the fill — and so the skip rate — flat as rows/file grow;
  *  - the manifest is one row per FILE with a bounded bitset.
  */
class BloomPruneSpec extends SparkSpecBase {

  private def layout(dir: String, n: Int = 200):
      (Seq[(String, Set[Long])], Seq[String], Long) = {
    import spark.implicits._
    val keys = (0 until n).map(i => s"key-$i")
    keys.toDF("k").repartition(8, col("k"))
      .write.parquet(s"$dir/t")
    val bits = Layout.a22BitsFor(n.toLong, 8)
    (Layout.a22BloomManifest(spark, s"$dir/t", "k", bits), keys, bits)
  }

  private def bitsOf(keys: Seq[String], bits: Long): Seq[Seq[Long]] = {
    import spark.implicits._
    keys.toDF("k").select(Layout.a22Positions(col("k"), bits))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
  }

  test("no false negatives: every stored key's true file is selected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, keys, bits) = layout(dir.toString)
      assert(manifest.size == 8)
      val trueFile = spark.read.parquet(s"$dir/t")
        .select(input_file_name().as("f"), col("k"))
        .collect().map(r => r.getString(1) -> r.getString(0)).toMap
      keys.foreach { k =>
        val sel = Layout.a22Select(manifest, bitsOf(Seq(k), bits)).toSet
        assert(sel.contains(trueFile(k)),
          s"false negative: $k's file not selected")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("an absent key selects few files, and reading them finds nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, _, bits) = layout(dir.toString)
      val sel = Layout.a22Select(manifest, bitsOf(Seq("never-stored"), bits))
      assert(sel.size <= manifest.size / 2,
        s"absent key selected ${sel.size} of ${manifest.size}")
      if (sel.nonEmpty) {
        assert(spark.read.parquet(sel: _*)
          .filter(col("k") === "never-stored").isEmpty)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("sizing follows the data: a fixed bloom saturates at 30x rows, the sized one keeps skipping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val n = 6000 // 30x the base fixture: ~750 keys/file over 8 files
      val keys = (0 until n).map(i => s"key-$i")
      keys.toDF("k").repartition(8, col("k")).write.parquet(s"$dir/t")
      val probe = Seq("key-42")
      // deliberately undersized (the first cut's fixed 8192 over 8
      // files would be 1024/file-equivalent; force saturation hard)
      val small = 1024L
      val mSmall = Layout.a22BloomManifest(spark, s"$dir/t", "k", small)
      val selSmall = Layout.a22Select(mSmall, bitsOf(probe, small))
      assert(selSmall.size > mSmall.size / 2,
        s"expected the undersized bloom to saturate, selected ${selSmall.size}")
      val sized = Layout.a22BitsFor(n.toLong, 8)
      val mSized = Layout.a22BloomManifest(spark, s"$dir/t", "k", sized)
      val selSized = Layout.a22Select(mSized, bitsOf(probe, sized))
      assert(selSized.size <= 2,
        s"sized bloom must keep skipping: selected ${selSized.size} of 8")
      // the no-false-negative side holds even when saturated
      val trueFile = spark.read.parquet(s"$dir/t")
        .filter(col("k") === "key-42")
        .select(input_file_name()).head().getString(0)
      assert(selSmall.contains(trueFile) && selSized.contains(trueFile))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("the manifest is one bounded row per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a22s_")
    try {
      val (manifest, _, bits) = layout(dir.toString)
      val files = new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).length
      assert(manifest.size == files)
      assert(manifest.forall(_._2.size <= bits))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
