package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** s27 — manifest-routed IVF probe. The registered query pins routing
  * on the real index in-op (inputFiles == routed set); this spec pins
  * the two halves independently:
  *
  *  - answer parity: routing changes which files are read, never the
  *    result — s27 == s8 row for row;
  *  - the file-routing mechanism in isolation: a cell-partitioned
  *    layout + per-cell file manifest reads EXACTLY the probed cell's
  *    files (scan metrics, set equality), and the routed scan carries
  *    exactly that cell's rows.
  */
class ManifestRoutedIvfSpec extends SparkSpecBase {

  test("manifest routing never changes the answer: s27 == s8") {
    val routed = Similarity.s27ManifestIvf(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = Similarity.s8IvfPersisted(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(routed == plain,
      "the manifest-routed probe must return the s8 relation exactly")
  }

  test("a probe opens exactly its cell's files — scan-metrics set equality") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s27s_")
    val path = s"$dir/cells"
    try {
      // 4 cells x 6 vectors, cell-clustered exactly like the operator
      val rows = for (cell <- 0L to 3L; i <- 0L until 6L)
        yield (cell * 10 + i, cell)
      rows.toDF("vec_id", "cent_id")
        .repartition(4, col("cent_id"))
        .write.partitionBy("cent_id").parquet(path)
      val manifest = spark.read.option("basePath", path).parquet(path)
        .groupBy(col("cent_id").cast("long").as("cell"),
          input_file_name().as("file"))
        .count().collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(manifest.map(_._1).distinct.size == 4,
        "the layout must materialize every cell")
      // route to cell 2 only
      val selected = manifest.filter(_._1 == 2L).map(_._2)
      assert(selected.nonEmpty && selected.size < manifest.size)
      val scan = spark.read.option("basePath", path).parquet(selected: _*)
      assert(scan.inputFiles.toSet == selected.toSet,
        "the executed scan must open exactly the routed files")
      // and the routed scan is the cell, whole and alone
      val got = scan.select("vec_id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (20L to 25L),
        s"routed read must carry exactly cell 2's rows, got ${got.toSeq}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
