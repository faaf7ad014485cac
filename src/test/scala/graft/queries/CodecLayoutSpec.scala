package graft.queries

import graft.SparkSpecBase

/** a20 storage-codec layouts: the measured size lever. Both compressed
  * codecs must beat uncompressed by a real margin on this mixed
  * numeric/JSON relation, zstd must not lose to snappy, and the
  * numbers are printed so the trade-off is data, not folklore.
  */
class CodecLayoutSpec extends SparkSpecBase {

  test("codec size ordering holds with a real margin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a20spec_")
    try {
      val sizes = Layout.a20WriteLayouts(spark, sf, dir)
      val un = sizes("uncompressed").toDouble
      info(f"uncompressed=${sizes("uncompressed")} " +
        f"snappy=${sizes("snappy")} (${sizes("snappy") / un}%.2f) " +
        f"zstd=${sizes("zstd")} (${sizes("zstd") / un}%.2f)")
      assert(sizes("zstd") <= sizes("snappy"))
      assert(sizes("snappy") < sizes("uncompressed"))
      // a codec that saved <5% would mean the data defeated compression
      // (or the option silently stopped applying) — either is a bug for
      // this relation's JSON/numeric mix
      assert(sizes("zstd") < un * 0.95,
        s"zstd saved <5% on a compressible relation: $sizes")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
