package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o29 — checkpoint-aware vacuum (the o26×o23 composition). The
  * registered query drives the 17-append / vacuum / 3-append ladder;
  * this spec pins the ordering and crash edges on a controlled log:
  *
  *  - after a vacuum NO resolution path (pointer, checkpoint, listing)
  *    names an expired version, and checkpoint-read ≡ listing-read;
  *  - the checkpoint rewrite happens BEFORE manifests unlink — a
  *    reader mid-vacuum never resolves a version whose data is gone;
  *  - a vacuum that expires nothing is a no-op;
  *  - the log keeps appending and checkpointing after a vacuum.
  */
class RetentionCheckpointSpec extends SparkSpecBase {

  private def slice(i: Int) = {
    import spark.implicits._
    Seq((i.toLong, s"row$i")).toDF("k", "v")
  }

  test("vacuum rewrites the checkpoint before anything becomes unreadable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o29s_")
    val base = dir.toString
    try {
      import java.nio.file.{Files, Paths}
      // 7 appends: checkpoint folds at 5 (O23Interval)
      (1 to 7).foreach(i =>
        assert(Warehouse.o23Append(base, s"t$i", slice(i)) == i))
      assert(Files.readString(Paths.get(base, "_last_checkpoint")).trim
        == "5")
      val (expired, debris) = WarehouseSafety.o29CheckpointVacuum(base, 3)
      assert(expired == Seq(1, 2, 3, 4))
      assert(debris.toSet == Set("data-t1", "data-t2", "data-t3", "data-t4"))
      // the one remaining checkpoint covers exactly the retained chain
      assert(Option(new java.io.File(base).list()).toSeq.flatten
        .filter(_.startsWith("checkpoint-")).toSeq == Seq("checkpoint-7"))
      assert(Files.readString(Paths.get(base, "_last_checkpoint")).trim
        == "7")
      val opens = new Warehouse.O23Opens
      val chain = Warehouse.o23Versions(base, opens)
      assert(chain == Seq(5 -> "t5", 6 -> "t6", 7 -> "t7"))
      assert(chain == Warehouse.o23VersionsByListing(base))
      assert(opens.n == 3, "pointer + checkpoint + the probe miss")
      // expired fails loudly; repeat vacuum is a no-op
      assert(scala.util.Try(Warehouse.o16Read(spark, base, 2)).isFailure)
      assert(WarehouseSafety.o29CheckpointVacuum(base, 3)
        == ((Seq(), Seq())))
      // the log lives on: append 8, 9, 10 — fold lands checkpoint-10
      (8 to 10).foreach(i =>
        assert(Warehouse.o23Append(base, s"t$i", slice(i)) == i))
      assert(Files.readString(Paths.get(base, "_last_checkpoint")).trim
        == "10")
      assert(Files.readString(Paths.get(base, "checkpoint-10"))
        .linesIterator.toSeq.map(_.takeWhile(_ != ':').toInt)
        == (5 to 10))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("a stranded stale checkpoint would have resolved expired versions — o29 retires it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o29s_")
    val base = dir.toString
    try {
      (1 to 6).foreach(i =>
        assert(Warehouse.o23Append(base, s"t$i", slice(i)) == i))
      // the hazard o26-style vacuuming would leave: checkpoint-5 folds
      // 1..5; naive manifest-only expiry of 1..4 leaves it naming them
      val cp5 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(base, "checkpoint-5"))
      assert(cp5.linesIterator.toSeq.map(_.takeWhile(_ != ':').toInt)
        == (1 to 5), "precondition: the fold covers versions 1..5")
      WarehouseSafety.o29CheckpointVacuum(base, 2)
      // checkpoint-5 is gone; the new checkpoint names retained only
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(base, "checkpoint-5")))
      assert(java.nio.file.Files.readString(
          java.nio.file.Paths.get(base, "checkpoint-6"))
        .linesIterator.toSeq.map(_.takeWhile(_ != ':').toInt)
        == Seq(5, 6))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
