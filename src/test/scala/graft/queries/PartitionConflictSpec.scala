package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** o25 — partition-level conflict classification + rebase (the Delta
  * ConflictChecker / Iceberg commit-validation shape, one rung above
  * o16's bare CAS). The registered query drives the 3-writer race on
  * the corpus; this spec pins the protocol edges in isolation:
  *
  *  - a disjoint-footprint writer that loses the CAS REBASES: same
  *    staged bytes, one extra manifest write, exactly 2 attempts;
  *  - an overlapping-footprint writer is classified Left(versions) —
  *    never silently rebased (that would be a lost update);
  *  - the classification names ONLY the overlapping versions, not
  *    every intervening commit;
  *  - a partition-filtered read opens only that partition's files;
  *  - delimiter characters in partition/token are refused at stage
  *    time (the o18 schema-spec lesson applied to the manifest).
  */
class PartitionConflictSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def init(base: String): Unit = {
    o25StageAll(base)
    assert(Warehouse.o25Commit(base, 1, Set("x", "y", "z"),
      Map("x" -> "base", "y" -> "base", "z" -> "base")))
  }

  private def o25StageAll(base: String): Unit = {
    Warehouse.o25Stage(base, "x", "base", df(Seq(1L -> "a", 2L -> "b")))
    Warehouse.o25Stage(base, "y", "base", df(Seq(3L -> "c")))
    Warehouse.o25Stage(base, "z", "base", df(Seq(4L -> "d")))
  }

  test("a disjoint loser rebases: 2 attempts, zero bytes restaged") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_o25s_")
    val base = dir.toString
    try {
      init(base)
      Warehouse.o25Stage(base, "x", "ax", df(Seq(1L -> "A", 2L -> "B")))
      Warehouse.o25Stage(base, "y", "by", df(Seq(3L -> "C")))
      def stagedBytes = java.nio.file.Files.list(
          java.nio.file.Paths.get(base, "p-y-by")).iterator().asScala
        .filter(p => !p.getFileName.toString.startsWith("_"))
        .map(p => (p.toString, java.nio.file.Files.size(p))).toSeq.sortBy(_._1)
      val before = stagedBytes
      assert(Warehouse.o25CommitDelta(base, 1, Set("x"), Map("x" -> "ax"))
        == Right((2, 1)))
      assert(Warehouse.o25CommitDelta(base, 1, Set("y"), Map("y" -> "by"))
        == Right((3, 2)))
      assert(stagedBytes == before, "rebase must not restage")
      // the rebased snapshot carries BOTH writers' entries
      val snap = Warehouse.o25SnapshotOf(base, 3)
      assert(snap.entries == Map("x" -> "ax", "y" -> "by", "z" -> "base"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("an overlapping loser is classified, naming only the conflicting versions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o25s_")
    val base = dir.toString
    try {
      init(base)
      Warehouse.o25Stage(base, "x", "ax", df(Seq(1L -> "A")))
      Warehouse.o25Stage(base, "y", "by", df(Seq(3L -> "C")))
      Warehouse.o25Stage(base, "x", "cx", df(Seq(2L -> "stale")))
      assert(Warehouse.o25CommitDelta(base, 1, Set("x"), Map("x" -> "ax"))
        == Right((2, 1)))
      assert(Warehouse.o25CommitDelta(base, 1, Set("y"), Map("y" -> "by"))
        == Right((3, 2)))
      // v2 touched x (conflict), v3 touched y (not named)
      assert(Warehouse.o25CommitDelta(base, 1, Set("x"), Map("x" -> "cx"))
        == Left(Seq(2)))
      // re-derived against the current snapshot, the commit lands
      assert(Warehouse.o25CommitDelta(base, 3, Set("x"), Map("x" -> "cx"))
        == Right((4, 1)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("a partition-filtered read opens only that partition's files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o25s_")
    val base = dir.toString
    try {
      init(base)
      val read = Warehouse.o25Read(spark, base, 1, Some("y"))
      assert(read.inputFiles.forall(_.contains("p-y-base")),
        s"partition pruning leaked: ${read.inputFiles.toSeq}")
      assert(read.collect().map(_.getLong(0)).toSeq == Seq(3L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("N disjoint writers race for real: all commit, attempts bounded, every entry lands") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o25s_")
    val base = dir.toString
    try {
      val n = 6
      val parts = (0 until n).map(i => s"p$i")
      parts.foreach(p => Warehouse.o25Stage(base, p, "base",
        df(Seq(1L -> "a"))))
      assert(Warehouse.o25Commit(base, 1, parts.toSet,
        parts.map(_ -> "base").toMap))
      // every writer reads v1, stages ONCE, then races the commit —
      // real threads, real CAS contention, disjoint footprints
      parts.foreach(p => Warehouse.o25Stage(base, p, "w",
        df(Seq(2L -> p))))
      val results = new java.util.concurrent.ConcurrentHashMap[
        String, Either[Seq[Int], (Int, Int)]]()
      val threads = parts.map { p =>
        new Thread(() => {
          results.put(p,
            Warehouse.o25CommitDelta(base, 1, Set(p), Map(p -> "w")))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      import scala.jdk.CollectionConverters._
      val rs = results.asScala.toMap
      assert(rs.size == n, s"only ${rs.size} writers finished")
      // all commit (disjoint footprints can never semantically conflict)
      assert(rs.values.forall(_.isRight), s"a disjoint writer failed: $rs")
      val versions = rs.values.collect { case Right((v, _)) => v }.toSeq
      assert(versions.sorted == (2 to n + 1),
        s"versions must be the dense range 2..${n + 1}: $versions")
      // each CAS loss implies someone else committed: attempts ≤ n
      assert(rs.values.collect { case Right((_, a)) => a }.forall(_ <= n))
      // the final snapshot carries EVERY writer's entry — no lost update
      assert(Warehouse.o25SnapshotOf(base, n + 1).entries ==
        parts.map(_ -> "w").toMap)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("manifest delimiters in partition or token are refused at stage time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o25s_")
    try {
      intercept[IllegalArgumentException] {
        Warehouse.o25Stage(dir.toString, "a=b", "t", df(Seq(1L -> "a")))
      }
      intercept[IllegalArgumentException] {
        Warehouse.o25Stage(dir.toString, "p", "t,u", df(Seq(1L -> "a")))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
