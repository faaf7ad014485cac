package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Layout maintenance: small-file compaction for partitioned directory
  * layouts (r12 verdict #1 — the production concern of the S9/A1 fan-out
  * family, reference `nba_insights_scraper.py:548-573` /
  * `Cleaning_Glass_#1.py:455-495`: a per-key fan-out at crawl scale
  * produces small-file explosions, and every subsequent scan pays one
  * open/seek per tiny file).
  *
  * Shape: per partition directory, bin-pack the data files to
  * `ceil(bytes / targetBytes)` output files — read the directory once,
  * `coalesce` (never a shuffle: compaction moves bytes, it must not also
  * repartition them), write to a DOT-PREFIXED staging sibling (hidden
  * from Spark/Hive partition discovery, so concurrent readers of the
  * layout never see mixed state), then commit by directory rename —
  * retire the old directory under a hidden name, move the staged one
  * into place, delete the retired copy (the st9 discipline: stage
  * invisibly, commit atomically, clean up after). A crash between the
  * two renames leaves the retired copy on disk under its hidden name for
  * manual recovery; a failed commit rename rolls the retired directory
  * back so the layout is never left headless.
  *
  * Scale shape: the per-directory work is an ordinary distributed
  * read+write job with no shuffle; only the DIRECTORY list is
  * driver-side (bounded by partition-space cardinality, the same bound
  * as s13's probe loop). Directories are independent — a cluster run can
  * compact them concurrently; correctness never depends on ordering.
  */
object Compact {

  /** One partition directory's compaction ledger. `filesAfter ==
    * filesBefore` with `compacted == false` means the directory already
    * met the bin-pack bound and was left untouched (idempotence).
    */
  case class CompactionResult(dir: String, filesBefore: Int,
      bytesBefore: Long, filesAfter: Int, compacted: Boolean)

  /** Visible data files only — `_SUCCESS`, checksums, and dot-prefixed
    * staging/retired directories are layout metadata, never data.
    */
  private def isVisible(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter(st => st.isFile && isVisible(st.getPath.getName))

  /** Bin-pack bound: the fewest files that keep each at or under
    * `targetBytes` (pre-compression sizes — an over-estimate after
    * columnar re-encoding, so the bound stays safe), never less than 1.
    */
  def targetFileCount(bytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compact: targetBytes must be positive, got $targetBytes")
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Leaf partition directories under `base`: every directory that
    * directly holds at least one visible data file. Driver-side walk,
    * bounded by partition-space cardinality.
    */
  def leafDataDirs(fs: FileSystem, base: Path): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir)
      val here =
        if (entries.exists(st => st.isFile && isVisible(st.getPath.getName)))
          Seq(dir)
        else Seq.empty
      here ++ entries
        .filter(st => st.isDirectory && isVisible(st.getPath.getName))
        .flatMap(st => walk(st.getPath))
    }
    walk(base)
  }

  /** Compact one partition directory to the bin-pack bound. No-op (and
    * no write job at all) when the directory already meets it.
    */
  def compactDir(spark: SparkSession, dir: Path, targetBytes: Long,
      format: String = "parquet"): CompactionResult = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(fs, dir)
    val bytes = before.map(_.getLen).sum
    val nOut = targetFileCount(bytes, targetBytes)
    if (before.length <= nOut)
      return CompactionResult(dir.toString, before.length, bytes,
        before.length, compacted = false)

    val token = java.util.UUID.randomUUID().toString.take(8)
    val staged = new Path(dir.getParent, s".${dir.getName}.compact-$token")
    val retired = new Path(dir.getParent, s".${dir.getName}.retired-$token")
    spark.read.format(format).load(dir.toString)
      .coalesce(nOut)
      .write.format(format).save(staged.toString)
    require(fs.rename(dir, retired),
      s"compact: could not retire $dir — layout unchanged")
    if (!fs.rename(staged, dir)) {
      // roll the retired copy back so the layout is never headless
      fs.rename(retired, dir)
      fs.delete(staged, true)
      sys.error(s"compact: commit rename failed for $dir — rolled back")
    }
    fs.delete(retired, true)
    CompactionResult(dir.toString, before.length, bytes,
      dataFiles(fs, dir).length, compacted = true)
  }

  /** Compact every leaf partition directory of a layout. Returns one
    * ledger row per directory, compacted or not, in path order.
    */
  def compactPartitioned(spark: SparkSession, base: String,
      targetBytes: Long, format: String = "parquet"): Seq[CompactionResult] = {
    val basePath = new Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = leafDataDirs(fs, basePath).sortBy(_.toString)
    // Directories are independent (see scaladoc) — overlap their
    // read+write jobs from a small thread pool so one directory's task
    // tail does not idle the cluster between jobs (guide §2.6). A few
    // in flight is enough; results keep path order (Future.sequence).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(4, dirs.size)))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      // Capture each directory's outcome as a Try and await ALL of them
      // before surfacing the first failure: a fail-fast Future.sequence
      // would rethrow while sibling compactions' stage/retire renames
      // are still in flight, racing the caller's error handling — every
      // directory must reach a terminal state (done or rolled back)
      // before control returns.
      val settled = Await.result(
        Future.sequence(dirs.map(dir =>
          Future(compactDir(spark, dir, targetBytes, format))
            .transform(t => scala.util.Success(t)))),
        scala.concurrent.duration.Duration.Inf)
      settled.collectFirst { case scala.util.Failure(e) => e }
        .foreach(throw _)
      settled.map(_.get)
    } finally pool.shutdown()
  }
}
