package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** a21 — manifest-level min/max pruning. The registered query pins that
  * pruning ENGAGED and the oracle pins losslessness; this spec pins the
  * two mechanism claims underneath: the collected stats are TIGHT (each
  * file's manifest envelope equals its actual min/max), and pruning is
  * SAFE (every file the manifest drops truly contains no in-range row —
  * checked by scanning the complement).
  */
class ManifestStatsPruneSpec extends SparkSpecBase {

  test("stats are tight and pruned-away files hold no in-range rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a21s_")
    val path = s"$dir/by_id"
    try {
      graft.Tables.events(spark, sf)
        .select(col("event_id"), col("event_type"))
        .repartitionByRange(8, col("event_id"))
        .sortWithinPartitions("event_id")
        .write.parquet(path)
      val stats = Layout.a21StatsOf(spark, path, "event_id")
      assert(stats.size > 1)
      // tightness: per-file envelope == the file's actual min/max
      stats.foreach { case (f, lo, hi) =>
        val r = spark.read.parquet(f)
          .agg(min("event_id"), max("event_id")).head()
        assert(r.getLong(0) == lo && r.getLong(1) == hi,
          s"manifest stats for $f are not tight")
      }
      // disjoint range clustering: envelopes must not overlap (the
      // layout property pruning effectiveness rests on)
      val sorted = stats.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, hi1), (_, lo2, _)) =>
          assert(hi1 < lo2, "range-clustered files must be disjoint")
        case _ =>
      }
      val maxId = stats.map(_._3).max
      val (lo, hi) = (maxId / 4, maxId / 2)
      val selected = stats.filter { case (_, flo, fhi) =>
        fhi >= lo && flo <= hi }.map(_._1).toSet
      assert(selected.nonEmpty && selected.size < stats.size)
      // safety: the complement contains NOTHING in range
      val dropped = stats.map(_._1).filterNot(selected)
      val leaked = spark.read.parquet(dropped: _*)
        .filter(col("event_id") >= lo && col("event_id") <= hi).count()
      assert(leaked == 0,
        s"manifest pruning dropped files holding $leaked in-range rows")
      // losslessness the cheap way: pruned ∪ residual == full filter
      val (pruned, _) = Layout.a21PrunedRead(spark, stats, lo, hi)
      assert(pruned.filter(col("event_id").between(lo, hi)).count() ==
        spark.read.parquet(path)
          .filter(col("event_id").between(lo, hi)).count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
