package graft.queries

import graft.SparkSpecBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the a16 z-order proof: on the octant-clustered layout, range
  * predicates on EITHER interleaved dimension (user_id, ts) skip files,
  * while the linear ts-sorted layout (a14's) serves only ts — its
  * user-slice scan reads the whole corpus. Also pins the hazard found
  * en route: with ts kept as TIMESTAMP_NTZ, the range predicate is
  * listed in PushedFilters but row-group skipping silently does not
  * happen (stats present, scan reads 100%) — the layout writer must
  * normalize to TIMESTAMP (LTZ) micros or the clustering is decorative.
  */
class ZorderPruneSpec extends SparkSpecBase {

  private lazy val (maxUser, maxDay) = Layout.zDomain(spark, sf)
  private lazy val (uLo, uHi) = Layout.zUserBounds(maxUser)

  private def userSlice(df: DataFrame): DataFrame =
    df.filter(col("user_id") >= uLo && col("user_id") < uHi)

  private def tsSlice(df: DataFrame): DataFrame =
    df.filter(col("ts") >= lit(Layout.PruneLo).cast("timestamp") &&
      col("ts") < lit(Layout.PruneHi).cast("timestamp"))

  test("z-order layout prunes on both dimensions; linear sort only on its own") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_zspec_" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Layout.writeZorderLayout(spark, sf, s"$base/zorder", maxUser, maxDay)
      Layout.writeSortedLayout(spark, sf, s"$base/sorted")
      val z = spark.read.parquet(s"$base/zorder")
      val linear = spark.read.parquet(s"$base/sorted")
      val total = z.count()
      val userMatch = userSlice(z).count()
      val tsMatch = tsSlice(z).count()
      assert(userMatch > 0 && userMatch < total / 4)
      assert(tsMatch > 0 && tsMatch < total / 4)

      // octant boxes: a user quarter-band slice reads ≤ half the corpus
      // (2 octants + boundary spill), a ts half-band slice ≤ 3/4
      val zUserScan = ScanMetrics.scanOutputRows(userSlice(z))
      val zTsScan = ScanMetrics.scanOutputRows(tsSlice(z))
      assert(zUserScan >= userMatch && zUserScan <= total / 2,
        s"z-order user slice scanned $zUserScan of $total - no pruning")
      assert(zTsScan >= tsMatch && zTsScan <= (3 * total) / 4,
        s"z-order ts slice scanned $zTsScan of $total - no pruning")

      // the linear layout cannot serve the non-sorted dimension: every
      // file's user envelope spans the whole domain
      val linearUserScan = ScanMetrics.scanOutputRows(userSlice(linear))
      assert(linearUserScan == total,
        s"ts-sorted layout should scan everything on a user slice: " +
          s"$linearUserScan vs $total")

      // pruning loses nothing: identical result sets across layouts
      val a = userSlice(z).select("event_id").orderBy("event_id").collect().toSeq
      val b = userSlice(linear).select("event_id").orderBy("event_id").collect().toSeq
      assert(a == b)
    } finally fs.delete(new Path(base), true)
  }

  test("NTZ hazard: pushed ts filter over timestamp_ntz performs no row-group skipping") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_zntz_" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // the SAME octant layout, but ts written as TIMESTAMP_NTZ
      graft.Tables.events(spark, sf)
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"), col("value"))
        .withColumn("z", Layout.zValue(col("user_id"), col("ts"), maxUser, maxDay))
        .withColumn("zoct", shiftright(col("z"), 13).bitwiseAND(lit(7)))
        .repartition(8, col("zoct")).sortWithinPartitions("z").drop("z")
        .write.partitionBy("zoct").parquet(s"$base/ntz")
      val ntz = spark.read.parquet(s"$base/ntz")
      val total = ntz.count()
      val slice = ntz.filter(
        col("ts") >= lit(Layout.PruneLo).cast("timestamp_ntz") &&
          col("ts") < lit(Layout.PruneHi).cast("timestamp_ntz"))
      // the filter IS pushed...
      assert(slice.queryExecution.executedPlan.toString
        .contains("GreaterThanOrEqual(ts"))
      // ...and yet nothing is skipped (if a Spark upgrade fixes this,
      // the assertion flags it so the writer's LTZ normalization note
      // can be retired)
      val scanned = ScanMetrics.scanOutputRows(slice)
      assert(scanned == total,
        s"NTZ row-group skipping now works ($scanned of $total) - " +
          "revisit the a16 writer's LTZ normalization rationale")
    } finally fs.delete(new Path(base), true)
  }
}
