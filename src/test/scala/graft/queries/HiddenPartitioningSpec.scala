package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** a23 — hidden partitioning (Iceberg-style partition transforms).
  * The registered query pins derivation-prunes + scan-confinement on
  * the corpus; this spec pins the transform contract in isolation:
  *
  *  - every written row lands in exactly the directory its transforms
  *    name (the property that makes plan-time derivation SOUND — a
  *    row outside its transform dir would be silently lost to every
  *    pruned read);
  *  - the exclusive upper bound of a ts range excludes the boundary
  *    day (a midnight endpoint must not drag in a whole extra day);
  *  - a bucket-equality probe selects exactly one bucket per day.
  */
class HiddenPartitioningSpec extends SparkSpecBase {

  private def write(dir: String) = {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        s"2024-01-${10 + i % 4} 0${i % 10}:00:00"), (i % 13).toLong)
    }
    val df = rows.toDF("event_id", "ts", "user_id")
    df.withColumn("day", Layout.a23DayOf(col("ts")))
      .withColumn("bucket", Layout.a23BucketOf(col("user_id")))
      .write.partitionBy("day", "bucket").parquet(dir)
    df
  }

  test("every row lands in the directory its transforms name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a23s_")
    try {
      write(s"$dir/t")
      val back = spark.read.parquet(s"$dir/t")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("day"), col("bucket"),
          Layout.a23DayOf(col("ts")).as("eday"),
          Layout.a23BucketOf(col("user_id")).as("ebucket"))
      assert(back.filter(col("day") =!= col("eday") ||
        col("bucket") =!= col("ebucket")).isEmpty,
        "a row was written outside its transform directory")
      assert(back.count() == 200)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("an exclusive midnight upper bound excludes the boundary day") {
    import spark.implicits._
    val d = Seq(("2024-01-10 00:00:00", "2024-01-13 00:00:00"))
      .toDF("lo", "hi")
      .select(
        Layout.a23DayOf(col("lo").cast("timestamp")).cast("string").as("dlo"),
        Layout.a23DayOf(col("hi").cast("timestamp") -
          expr("INTERVAL 1 MICROSECOND")).cast("string").as("dhi"))
      .head()
    assert(d.getString(0) == "2024-01-10" && d.getString(1) == "2024-01-12")
  }

  test("a user-equality probe selects one bucket per matching day") {
    val dir = java.nio.file.Files.createTempDirectory("graft_a23s_")
    try {
      write(s"$dir/t")
      import spark.implicits._
      val bucket = Seq(5L).toDF("u")
        .select(Layout.a23BucketOf(col("u"))).head().getLong(0)
      val dayDirs = new java.io.File(s"$dir/t").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("day="))
      assert(dayDirs.length == 4)
      val selDirs = dayDirs.flatMap(_.listFiles().filter(b =>
        b.isDirectory && b.getName == s"bucket=$bucket")).map(_.toString)
      // at most one bucket dir per day opens for the probe...
      assert(selDirs.length <= dayDirs.length)
      // ...and reading ONLY them finds every one of user 5's rows — a
      // row elsewhere would be silently lost to the pruned read
      val full = spark.read.option("basePath", s"$dir/t").parquet(s"$dir/t")
        .filter(col("user_id") === 5L).count()
      val pruned = spark.read.option("basePath", s"$dir/t")
        .parquet(selDirs: _*).filter(col("user_id") === 5L).count()
      assert(full > 0 && pruned == full,
        s"pruned read found $pruned of $full rows for the probed user")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
