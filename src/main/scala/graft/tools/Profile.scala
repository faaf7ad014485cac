package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named `SparkEntry.queries` repeatedly and
  * optionally dump the formatted physical plan.
  *
  * Usage: `runMain graft.tools.Profile <sfDir> <reps> <name>[,<name>...]`
  * (reps 0 → just print the plan). Not part of the driver contract —
  * local iteration tooling only, like [[DumpPlans]].
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect() // warmup
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (reps == 0) fn(spark, sfDir).explain("formatted")
      else (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"PROFILE $name rep=$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
