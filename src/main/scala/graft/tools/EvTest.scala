package graft.tools
import org.apache.spark.sql.SparkSession
object EvTest {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").appName("evtest")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    println("SCHEMA1 " + df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    // and now flip it off at runtime to see if runtime set matters at all
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df2 = s.read.parquet("/root/testdata/sf0.001/events.parquet")
    println("SCHEMA2 " + df2.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    s.stop()
  }
}
