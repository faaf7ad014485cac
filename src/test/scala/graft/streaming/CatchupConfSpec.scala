package graft.streaming

import graft.SparkSpecBase

/** The bounded-partition scope's restore contract: a leak here would
  * silently run every LATER batch query in the session at 8 shuffle
  * partitions — a 4× parallelism loss that no correctness gate would
  * catch (results are partition-count-invariant by design).
  */
class CatchupConfSpec extends SparkSpecBase {

  test("restores the session's shuffle partitions on success AND on failure") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val inside = CatchupConf.withBoundedStatePartitions(spark) {
      spark.conf.get(key)
    }
    assert(inside == CatchupConf.boundedStatePartitions.toString)
    assert(spark.conf.get(key) == before)
    intercept[RuntimeException] {
      CatchupConf.withBoundedStatePartitions(spark) {
        throw new RuntimeException("mid-stream failure")
      }
    }
    assert(spark.conf.get(key) == before,
      "a failing catch-up run leaked the bounded partition setting")
  }

  test("nested scopes restore outward in order") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    CatchupConf.withBoundedStatePartitions(spark, 4) {
      assert(spark.conf.get(key) == "4")
      CatchupConf.withBoundedStatePartitions(spark, 2) {
        assert(spark.conf.get(key) == "2")
      }
      assert(spark.conf.get(key) == "4")
    }
    assert(spark.conf.get(key) == before)
  }
}
