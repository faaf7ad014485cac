package graft.queries

import graft.SparkSpecBase

/** Pins the e4 BNLJ small-side guard (r12 verdict "what's wrong" #2):
  * within the ceiling the plan is the broadcast nested-loop it is
  * documented to be; over the ceiling the operator fails loudly at
  * plan-build time with a named rewrite, because a contains theta-join
  * has no shuffle fallback.
  */
class ContainsGuardSpec extends SparkSpecBase {

  test("within ceiling: BroadcastNestedLoopJoin, dimension side built") {
    import spark.implicits._
    val pairs = Seq(("customer", "order"), ("stream", "batch"))
      .toDF("kw1", "kw2")
    val df = Enrich.e4ContainsJoinGuarded(spark, sf, pairs,
      Enrich.ContainsJoinCeilingRows)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected a BroadcastNestedLoopJoin in the plan:\n$plan")
    assert(df.count() > 0)
  }

  test("over ceiling: loud plan-build failure naming the rewrite") {
    import spark.implicits._
    val pairs = Seq(("customer", "order"), ("stream", "batch"))
      .toDF("kw1", "kw2")
    val e = intercept[IllegalStateException] {
      Enrich.e4ContainsJoinGuarded(spark, sf, pairs, ceiling = 1L)
    }
    assert(e.getMessage.contains("e4_contains_join"))
    assert(e.getMessage.contains("inverted token index"))
  }
}
