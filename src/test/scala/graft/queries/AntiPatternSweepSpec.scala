package graft.queries

import graft.{SparkSpecBase, SparkEntry}
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.{Cross, InnerLike}

/** The round-audit "no scale-killers" claim as a CI contract: every
  * registered query's optimized logical plan is swept for the two
  * patterns that silently stop scaling long before they stop working —
  *
  *  - a WINDOW WITH NO PARTITION SPEC (global order): the whole input
  *    flows through one task; correct at sf0.01, dead at 100 TB;
  *  - a CONDITION-LESS INNER/CROSS JOIN whose build side is not one of
  *    the audited bounded relations: O(n·m) output.
  *
  * The cross-join allowlist is the audited set from the round reviews —
  * every entry is a broadcast of a bounded relation (1-row metadata
  * envelopes, a ≤k centroid/dim table, the A9 expected-grid dimension
  * pair) and each is asserted to STAY small by its own spec/oracle row.
  * A new query that introduces either pattern fails here with its name,
  * not in a cluster postmortem.
  *
  * Logical (not executed) plans: AQE wraps physical subtrees in
  * AdaptiveSparkPlanExec, which hides children from collect; the
  * optimized logical plan is fully traversable and is where both
  * patterns are decided anyway.
  */
class AntiPatternSweepSpec extends SparkSpecBase {

  /** Queries with an AUDITED bounded cross join (see scaladoc). */
  private val boundedCrossJoins = Set(
    "s12_csv_to_json",        // 1-row _meta envelope, broadcast
    "s9_partitioned_roundtrip", // 1-row meta count, broadcast
    "s7_ann_recall",          // 1-row recall denominator, broadcast
    "s4_ivf_topk",            // bounded centroid/dim relation
    "a9_completeness_grid")   // expected-grid dim × dim (SURVEY A9)

  test("no registered query plans a global-order window or unbounded cross join") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.optimizedPlan
        catch { case e: Throwable =>
          failures += s"$name: failed to plan (${e.getMessage})"
          null
        }
      if (plan != null) {
        val globalWindows = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (globalWindows.nonEmpty)
          failures += s"$name: window with empty partitionSpec (global order)"
        val bareCross = plan.collect {
          case j: Join if j.condition.isEmpty &&
            (j.joinType == Cross || j.joinType.isInstanceOf[InnerLike]) => j
        }
        if (bareCross.nonEmpty && !boundedCrossJoins(name))
          failures += s"$name: condition-less inner/cross join outside the audited set"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
