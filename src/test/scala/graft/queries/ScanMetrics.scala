package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared scan-metric probe for the layout-pruning specs: rows the leaf
  * file scans actually emitted for `df`'s last run — row groups and
  * partitions skipped via footer stats / partition filters never reach
  * this count.
  */
object ScanMetrics {

  private def strip(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
    case q: QueryStageExec => Seq(q) ++ strip(q.plan)
    case other =>
      Seq(other) ++ other.children.flatMap(strip) ++
        other.subqueries.flatMap(strip)
  }

  /** Executes `df` and sums `numOutputRows` across every file scan in
    * the executed plan (including scans inside adaptive query stages and
    * subqueries). `pathFilter` restricts to scans whose root paths match
    * (e.g. to isolate the fact side of a join from its dimension).
    */
  def scanOutputRows(df: DataFrame, pathFilter: String => Boolean = _ => true): Long = {
    df.collect()
    val scans = strip(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(p => pathFilter(p.toString)) => f
    }
    assert(scans.nonEmpty, "no matching FileSourceScan in executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  /** `numOutputRows` summed over every `FilterExec` in an ALREADY
    * EXECUTED plan whose condition string matches `condFilter` (e.g. the
    * injected `might_contain` Bloom probe). Does not re-execute. */
  def filterOutputRows(df: DataFrame, condFilter: String => Boolean): Long = {
    val filters = strip(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if condFilter(f.condition.toString) => f
    }
    assert(filters.nonEmpty, "no matching FilterExec in executed plan")
    filters.map(_.metrics("numOutputRows").value).sum
  }

  /** An arbitrary file-scan metric (e.g. `numFiles` for partition-prune
    * pins) summed over the matching scans of an ALREADY EXECUTED plan. */
  def executedScanMetric(df: DataFrame, pathFilter: String => Boolean,
      metric: String): Long = {
    val scans = strip(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(p => pathFilter(p.toString)) => f
    }
    assert(scans.nonEmpty, "no matching FileSourceScan in executed plan")
    scans.map(_.metrics(metric).value).sum
  }

  /** Leaf file-scan `numOutputRows` of an ALREADY EXECUTED plan (no
    * re-execution), path-restricted like [[scanOutputRows]]. */
  def executedScanRows(df: DataFrame, pathFilter: String => Boolean): Long = {
    val scans = strip(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(p => pathFilter(p.toString)) => f
    }
    assert(scans.nonEmpty, "no matching FileSourceScan in executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }
}
