package graft.validate

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Fail-fast completeness validation (SURVEY A8/A9, §5.1): the
  * "never trust partial data" contracts of the reference
  * (`DEFENSEVSPOSTION.PY:524-541,575-598`) as anti-join reports.
  *
  * Every check returns the violation set as a DataFrame (empty = pass) so
  * callers can persist reports; `require*` variants throw on violation.
  * Anti-joins are broadcast when the expected dimension is bounded.
  */
object Validate {

  final class ValidationException(msg: String) extends RuntimeException(msg)

  /** Expected keys with no match in `actual` (SURVEY A8 "missing teams"):
    * left-anti from the expected dimension. */
  def missingKeys(expected: DataFrame, actual: DataFrame,
      expectedKey: String, actualKey: String): DataFrame =
    expected.join(actual,
      expected(expectedKey) === actual(actualKey), "left_anti")

  /** Observed keys outside the expected dimension (unrecognized names). */
  def unexpectedKeys(expected: DataFrame, actual: DataFrame,
      expectedKey: String, actualKey: String): DataFrame =
    actual.select(actualKey).distinct()
      .join(broadcast(expected),
        actual(actualKey) === expected(expectedKey), "left_anti")

  /** Per-group distinct-count contract: groups whose distinct `keyCol`
    * count differs from `expected` (SURVEY A8: "exactly 30 teams per
    * (position, timeframe)"). */
  def groupsWithWrongDistinctCount(df: DataFrame, groupCols: Seq[String],
      keyCol: String, expected: Long): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(keyCol)).as("n_distinct"))
      .filter(col("n_distinct") =!= expected)

  /** Completeness grid (SURVEY A9): expected dimension cross product
    * anti-joined with observed combinations — rows are the empty cells.
    */
  def emptyGridCells(dims: Seq[DataFrame], observed: DataFrame,
      joinCols: Seq[String]): DataFrame = {
    val grid = dims.reduce(_.crossJoin(_))
    grid.join(observed.select(joinCols.map(col): _*).distinct(),
      joinCols, "left_anti")
  }

  /** Throw unless `violations` is empty; message carries a bounded sample. */
  def requireEmpty(violations: DataFrame, what: String): Unit = {
    val sample = violations.limit(5).collect()
    if (sample.nonEmpty) {
      val n = violations.count()
      throw new ValidationException(
        s"$what: $n violation(s), e.g. ${sample.mkString("; ")}")
    }
  }
}
