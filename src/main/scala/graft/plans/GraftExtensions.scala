package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, NumericType, ShortType}
import graft.functions.{DotProduct, ParsePropLine, TopKByScore}

/** Session extensions registering graft's native Catalyst expressions.
  *
  * Two entry points, same registrations:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the clean path for spark-submit / cluster deployment);
  *  - [[GraftExtensions.ensureRegistered]] for sessions the library does
  *    not construct (the driver hands us an arbitrary session) —
  *    idempotent per session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_parse_prop_line",
      new ExpressionInfo(classOf[ParsePropLine].getName, "graft_parse_prop_line"),
      (args: Seq[Expression]) => ParsePropLine(args(0))),
    ("graft_topk",
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKByScore(
        widenScore(args(0)), widen(args(1), LongType),
        widen(args(2), IntegerType))))

  /** Numeric widening at the builder (r3 advice): `ImplicitCastInputTypes`
    * is `private[sql]` and unavailable to library expressions, so natural
    * calls like `graft_topk(float_score, int_id, 5)` are widened here.
    * Only genuine widenings (`Cast.canUpCast`) are inserted — a Double id
    * or a fractional k would be silently truncated by a narrowing Cast, so
    * those fall through unchanged to the expression's own strict type
    * check, whose error message names the expected types (r4 advice).
    */
  private def widen(e: Expression, to: DataType): Expression =
    if (!e.resolved) e // dataType would throw; strict check still applies
    else e.dataType match {
      case n: NumericType if n != to && Cast.canUpCast(n, to) => Cast(e, to)
      case _ => e
    }

  /** Score-argument widening: on top of [[widen]]'s lossless casts, any
    * integral score (incl. LONG, which `Cast.canUpCast` rejects for
    * double) is widened — a score is an ordering key, and long→double
    * never truncates toward a wrong integral value; it can only collapse
    * sub-ULP distinctions between scores beyond 2^53, where ordering
    * among near-equal values is already tie-like. The id and k arguments
    * keep the strict rule: there a narrowing silently corrupts VALUES,
    * not just tie order (r5 advice — long scores previously fell through
    * to the strict type error).
    */
  private def widenScore(e: Expression): Expression =
    if (!e.resolved) e
    else e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => Cast(e, DoubleType)
      case _ => widen(e, DoubleType)
    }

  /** Register graft functions on an existing session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
