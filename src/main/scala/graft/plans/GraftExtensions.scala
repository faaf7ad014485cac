package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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
      (args: Seq[Expression]) => TopKByScore(args(0), args(1), args(2))))

  /** Register graft functions on an existing session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
