package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector dot product: `graft_dot(a, b)` over float or
  * double arrays (each side independently — centroid tables are
  * double-valued means while embeddings are floats).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * composition on the similarity hot path: HOFs are CodegenFallback in
  * Spark (interpreted row-at-a-time, materializing an intermediate array
  * per pair), which made the all-pairs cosine queries ~10× slower than
  * the same loop in generated code. This expression participates in
  * whole-stage codegen: a tight primitive loop over the two
  * `ArrayData`, no allocation.
  *
  * Numerics contract: strict sequential left-to-right accumulation of
  * `(double) a[i] * (double) b[i]`, bit-identical to the HOF fold it
  * replaces and to the DuckDB oracle's `list_reduce` rendering — cosine =
  * `graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b)))`
  * reproduces exactly. A double element passes through unwidened, so
  * the double-array path is the same arithmetic `dotHof` performs after
  * its elementwise cast.
  *
  * Null contract (same as the HOF composition): NULL if either input is
  * NULL, if the lengths differ (`zip_with` pads the short side with
  * nulls → null products → null fold), or if any element is NULL. The
  * function is registered session-wide, so it must not return a
  * plausible-but-truncated sum on ragged input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // Result can be NULL even for non-null inputs (ragged lengths / null
  // elements), so nullability is unconditional.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val ld = isDouble(left)
    val rd = isDouble(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      def get(arr: String, side: Expression) =
        if (isDouble(side)) s"$arr.getDouble($i)"
        else s"((double) $arr.getFloat($i))"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $sum += ${get(a, left)} * ${get(b, right)};
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
