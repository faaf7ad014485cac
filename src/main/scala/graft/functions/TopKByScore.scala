package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `graft_topk(score, id, k)` →
  * `array<struct<score double, id bigint>>`, the k best rows per group
  * under the total order (score DESC, id ASC), best first.
  *
  * WHY an aggregate and not a window: the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`)
  * shuffles and sorts EVERY candidate row per group before discarding
  * all but k. This aggregate keeps a bounded buffer per group on the map
  * side (ObjectHashAggregate partial), so only ~k rows per group per
  * partition cross the wire — at brute-force ANN scale (n candidates ×
  * q queries) the shuffle shrinks from n×q rows to partitions×q×k.
  *
  * Determinism contract: the comparator is total (exact double compare
  * descending — NaN sorts first, matching Spark's `desc` NaN semantics —
  * then id ascending), so the result multiset is independent of row
  * arrival order and partitioning. The buffer is compacted whenever it
  * exceeds 4k entries: amortized O(log k) per row, max memory O(k).
  *
  * NULL contract — where this deliberately DIFFERS from the window
  * formulation: null score or id rows are SKIPPED, like builtin
  * aggregates, whereas `row_number() OVER (ORDER BY score DESC)` ranks
  * null scores last and still emits them. The two formulations are
  * bit-identical exactly when every group has ≥ k non-null-score rows
  * wanted in the result — true for the s1/s4 feeds, where a null cosine
  * means a corrupt vector that must NOT be returned as a "neighbor";
  * the aggregate's skip semantics are the intended ones there.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be double, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be bigint, got ${id.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be an int literal")
    else if (kExpr.eval(InternalRow.empty) == null ||
        kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  // (score DESC, id ASC). `+ 0.0` normalizes -0.0 to +0.0 before the
  // compare: Spark's sort keys go through NormalizeFloatingNumbers, so
  // the window formulation treats signed zeros as equal ties (broken by
  // id) — Double.compare alone would rank +0.0 above -0.0 and diverge at
  // the k boundary. NaN (unaffected by + 0.0) still sorts first, matching
  // desc order.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1 + 0.0, a._1 + 0.0)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val top = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= top
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length > 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length > 4 * k) compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sorted(ord).take(k)
    new GenericArrayData(top.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) {
      buf += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
