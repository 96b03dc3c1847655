package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable theta sketch (SURVEY §2 K16) — the distinct-counting
  * sketch that, unlike HLL (K2/I22), supports SET OPERATIONS:
  * `graft_theta(x)` aggregates a compact theta sketch per group, and
  * the scalar companions estimate |A∩B| / |A∪B| from two sketch
  * columns — the cross-source overlap question ("how much of corpus
  * B is already in A?") that drives dedup planning and mixture
  * design, answered without ever joining the raw values.
  *
  * Scale shape: the buffer holds ≤ 2^lgK 8-byte hashes regardless of
  * input volume (sampling mode keeps the k SMALLEST hashes — a
  * deterministic function of the value SET, so estimates are
  * order-independent and run-stable, the property the driver oracle's
  * accuracy flag relies on). Map-side combine ships compact sketches,
  * never values. Below 2^lgK distinct values the sketch is in exact
  * mode and every estimate is exact — the sf-scale correctness face —
  * while at 100 TB sampling engages and the same plan degrades to
  * ±~1/√k relative error.
  *
  * The scalar set-op expressions evaluate interpreted (CodegenFallback)
  * BY DESIGN: they run on post-aggregation frames (one row per group
  * pair), never on the per-row hot path §3's no-interpreted rule
  * protects.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** |sketch| estimate from compact theta bytes. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"
  override protected def nullSafeEval(b: Any): Any =
    CompactSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** |A ∩ B| estimate from two compact theta sketch columns. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(CompactSketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(CompactSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** |A ∪ B| estimate from two compact theta sketch columns. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_union_est"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    u.union(CompactSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
