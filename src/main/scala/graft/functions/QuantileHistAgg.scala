package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable equi-width histogram sketch (SURVEY §2 K5) — the quantile
  * companion to K2's HLL: `graft_qhist(x, lo, hi, bins)` aggregates a
  * numeric column into `bins` counts over [lo, hi) (out-of-range values
  * clamp into the edge bins), from which any quantile is estimated by
  * linear interpolation inside the crossing bin with error ≤ one bin
  * width.
  *
  * Design choices, deliberately different from KLL/GK:
  *  - the bin of a value is a pure function of the VALUE (no sampling,
  *    no compaction), so the sketch is deterministic and
  *    order/partitioning-independent — the estimate is exactly
  *    reproducible by another engine (see the text_quantile_sketch
  *    DuckDB oracle), which sampling sketches cannot promise;
  *  - merge is element-wise vector addition → commutative, associative,
  *    and map-side combinable (TypedImperativeAggregate gives partial
  *    aggregation for free);
  *  - the buffer is bins × 8 bytes regardless of data volume — at
  *    100 TB the shuffle carries one small array per group per map
  *    task, never the data.
  *
  * Like SimHashAgg this is a single custom aggregate where the pure-SQL
  * formulation would need `bins` separate conditional sums.
  */
case class QuantileHistAgg(child: Expression, lo: Double, hi: Double, bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo, got [$lo, $hi) / $bins")
  private val w = (hi - lo) / bins

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      val b = math.min(bins - 1, math.max(0, math.floor((x - lo) / w).toInt))
      buf(b) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bins) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bins * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "graft_qhist"
}
