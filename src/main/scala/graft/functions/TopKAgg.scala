package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch (SURVEY §2 K9) — Misra-Gries with k
  * counters: `graft_topk(item, k)` returns a map of at most k candidate
  * items to estimated counts. The classic guarantees (and what the
  * SketchSpec pins):
  *  - any item with true frequency > N/k is PRESENT in the summary;
  *  - every estimate undercounts by at most N/k (est ∈ [true − N/k,
  *    true]).
  * Merge is the Agarwal et al. "Mergeable Summaries" combine: add the
  * counter maps, then subtract the (k+1)-th largest count from all and
  * drop non-positive — associative within the error bound, map-side
  * combinable (TypedImperativeAggregate), and the buffer is ≤ k
  * entries regardless of data volume: at 100 TB the shuffle carries k
  * counters per group per map task, never the items. The frequent-item
  * question exact top-k answers with a full shuffle+sort, answered in
  * one pass — the HLL/qhist pattern (K2/K5) for heavy hitters.
  *
  * Like those sketches the surviving COUNTER SET near the N/k boundary
  * depends on merge order, so this is test-pinned by its guarantees
  * rather than DuckDB-oracled (an exact-answer oracle cannot mirror an
  * order-dependent summary).
  */
case class TopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"need k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all: the Misra-Gries step that buys the N/k bound
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (kk, c) =>
            if (c <= 1) dead += kk else buf.update(kk, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (kk, c) =>
        if (c - cut <= 0) dead += kk else a.update(kk, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toSeq
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1)).toArray,
      entries.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toSeq.map { case (kk, c) => (kk.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.size)
    items.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "graft_topk"
}
