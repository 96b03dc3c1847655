package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared row-hash for the Count-Min sketch: bucket of `item` in hash
  * row `row` is md5("row|item") taken as a u31 mod width — the
  * engine-portable md5-seed convention (SURVEY §3) applied to sketch
  * hashing, so a sketch built here can be re-derived or queried by any
  * engine that can md5. */
object CountMin {
  def bucket(row: Int, item: String, width: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$row|$item".getBytes("UTF-8"))
    val h = ((d(0) & 0x7f) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    h % width
  }

  /** Point-frequency estimate from a flattened depth×width sketch:
    * min over rows of the item's bucket counter. */
  def estimate(sketch: Seq[Long], depth: Int, width: Int, item: String): Long =
    (0 until depth).map(r => sketch(r * width + bucket(r, item, width))).min
}

/** Mergeable Count-Min frequency sketch (SURVEY §2 K13) —
  * `graft_cms(item, depth, width)` returns the flattened depth×width
  * counter matrix. The guarantees (Cormode & Muthukrishnan 2005, and
  * what SketchSpec pins):
  *  - estimate(x) ≥ true_count(x) ALWAYS (counters only ever add);
  *  - estimate(x) ≤ true_count(x) + εN with probability 1−δ over the
  *    hash rows (ε = e/width, δ = e^−depth) — the OVERcount dual of
  *    K9's undercounting Misra-Gries, which is why the two ship
  *    together: MG finds the candidates, CMS answers point queries
  *    about anything.
  * Merge is element-wise vector addition — fully associative and
  * map-side combinable; the buffer is depth·width longs per group at
  * ANY data volume (the K2/K5/K9 store-and-merge shape: at 100 TB the
  * shuffle carries the matrix, never the items). Estimates depend only
  * on the final counters, so — unlike MG's boundary-dependent counter
  * SET — the whole sketch is a deterministic, merge-order-INDEPENDENT
  * function of the input multiset: SketchSpec pins exact counter
  * values against an independent recomputation.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, s"need depth/width > 0, got $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(r, item, width)) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "graft_cms"
}
