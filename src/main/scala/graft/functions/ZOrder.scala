package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key (SURVEY §2 K11) — interleave the
  * bits of two dimensions so that sorting by the key co-locates rows
  * that are close in BOTH dimensions. The point is storage layout at
  * scale: parquet keeps min/max stats per row group, and a 2D box
  * predicate prunes row groups only if the file order correlates with
  * both columns — a linear sort gives one tight column and one useless
  * stat, a z-order sort gives two reasonably tight ones (the layout
  * behind Delta/Iceberg OPTIMIZE ZORDER). PushdownSpec proves the
  * claim: same data, same pushed filters, fewer rows surviving the
  * row-group cut under the z-order layout.
  *
  * Built from plain Column arithmetic (shift/xor/and — whole-stage
  * codegen'd, no UDF) using the classic magic-number bit spread; 16
  * bits per dimension → a 32-bit key, plenty for file-layout buckets
  * (keys order ROW GROUPS, they don't need to be unique per row).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value: ...b2 b1 b0 → ...0 b2 0 b1 0 b0. */
  private def spread16(x: Column): Column = {
    var v = x.cast("long").bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseXOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseXOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseXOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseXOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** Morton key of two non-negative dimensions, each clamped to 16
    * bits (callers bucket/scale wider domains down first — layout
    * keys need rank correlation, not exactness). `a` takes the even
    * bits, `b` the odd. */
  def zOrderKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
