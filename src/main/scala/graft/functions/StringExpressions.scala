package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro-Winkler kernel, callable from generated code (the
  * pattern Spark's own string expressions use: codegen emits one
  * static call, the loop body stays a tight primitive Java method —
  * no per-row closure, no interpreted fallback).
  *
  * Semantics are pinned to the published definition (Winkler 1990)
  * with the parameterization DuckDB's `jaro_winkler_similarity`
  * exposes, so the result is oracle-checkable cross-engine:
  * matching window = max(len)/2 - 1; transpositions = mismatched
  * matched-pairs / 2 (integer); prefix bonus l·0.1·(1−jaro) with
  * l ≤ 4 applied ONLY when jaro > 0.7 (probed: 'abcdxxxxxx' vs
  * 'abcdyyyyyy' stays 0.6); both-empty and one-empty return 0.0,
  * not 1.0. Float association order mirrors the reference
  * implementation (m/la + m/lb + (m−t)/m, then /3) so doubles are
  * bit-identical. Operates on UTF-8 BYTES — identical to DuckDB,
  * which matches on the raw byte sequence; for the ASCII name data
  * this engine resolves, bytes and code points coincide. */
object JaroWinklerImpl {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val sf = new Array[Boolean](la)
    val tf = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tf(j) && s(i) == t(j)) {
          sf(i) = true; tf(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched matched-pairs, walked in flag order on both sides
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sf(i)) {
        while (!tf(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val th = trans / 2
    var sim = m.toDouble / la
    sim += m.toDouble / lb
    sim += (m.toDouble - th.toDouble) / m.toDouble
    sim /= 3.0
    if (sim > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && s(l) == t(l)) l += 1
      sim += l.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** jaro_winkler(a, b) over two string columns — the string-similarity
  * kernel Spark's function library lacks (it has levenshtein but no
  * Jaro family), used by the B13 entity-resolution verify stage as a
  * second similarity signal alongside gram Jaccard: JW weights the
  * PREFIX agreement that name variants ("P. Picasso") preserve and
  * gram Jaccard dilutes. One static call inside whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static content-defined-chunking kernel: ONE pass over the UTF-8
  * bytes emits every chunk-boundary position (1-based code-point
  * index), replacing the G18 plan that exploded a row per CHARACTER
  * and reassembled grams through a per-doc window sort (21 MB
  * shuffled + a window per doc at sf0.1; at 100 TB the per-char row
  * explosion is the dominant cost of the whole query). Semantics are
  * pinned to the DuckDB oracle expression: position i (1-based,
  * i ≤ len − gram + 1) is a boundary iff i = 1 or the u16 of the
  * first two MD5 bytes of the gram's UTF-8 bytes ≡ 0 (mod `mod`) —
  * the md5 gram hash is the engine-portable convention (§3), and the
  * kernel digests the byte SLICE directly (no per-position substring
  * or hex-string allocation). Code-point offsets are walked once, so
  * non-ASCII text gets the same character arithmetic substr uses. */
object CdcBoundariesImpl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def boundaries(s: UTF8String, gram: Int, mod: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Int])
    // code-point → byte-offset table (one pass; off(n) = total bytes)
    val off = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (i < n) {
      off(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    off(n) = bytes.length
    val digest = md.get()
    var out = new Array[Int](8)
    var m = 0
    def push(v: Int): Unit = {
      if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
      out(m) = v; m += 1
    }
    push(1)
    val last = math.max(n - gram + 1, 1)
    var p = 2 // 1-based candidate position
    while (p <= last) {
      val st = off(p - 1)
      digest.update(bytes, st, off(p - 1 + gram) - st)
      val h = digest.digest()
      if ((((h(0) & 0xff) << 8) | (h(1) & 0xff)) % mod == 0) push(p)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, m))
  }
}

/** graft_cdc_boundaries(text, gram, mod) → array<int> of 1-based
  * chunk-start positions — the whole G18 boundary-detection phase as
  * one codegen'd static call; downstream chunk extents come from
  * element_at over the SAME array, so no window, no per-char rows,
  * no shuffle before the final per-doc aggregate. */
case class CdcBoundaries(child: Expression, gram: Int, mod: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(gram > 0 && mod > 0, s"need gram > 0 and mod > 0, got $gram, $mod")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(s: Any): Any =
    CdcBoundariesImpl.boundaries(s.asInstanceOf[UTF8String], gram, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcBoundariesImpl.boundaries($c, $gram, $mod)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
