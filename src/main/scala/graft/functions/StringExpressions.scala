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
