package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (SURVEY §3).
  *
  * Spark's higher-order array functions (`aggregate`, `zip_with`) are
  * evaluated INTERPRETED — measurably slow when invoked once per
  * candidate pair. These expressions generate a tight primitive loop
  * via doGenCode (and a matching interpreted eval), so pairwise
  * similarity stays inside whole-stage codegen. Float-array
  * specialized: the `embeddings` column is Array[Float]; arithmetic is
  * double, accumulated in ELEMENT ORDER so results are bit-identical
  * to the sequential aggregate()/list_sum() formulations the DuckDB
  * oracles use.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  /** Element type both array inputs must carry. */
  protected def elementType: DataType
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(et, _) => et == elementType
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<$elementType> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** cosine(a, b) = Σxy / (√Σx² · √Σy²), one pass, element order. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def elementType: DataType = FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) = Σxy, one pass, element order. Inputs may be float or
  * double arrays (double when upstream already normalized). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def elementType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** normalize(a) = a / √Σx² as array<double> — one pass for the norm
  * (element order, matching aggregate()/list_sum() bit-for-bit), one
  * for the division. Replaces the interpreted transform/aggregate
  * lambda formulation in Dedup.normalized (§3 rule: no higher-order
  * array lambdas on driver-query paths). A zero vector divides by
  * zero → NaN elements, identical to the lambda formulation and the
  * SQL oracles' x / sqrt(0). */
case class NormalizeVector(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    // a null ELEMENT propagates to a null result — the semantics of
    // the transform/aggregate lambdas this expression replaced (and of
    // the SQL oracles); reading the slot as 0 would fabricate a finite
    // wrong unit vector
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble; ss += v * v; i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getFloat(i).toDouble / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val ss = ctx.freshName("ss"); val norm = ctx.freshName("norm")
      val out = ctx.freshName("out"); val xv = ctx.freshName("xv")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; break; }
         |  double $xv = (double) $a.getFloat($i);
         |  $ss += $xv * $xv;
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $norm = java.lang.Math.sqrt($ss);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ((double) $a.getFloat($i)) / $norm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorFunctions {

  private[functions] val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine"      -> { es => CosineSimilarity(es(0), es(1)) },
    "graft_dot"         -> { es => DotProduct(es(0), es(1)) },
    "graft_normalize"   -> { es => NormalizeVector(es.head) },
    "graft_jaro_winkler" -> { es => JaroWinkler(es(0), es(1)) },
    "graft_cdc_boundaries" -> { es =>
      CdcBoundaries(es(0), es(1).eval().asInstanceOf[Number].intValue,
        es(2).eval().asInstanceOf[Number].intValue)
    },
    "graft_asof_match" -> { es =>
      if (es.length >= 3)
        graft.plans.AsofMatch(es(0), es(1),
          es(2).eval().asInstanceOf[Number].longValue)
      else graft.plans.AsofMatch(es(0), es(1))
    },
    "graft_simhash_agg" -> { es => SimHashAgg(es.head).toAggregateExpression() },
    "graft_qhist"       -> { es =>
      def num(e: Expression): Double = e.eval().asInstanceOf[Number].doubleValue()
      QuantileHistAgg(es(0), num(es(1)), num(es(2)), num(es(3)).toInt)
        .toAggregateExpression()
    },
    "graft_topk"        -> { es =>
      TopKAgg(es(0), es(1).eval().asInstanceOf[Number].intValue)
        .toAggregateExpression()
    },
    "graft_cms"         -> { es =>
      CountMinAgg(es(0), es(1).eval().asInstanceOf[Number].intValue,
        es(2).eval().asInstanceOf[Number].intValue)
        .toAggregateExpression()
    },
    "graft_theta"       -> { es =>
      if (es.length >= 2)
        ThetaSketchAgg(es(0), es(1).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()
      else ThetaSketchAgg(es(0)).toAggregateExpression()
    },
    "graft_theta_estimate" -> { es => ThetaEstimate(es.head) },
    "graft_theta_intersect" -> { es => ThetaIntersectEstimate(es(0), es(1)) },
    "graft_theta_union_est" -> { es => ThetaUnionEstimate(es(0), es(1)) },
    // Spark's own runtime-filter Bloom sketch, surfaced as a callable
    // pair (the engine keeps them internal-only) — the K22 file index
    // builds on these instead of reimplementing the filter
    "graft_bloom_agg" -> { es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1)).toAggregateExpression()
    },
    "graft_bloom_might_contain" -> { es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))
    },
  )

  /** Idempotently register the graft vector functions on a session
    * (public FunctionRegistry API — usable from any deployment; a
    * SparkSessionExtensions hook would work identically for
    * spark.sql.extensions wiring). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id,
          new ExpressionInfo(classOf[CosineSimilarity].getName, name), builder)
      }
    }
    // graft_asof_match must never be analyzable without the strategy
    // that gives it as-of semantics: a SQL user planning the marker
    // WITHOUT AsofJoinStrategy installed would get a silent multi-match
    // join (the marker degenerates to plain rightTs <= leftTs),
    // violating the operator's loud-error contract — so registering the
    // function installs the strategy too (both idempotent).
    graft.plans.AsofJoin.ensureInstalled(spark)
  }

  /** Codegen'd cosine over two float-array columns. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }

  /** Codegen'd dot product over two double-array columns. */
  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }

  /** Codegen'd unit-normalization of a float-array column (double
    * output; norm accumulated in element order). */
  def normalize(spark: SparkSession, a: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_normalize", a)
  }

  /** Codegen'd Jaro-Winkler similarity over two string columns
    * (DuckDB-parity semantics; see JaroWinklerImpl). */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_jaro_winkler", a, b)
  }

  /** Single-buffer SimHash aggregate over a long-hash column. */
  def simhashAgg(spark: SparkSession, h: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_simhash_agg", h)
  }

  /** Mergeable equi-width histogram sketch of a numeric column:
    * `bins` counts over [lo, hi), clamped at the edges. */
  def qhist(spark: SparkSession, x: Column, lo: Double, hi: Double,
      bins: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_qhist", x, lit(lo), lit(hi), lit(bins))
  }

  /** Mergeable Count-Min frequency sketch of a string column: the
    * flattened depth×width counter matrix (query with
    * CountMin.estimate — always ≥ true count, ≤ true + eN/width
    * w.h.p.). */
  def cms(spark: SparkSession, item: Column, depth: Int, width: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_cms", item, lit(depth), lit(width))
  }

  /** Codegen'd single-pass CDC boundary positions (1-based) of a
    * string column. */
  def cdcBoundaries(spark: SparkSession, text: Column, gram: Int,
      mod: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_cdc_boundaries", text, lit(gram), lit(mod))
  }

  /** Mergeable Misra-Gries heavy-hitters sketch of a string column:
    * map of ≤ k candidate items → estimated counts (est undercounts by
    * at most N/k; every item with freq > N/k is present). */
  def topk(spark: SparkSession, item: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_topk", item, lit(k))
  }

  /** Mergeable theta sketch of a string column (compact bytes) —
    * estimate with graft_theta_estimate; set-operate across sketches
    * with graft_theta_intersect / graft_theta_union_est. */
  def theta(spark: SparkSession, item: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_theta", item)
  }
}

/** Production wiring for `spark.sql.extensions=graft.functions.GraftExtensions`
  * — injects every graft function at session build time, the same
  * registrations `VectorFunctions.ensureRegistered` applies lazily. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorFunctions.registrations.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name), builder))
    }
}
