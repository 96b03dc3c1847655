package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryExpression, EqualTo, Expression, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** The as-of join as a WHOLE-OPERATOR physical plan (SURVEY §2 K15) —
  * the (c) rung of the custom-operator ladder: a marker condition in
  * an ordinary left-outer join, a SparkStrategy that recognizes it,
  * and a sorted-merge SparkPlan, installed through the PUBLIC
  * `spark.experimental.extraStrategies` hook.
  *
  * Why a custom operator at all: the composed formulation (I7
  * `EventOps.asOfJoin`) unions both sides into one frame and runs a
  * running-`last` window over it — correct, one shuffle, but the
  * window sorts |L|+|R| rows in ONE pass per key and carries every
  * left column through the union frame. The merge exec shuffles each
  * side on its own key, sorts each side independently (AQE-sized,
  * spillable), and then streams both sorted iterators in one O(|L|+|R|)
  * forward pass per partition holding exactly ONE buffered right row —
  * the textbook as-of merge (kdb/QuestDB/Flink temporal join shape).
  * At 100 TB the union frame never materializes and the right side's
  * value columns never ride through a window buffer.
  *
  * Semantics (pinned to I7): for each left row, the LATEST right row
  * of the same key with right.ts <= left.ts, right columns null when
  * no such row exists. The right side must be unique per (key, ts)
  * for deterministic output — callers dedup first (I7's max-id rule).
  * Null keys or timestamps on the right never match; on the left they
  * emit null-matched rows. Plannable space (r11): composite equi-keys
  * of int/long/string/date (keys ride an UnsafeProjection and compare
  * through the same natural ascending ordering the children sort by),
  * timestamps as TIMESTAMP/TIMESTAMP_NTZ/long/int on either side
  * independently (all compared as long micros — a mixed
  * TIMESTAMP/TIMESTAMP_NTZ pair compares UTC-instant to wall-clock
  * micros, the caller's contract to mean it) — the strategy REFUSES
  * (loud error, not silent wrong plans) anything else.
  */
object AsofJoin {

  /** Idempotently install the strategy on a session (the public
    * extension point — no spark.sql.extensions config needed).
    * Synchronized: extraStrategies is a plain var, so the check-then-
    * append below is a read-modify-write — two threads planning their
    * first as-of join concurrently could otherwise double-append the
    * strategy or clobber another writer's entry. */
  def ensureInstalled(spark: SparkSession): Unit = AsofJoin.synchronized {
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsofJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsofJoinStrategy
  }

  /** As-of join `left` to `right`: equi-key `leftKey = rightKey` plus
    * the as-of condition rightTs <= leftTs resolved to the LATEST
    * right row; a finite `tolMicros` additionally requires
    * leftTs − rightTs ≤ tolMicros (the attribution window). Column
    * names must be disjoint (rename the right side first — same rule
    * as any self-join). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      tolMicros: Long = Long.MaxValue): DataFrame =
    joinMulti(left, right, Seq(leftKey), Seq(rightKey),
      leftTs, rightTs, tolMicros)

  /** Composite-key form: equi-keys pair positionally. */
  def joinMulti(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTs: Column, rightTs: Column,
      tolMicros: Long = Long.MaxValue): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "need matching non-empty key lists")
    val spark = left.sparkSession
    ensureInstalled(spark)
    // the marker rides the public FunctionRegistry (the repo's
    // standard Column-from-Expression bridge)
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val marker =
      if (tolMicros == Long.MaxValue)
        org.apache.spark.sql.functions
          .call_function("graft_asof_match", leftTs, rightTs)
      else org.apache.spark.sql.functions.call_function(
        "graft_asof_match", leftTs, rightTs,
        org.apache.spark.sql.functions.lit(tolMicros))
    val keysEq = leftKeys.zip(rightKeys)
      .map { case (a, b) => a === b }.reduce(_ && _)
    left.join(right, keysEq && marker, "left_outer")
  }
}

/** Marker condition: `rightTs <= leftTs` (and, with a finite
  * `tolMicros`, `leftTs − rightTs <= tolMicros` — the attribution
  * window: the latest right event but only within Δt) AS AN AS-OF
  * MATCH. Evaluable as a plain boolean (so analysis passes and
  * EXPLAIN shows honest semantics), but its real role is to be
  * recognized by [[AsofJoinStrategy]], which replaces the
  * multi-match outer join with the latest-match merge. */
case class AsofMatch(leftTs: Expression, rightTs: Expression,
    tolMicros: Long = Long.MaxValue)
    extends BinaryExpression {
  override def left: Expression = leftTs
  override def right: Expression = rightTs
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_asof_match"

  require(tolMicros > 0, s"tolerance must be positive, got $tolMicros")

  private def tsOk(t: DataType) = t match {
    case TimestampType | TimestampNTZType | LongType | IntegerType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (tsOk(leftTs.dataType) && tsOk(rightTs.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs timestamp/long sides, got " +
        s"${leftTs.dataType.simpleString}, ${rightTs.dataType.simpleString}")

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val lt = asLong(l); val rt = asLong(r)
    rt <= lt && lt - rt <= tolMicros
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"(((long) $r) <= ((long) $l) && ((long) $l) - ((long) $r) <= ${tolMicros}L)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(leftTs = l, rightTs = r)
}

/** Recognizes Join(key-equality AND AsofMatch) and plans the
  * sorted-merge exec. LeftOuter is the native shape; Inner is ALSO
  * handled because the optimizer's EliminateOuterJoin legitimately
  * converts the marker join to Inner when a null-intolerant filter
  * on right columns sits above it — planned as the same merge plus a
  * right-key-not-null filter (latest-match inner semantics), so the
  * rewrite cannot silently bring back multi-match joining. Any OTHER
  * join type carrying the marker, or a marker join with extra
  * conjuncts / unsupported key types, throws: falling through to
  * normal planning would silently produce multi-match semantics. */
class AsofJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.plans.{Inner, JoinType}

  private def keyOk(t: DataType) = t match {
    case LongType | IntegerType | org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, joinType, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsofMatch]) =>
      if (joinType != LeftOuter && joinType != Inner)
        throw new IllegalArgumentException(
          s"graft asof join supports LEFT OUTER (native) and INNER " +
            s"(EliminateOuterJoin residue) shapes, got $joinType")
      // split cond into the marker and the single equi-key
      def split(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
          split(a) ++ split(b)
        case other => Seq(other)
      }
      val parts = split(cond)
      val markers = parts.collect { case m: AsofMatch => m }
      val equis = parts.collect { case e: EqualTo => e }
      if (markers.length != 1 || equis.isEmpty ||
          parts.length != equis.length + 1)
        throw new IllegalArgumentException(
          s"graft asof join needs (k1 = k1) [AND …] AND graft_asof_match, got: $cond")
      val m = markers.head
      val lOut = l.outputSet
      // orient each equality to its side
      val (lks, rks) = equis.map { eq =>
        if (eq.left.references.subsetOf(lOut)) (eq.left, eq.right)
        else (eq.right, eq.left)
      }.unzip
      val legsOk = lks.forall(_.references.subsetOf(lOut)) &&
        rks.forall(_.references.subsetOf(r.outputSet)) &&
        m.leftTs.references.subsetOf(lOut) &&
        m.rightTs.references.subsetOf(r.outputSet)
      if (!legsOk)
        throw new IllegalArgumentException(
          s"graft asof join: condition legs not split across sides: $cond")
      (lks ++ rks).find(k => !keyOk(k.dataType)).foreach(k =>
        throw new IllegalArgumentException(
          s"graft asof join supports int/long/string/date keys, got ${k.dataType}"))
      // the merge's output is left-outer shaped; an Inner marker join
      // (EliminateOuterJoin residue) additionally drops the unmatched
      // rows via a right-key-not-null filter on top
      val merged = AsofJoinExec(lks, rks, m.leftTs, m.rightTs, m.tolMicros,
        planLater(l), planLater(r),
        l.output ++ r.output.map(_.withNullability(true)))
      val shaped: SparkPlan =
        if (joinType == Inner)
          org.apache.spark.sql.execution.FilterExec(
            org.apache.spark.sql.catalyst.expressions.IsNotNull(rks.head), merged)
        else merged
      shaped :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join: children clustered on their keys and
  * sorted (key, ts) ascending; one forward pass per partition holds
  * at most one copied right row. A finite `tolMicros` nulls matches
  * staler than the window PER LEFT ROW (the held row stays buffered —
  * it is still the latest candidate for later, larger-ts left rows,
  * which are only MORE stale, but a fresh right row may rescue them). */
case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, tolMicros: Long,
    left: SparkPlan, right: SparkPlan,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    s"need matching non-empty key lists, got $leftKeys / $rightKeys")

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((leftKeys :+ leftTs).map(SortOrder(_,
        org.apache.spark.sql.catalyst.expressions.Ascending)),
      (rightKeys :+ rightTs).map(SortOrder(_,
        org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val ltExpr = bindLong(leftTs, left.output)
    val rtExpr = bindLong(rightTs, right.output)
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOut = left.output
    val rOut = right.output
    val rightWidth = right.output.length
    val allAttrs = left.output ++ right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // parents (shuffle serializer, executeCollect's byte-array RDD,
      // cache) require UnsafeRow output — project the JoinedRow
      // through an UnsafeProjection exactly as the built-in joins do.
      // Bind every field nullable=true BY HAND: the right child's
      // attributes are non-nullable, and a non-nullable BoundReference
      // skips isNullAt in generated code — the all-null unmatched row
      // would silently read as zeros
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(allAttrs.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions
            .BoundReference(i, a.dataType, nullable = true): Expression
        }.toIndexedSeq)
      // r11: composite keys ride an UnsafeProjection per side and
      // compare through the natural ascending InternalRow ordering —
      // the SAME per-type ordering the requiredChildOrdering sorts by,
      // so string/date keys merge exactly as int/long keys did.
      // (SortMergeJoinExec's key machinery, re-spelled for the asof
      // forward pass.)
      val lkProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(lKeyExprs, lOut)
      val rkProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
        // one-row lookahead on the right: rKey is rkProj's reusable
        // buffer — valid until the NEXT advanceRight overwrites it,
        // which is exactly its lifetime; the held key is copied
        // because it outlives arbitrarily many right advances
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs = 0L
        private var rHas = false
        advanceRight()
        private def advanceRight(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val row = rIter.next()
            val t = rtExpr.eval(row)
            val k = rkProj(row)
            // null right keys/ts never match
            if (t != null && !k.anyNull) {
              rRow = row; rKey = k; rTs = toLong(t); rHas = true
            }
          }
        }
        private var held: InternalRow = _
        private var heldKey: InternalRow = _
        private var heldValid = false
        private var heldTs = 0L

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lt = ltExpr.eval(l)
          val lKey = lkProj(l)
          if (lt == null || lKey.anyNull)
            return toUnsafe(joined(l, nullRight))
          val lTs = toLong(lt)
          if (heldValid && keyOrd.compare(heldKey, lKey) != 0) heldValid = false
          var c = if (rHas) keyOrd.compare(rKey, lKey) else 0
          while (rHas && (c < 0 || (c == 0 && rTs <= lTs))) {
            if (c == 0) {
              held = rRow.copy()
              heldKey = rKey.copy()
              heldTs = rTs
              heldValid = true
            }
            advanceRight()
            if (rHas) c = keyOrd.compare(rKey, lKey)
          }
          // tolerance is judged per left row: lTs - heldTs grows with
          // later lefts, so a stale held row nulls here but remains
          // the latest candidate until a fresher right replaces it
          val matched = heldValid && lTs - heldTs <= tolMicros
          toUnsafe(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }
  private def bindLong(e: Expression, attrs: Seq[Attribute]): Expression =
    org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(e, org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}
