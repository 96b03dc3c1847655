package graft.monitor

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** J5: executed-plan audit — the scale red-flags this repo's specs
  * check (exchange counts, codegen spans, scan pushdown) exposed as a
  * library surface, so a user can assert the SAME invariants on their
  * own pipelines ("this join must broadcast", "this scan must push
  * its filter", "no projection may run interpreted") instead of
  * eyeballing `explain` output at 3am.
  *
  * AQE-aware: the finalized plan is a tree of QueryStageExec leaves,
  * so plain traversal undercounts — the walk recurses INTO stages,
  * including into shuffle stages (a chained plan nests earlier
  * ShuffleQueryStages inside a later one's .plan — the r8
  * countExchanges lesson, shared machinery now).
  */
object PlanAudit {

  /** One row of scale truth about an EXECUTED plan. */
  final case class Audit(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      sorts: Int,
      wholeStageSpans: Int,
      fileScans: Int,
      scansWithPushedFilters: Int,
      scansWithPartitionFilters: Int,
      readColumns: Int,
      singlePartitionExchanges: Int = 0,
      singlePartitionHeavy: Int = 0,
      filesRead: Long = 0L,
      bytesRead: Long = 0L,
      unpushedDataFilterScans: Int = 0) {
    /** The headline smells, human-readable; empty = clean. */
    def smells: Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (fileScans > 0 && wholeStageSpans == 0)
        out += "no whole-stage codegen span anywhere (interpreted plan?)"
      // the pushdown smell fires per-scan on a GENUINE miss only (r17
      // verdict #4): a scan that EVALUATES a data filter none of whose
      // conjuncts translated to a source filter. A query whose
      // semantic input is the whole table (profilers, corpus-wide
      // aggregations) has no data filter targeting the scan at all —
      // it reads everything BY DESIGN and must not smell, or the
      // fleet's smell list buries every real miss under benign hits
      // (165 of them in the r17 artifact). The old spelling
      // ("no scan pushes any filter") could not tell the two apart.
      if (unpushedDataFilterScans > 0)
        out += s"$unpushedDataFilterScans scan(s) evaluate a data filter " +
          "with nothing pushed down (pushdown miss)"
      // the scale-killer class (the r10 vdict lesson): a stage that
      // collapses UNBOUNDED data into one task — a global window/sort
      // with no partitioning. The benign single-partition shapes (the
      // final combine of a two-phase global aggregate, a bounded
      // limit) are counted in singlePartitionExchanges but do NOT
      // smell: they move one row (or ≤ limit rows) per upstream
      // partition, not the data. Deliberate tiny-frame globals (a
      // rank over an already-aggregated handful of rows) still trip
      // this — the smell reports the construct, the reader judges
      // the row count.
      if (singlePartitionHeavy > 0)
        out += s"$singlePartitionHeavy unbounded single-partition " +
          "exchange(s) (one-task stage unless the frame is tiny)"
      out.toSeq
    }
  }

  /** Materializes `df` through its OWN query execution (a sink write
    * would spawn a separate execution and leave THIS plan's AQE
    * stages unfinalized — the audit would read the pre-adaptive
    * skeleton with no codegen spans): every row of every partition is
    * consumed executor-side, nothing is collected. Callers that
    * already ran an action on `df` can pass `materialize = false`. */
  /** Every physical node of the EXECUTED plan, AQE stages and
    * expression-held subquery plans included — THE traversal (specs
    * that need raw nodes build on this instead of re-spelling the
    * stage recursion). */
  def nodes(df: DataFrame, materialize: Boolean = true): Seq[SparkPlan] = {
    if (materialize)
      df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
    val seen = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = {
      seen += p
      // expression-held subquery plans (scalar/IN/EXISTS) are NOT
      // children — their scans and exchanges would silently escape a
      // children-only walk
      p.subqueries.foreach(walk)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    seen.toSeq
  }

  private def spExchanges(seen: Seq[SparkPlan]): Seq[ShuffleExchangeExec] =
    seen.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }

  /** A single-partition exchange is benign when its input is already
    * reduced per upstream partition: the final combine of a two-phase
    * aggregate moves one row per partition, a local limit moves ≤ N —
    * the data itself never converges on one task. Anything else (a
    * no-partition window/sort feeding the exchange the full frame) is
    * the one-task-stage scale killer. */
  private def spBenign(child: SparkPlan): Boolean = child match {
    case q: QueryStageExec => spBenign(q.plan)
    case a: AdaptiveSparkPlanExec => spBenign(a.executedPlan)
    case w: WholeStageCodegenExec => spBenign(w.child)
    case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      agg.aggregateExpressions.forall(e =>
        e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial ||
          e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.PartialMerge)
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case p: org.apache.spark.sql.execution.ProjectExec => spBenign(p.child)
    case _ => false
  }

  def audit(df: DataFrame, materialize: Boolean = true): Audit = {
    val seen = nodes(df, materialize)
    val scans = seen.collect { case s: FileSourceScanExec => s }.toSeq
    Audit(
      shuffleExchanges = seen.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcastExchanges = seen.count(_.isInstanceOf[BroadcastExchangeExec]),
      sorts = seen.count(_.isInstanceOf[SortExec]),
      wholeStageSpans = seen.count(_.isInstanceOf[WholeStageCodegenExec]),
      fileScans = scans.length,
      scansWithPushedFilters =
        scans.count(_.metadata.get("PushedFilters").exists(v =>
          v.nonEmpty && v != "[]")),
      scansWithPartitionFilters =
        scans.count(_.partitionFilters.nonEmpty),
      readColumns = scans.map(_.output.length).sum,
      singlePartitionExchanges = spExchanges(seen).length,
      singlePartitionHeavy = spExchanges(seen).count(e => !spBenign(e.child)),
      // per-query FILE-LAYOUT telemetry (r16 verdict #7): the store
      // layout's read cost is invisible to shuffle/codegen counts — a
      // 2048-vs-32-file table reads with the same plan shape but 64×
      // the open() calls. numFiles/filesSize are driver-side metrics
      // set when the scan plans its partitions, so they are populated
      // after materialization; scans missing the metric count 0.
      filesRead = scans.map(s =>
        s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum,
      bytesRead = scans.map(s =>
        s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum,
      // a scan carrying dataFilters (post-partition-pruning predicates
      // Catalyst pushed INTO the scan node) whose PushedFilters came
      // out empty AND at least one conjunct is ACTIONABLE — the shape
      // that is unambiguously a pushdown miss. Excluded conjunct
      // classes (each never actionable at the source):
      //  - dataFilters empty: nothing targeted the scan — a full read
      //    by SEMANTICS (profilers, corpus aggregations), not a miss;
      //  - null guards (isnotnull over a derived expression, or
      //    boolean glue whose value leaves are all such guards):
      //    join/agg key null-filtering artifacts, zero selectivity;
      //  - uniform-hash predicates (md5/xxhash64/… in the subtree):
      //    hash values distribute uniformly across every file and row
      //    group, so no source filter, zone map, or min/max stat can
      //    ever prune them — deterministic sampling and train/test
      //    splits are this class BY DESIGN.
      unpushedDataFilterScans = scans.count(s =>
        s.dataFilters.exists(c => !nullGuard(c) && !hashDerived(c)) &&
          !s.metadata.get("PushedFilters").exists(v =>
            v.nonEmpty && v != "[]")))
  }

  /** A conjunct whose VALUE can only be a null-presence check:
    * IsNotNull/IsNull over any expression, or boolean structure whose
    * value leaves are all such checks (the salt-join CASE WHEN guard
    * shape). Catalyst synthesizes these from join/agg null semantics;
    * they prune nothing and are not a user predicate. */
  private def nullGuard(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: IsNotNull | _: IsNull => true
      case Literal(_, org.apache.spark.sql.types.BooleanType) => true
      case CaseWhen(branches, elseV) =>
        branches.forall { case (_, v) => nullGuard(v) } &&
          elseV.forall(nullGuard)
      case If(_, t, f) => nullGuard(t) && nullGuard(f)
      case And(l, r) => nullGuard(l) && nullGuard(r)
      case Or(l, r) => nullGuard(l) && nullGuard(r)
      case Not(c) => nullGuard(c)
      case _ => false
    }
  }

  /** A conjunct computed from a cryptographic/mixing hash — uniform by
    * construction, so source-level pruning is information-theoretically
    * useless for it (every file matches the same fraction). */
  private def hashDerived(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e.exists {
      case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 => true
      case _: Murmur3Hash | _: XxHash64 | _: HiveHash => true
      case _ => false
    }
  }
}
