package graft.monitor

import graft.SparkSpec

/** J5 as a fleet-wide tripwire (the CodegenFallbackSpec idiom applied
  * to plan shape): STATICALLY plan every registered driver query at
  * sf0.001 and fail if any contains an unbounded single-partition
  * exchange — the one-task-stage scale-killer class the r10 verdict
  * flagged in the vertex-dictionary build. Static = no execution: AQE
  * can only COALESCE partitions at runtime (AQEShuffleRead), it never
  * introduces a statically-planned SinglePartition exchange, so the
  * pre-execution plan is exactly the right surface for this check —
  * and planning all ~200 queries costs seconds, not the minutes a
  * materialized audit would.
  *
  * Queries whose global stage runs over an ALREADY-AGGREGATED tiny
  * frame (a rank over ≤ a few hundred grouped rows) are listed in
  * [[allowed]] with the reason — a NEW query that trips must either
  * justify itself onto that list or fix its plan.
  */
class FleetAuditSpec extends SparkSpec {

  /** Deliberate tiny-frame globals: the single-partition stage ranks /
    * cumulates a frame already reduced by aggregation to O(groups)
    * rows — a conscious choice, not a scale accident. */
  private val allowed: Set[String] = Set.empty

  /** Residual-filter queries the refined pushdown smell still names —
    * each filters on an expression DERIVED inside the query (token
    * count over text; the synthesized WARC payload), so no stored
    * column exists to push to. Mirrored by Bench's smellAllow with the
    * same reasons; a NEW query tripping the smell must justify itself
    * onto this list or fix its plan. */
  private val pushdownAllowed: Set[String] =
    Set("text_readability", "ing_warc_corpus", "ing_corpus_gate")

  test("J5 no registered query smells a pushdown miss beyond the declared residual-filter list (r17 verdict #4)") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (!pushdownAllowed.contains(name)) {
        try {
          val audit = PlanAudit.audit(fn(spark, sfDir), materialize = false)
          if (audit.unpushedDataFilterScans > 0)
            offenders += name ->
              s"${audit.unpushedDataFilterScans} unpushed data-filter scan(s)"
        } catch {
          case e: Throwable => offenders += name -> s"failed to plan: ${e.getMessage}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.map { case (n, m) => s"  $n: $m" }.mkString("\n")}")
  }

  test("J5 no registered query plans an unbounded single-partition exchange") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (!allowed.contains(name)) {
        try {
          val audit = PlanAudit.audit(fn(spark, sfDir), materialize = false)
          if (audit.singlePartitionHeavy > 0)
            offenders += name -> s"${audit.singlePartitionHeavy} heavy single-partition exchange(s)"
        } catch {
          case e: Throwable => offenders += name -> s"failed to plan: ${e.getMessage}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.map { case (n, m) => s"  $n: $m" }.mkString("\n")}")
  }
}
