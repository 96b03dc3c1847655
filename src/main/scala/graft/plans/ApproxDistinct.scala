package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** K17: opt-in approximate-query mode as a custom optimizer rule —
  * the `Rule[LogicalPlan]` face of the engine's Catalyst surface
  * (expressions: graft_* codegen kernels; aggregates: the sketch
  * quartet; physical operator: AsofJoinExec; this completes the set).
  *
  * With `spark.graft.approxDistinct=true`, every single-column
  * COUNT(DISTINCT x) in a query — written by a user, a BI tool, or a
  * dashboard template that cannot be edited — is rewritten to
  * HyperLogLog++ (`approx_count_distinct`) at the configured relative
  * standard deviation. Why a RULE and not "just use the function":
  * the queries that hurt at 100 TB are the ones you don't control —
  * an exact distinct plans as Expand + two exchanges keyed on the
  * distinct column (every row shuffles), while HLL++ partial-aggregates
  * map-side and moves one fixed-width sketch per group. The flag flips
  * acknowledged-approximate dashboards fleet-wide without touching
  * their SQL, and flips back for the audited exact run.
  *
  * Scope guards: only Count with ONE child rewrites (multi-column
  * distinct tuples and count(DISTINCT a, b) keep exact semantics);
  * result type matches (both LongType); the Alias above the aggregate
  * keeps its exprId so downstream references bind unchanged. The rule
  * reads the flag per-apply, so toggling the conf inside a session
  * takes effect on the next query with no reinstall.
  */
object ApproxDistinct {

  val FlagKey = "spark.graft.approxDistinct"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  object ApproxDistinctRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (!conf.getConfString(FlagKey, "false").toBoolean) plan
      else {
        val rsd = conf.getConfString(RsdKey, "0.05").toDouble
        plan.transform {
          case agg: Aggregate =>
            agg.transformExpressions {
              case ae @ AggregateExpression(c: Count, _, true, _, _)
                  if c.children.size == 1 =>
                ae.copy(
                  aggregateFunction = new HyperLogLogPlusPlus(c.children.head, rsd),
                  isDistinct = false)
            }
        }
      }
    }
  }

  /** Idempotently install the rule on a session (the AsofJoin
    * extension-point idiom — no spark.sql.extensions config needed;
    * synchronized because extraOptimizations is a plain var). The
    * rule is inert until [[FlagKey]] is set true. */
  def ensureInstalled(spark: SparkSession): Unit = ApproxDistinct.synchronized {
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRule
  }
}
