package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

class RelationalSpec extends SparkSpec {

  /** Subtree strings of every broadcast exchange in the EXECUTED plan
    * (recursing into AQE query stages, the countExchanges lesson). */
  private def broadcastSubtrees(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    val out = scala.collection.mutable.Buffer.empty[String]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case b: BroadcastExchangeExec => out += b.toString; b.children.foreach(walk)
      case q: QueryStageExec => walk(q.plan)
      case _ => p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  test("q_pivot never hint-broadcasts the fact-side customer table") {
    // with BOTH broadcast thresholds disabled, only explicit broadcast()
    // hints survive: nation/region (genuinely tiny dims) must still be
    // broadcast, customer (15 M rows at sf100 — r6 verdict #3) must not
    noBroadcast {
      val bs = broadcastSubtrees(Relational.qPivot(spark, sfDir))
      assert(bs.exists(_.contains("nation")), "nation dim should stay hinted")
      assert(!bs.exists(_.contains("customer")),
        s"customer must not carry a broadcast hint:\n${bs.mkString("\n---\n")}")
    }
  }
}
