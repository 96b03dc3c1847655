package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

class RelationalSpec extends SparkSpec {

  /** Subtree strings of every broadcast exchange in the EXECUTED plan
    * (the PlanAudit traversal — one copy of the AQE stage recursion). */
  private def broadcastSubtrees(df: org.apache.spark.sql.DataFrame): Seq[String] =
    graft.monitor.PlanAudit.nodes(df)
      .collect { case b: BroadcastExchangeExec => b.toString }

  test("q_trade_flows broadcasts both geo dims, never the lineitem fact side") {
    noBroadcast {
      val bs = broadcastSubtrees(Relational.qTradeFlows(spark, sfDir))
      assert(bs.exists(_.contains("supplier")), "supplier geo dim should stay hinted")
      assert(bs.exists(_.contains("nation")), "nation dim should stay hinted")
      assert(!bs.exists(_.contains("lineitem")),
        s"lineitem must never broadcast:\n${bs.mkString("\n---\n")}")
    }
  }

  test("q_global_share keeps exactly the nations clearing the bps threshold") {
    val out = Relational.qGlobalShare(spark, sfDir).collect()
    assert(out.nonEmpty, "some nation must clear 4%")
    val total = (out.map(_.getLong(1)).sum /
      out.map(_.getDouble(3)).sum).round // implied global from shares
    out.foreach { r =>
      assert(r.getLong(1) * 10000L >= total * Relational.ShareBps - 10000,
        s"${r.getString(0)} below threshold: $r")
    }
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
