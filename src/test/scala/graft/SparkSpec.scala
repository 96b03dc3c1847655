package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for the suite; one JVM-wide session (tests
  * fork into a single JVM, getOrCreate dedups across suites). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** Shuffle count of the EXECUTED plan. Under AQE (Spark 4 default)
    * the finalized plan is a tree of QueryStageExec LEAVES
    * (ResultQueryStage at the root, shuffles as ShuffleQueryStageExec),
    * so plain tree traversal for ShuffleExchangeExec counts 0 even when
    * the join shuffles (r3 advice): recurse INTO query stages via
    * .plan — including INTO shuffle stages (r8: a chained plan nests
    * earlier ShuffleQueryStages inside a later one's .plan, so
    * stopping at the first stage undercounted multi-shuffle chains). */
  def countExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // execute so AQE finalizes the plan
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleQueryStageExec => walk(s.plan) // .plan IS the exchange
      case q: QueryStageExec => walk(q.plan)
      case _: ShuffleExchangeExec => 1 + p.children.map(walk).sum
      case _ => p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Disable BOTH broadcast thresholds for `body`: AQE has its own
    * spark.sql.adaptive.autoBroadcastJoinThreshold and will happily
    * convert a join to broadcast (making "no shuffle" trivially true,
    * proving nothing about bucketing) when only the static one is -1. */
  def noBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  override def afterAll(): Unit = {
    // keep the session alive for sibling suites (getOrCreate-shared)
    super.afterAll()
  }
}
