package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  private def withFlag[A](on: Boolean)(body: => A): A = {
    ApproxDistinct.ensureInstalled(spark)
    spark.conf.set(ApproxDistinct.FlagKey, on.toString)
    try body finally spark.conf.unset(ApproxDistinct.FlagKey)
  }

  private def optimizedContainsHll(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct")

  private lazy val t: DataFrame = {
    import spark.implicits._
    (1 to 5000).map(i => (i % 1000, i % 7)).toDF("x", "g")
  }

  test("K17 flag off: count(DISTINCT) stays exact and un-rewritten") {
    withFlag(false) {
      val df = t.agg(countDistinct(col("x")))
      assert(!optimizedContainsHll(df))
      assert(df.collect().head.getLong(0) == 1000L)
    }
  }

  test("K17 flag on: single-column count(DISTINCT) rewrites to HLL++ within rsd") {
    withFlag(true) {
      val df = t.agg(countDistinct(col("x")).as("d"))
      assert(optimizedContainsHll(df), df.queryExecution.optimizedPlan.toString)
      val est = df.collect().head.getLong(0)
      // default rsd 0.05; 1000 true distinct — allow 4 sigma
      assert(math.abs(est - 1000L) <= 200, s"estimate $est")
      // grouped shape rewrites too, and the SQL front door hits the rule
      t.createOrReplaceTempView("k17_t")
      val sql = spark.sql("SELECT g, count(DISTINCT x) AS d FROM k17_t GROUP BY g")
      assert(optimizedContainsHll(sql))
      assert(sql.collect().length == 7)
    }
  }

  test("K17 multi-column count(DISTINCT a, b) keeps exact semantics") {
    withFlag(true) {
      val df = t.agg(count_distinct(col("x"), col("g")).as("d"))
      assert(!optimizedContainsHll(df))
      // exact: 1000 x-values × their fixed g residues — x determines
      // (x, g) pairs up to the 7-cycle; exact count is deterministic
      val exact = withFlag(false)(
        t.agg(count_distinct(col("x"), col("g"))).collect().head.getLong(0))
      assert(df.collect().head.getLong(0) == exact)
    }
  }

  test("K17 toggling the conf flips behavior without reinstalling") {
    ApproxDistinct.ensureInstalled(spark)
    ApproxDistinct.ensureInstalled(spark) // idempotent
    assert(spark.experimental.extraOptimizations
      .count(_ == ApproxDistinct.ApproxDistinctRule) == 1)
    spark.conf.set(ApproxDistinct.FlagKey, "true")
    try {
      assert(optimizedContainsHll(t.agg(countDistinct(col("x")))))
      spark.conf.set(ApproxDistinct.FlagKey, "false")
      val df = t.agg(countDistinct(col("x")))
      assert(!optimizedContainsHll(df))
      assert(df.collect().head.getLong(0) == 1000L)
    } finally spark.conf.unset(ApproxDistinct.FlagKey)
  }
}
