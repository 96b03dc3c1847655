package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K6: runtime bloom-filter join pruning — Spark's InjectRuntimeFilter
  * builds a bloom filter from the SELECTIVE side of a shuffle join and
  * applies might_contain on the large side's scan, so a 100 TB fact
  * table drops non-joining rows before the shuffle. The optimization
  * is size-gated (creation side < creationSideThreshold, application
  * side > applicationSideScanSizeThreshold), so local-scale tests must
  * lower the application-side gate to observe it; at cluster scale the
  * defaults fire on their own. This spec pins (a) the filter IS
  * injected under those conditions, (b) results are identical with and
  * without it.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("K6 bloom filter is injected on the fact side and preserves results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rf").toString
    // fact: 200k rows over 10k keys; dim: 10k keys, filter keeps ~1%
    spark.range(200000)
      .select((col("id") % 10000).as("k"), (col("id") % 97).as("v"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(10000)
      .select(col("id").as("k"), (col("id") % 100).as("tag"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === 7)

    def joined = fact.join(dim, "k").groupBy("tag")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))

    var withFilter: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local parquet is far below the 10GB default gate — lower it;
      // the cluster-scale defaults fire without any tuning
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = joined
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      withFilter = df.collect()
    }
    var noFilter: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = joined
      assert(!df.queryExecution.optimizedPlan.toString.contains("might_contain"))
      noFilter = df.collect()
    }
    assert(withFilter.toSeq.sortBy(_.toString) == noFilter.toSeq.sortBy(_.toString))
    assert(withFilter.nonEmpty)
  }
}
