package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec

import org.apache.spark.sql.functions._

/** K26: dynamic partition pruning on the month-partitioned lineitem
  * layout. The claims: the join plants a runtime pruning subquery on
  * the partition column, and the fact scan reads strictly fewer
  * month directories than exist — engine-level evidence that a
  * selective star join against a partitioned 100 TB fact would skip
  * the non-matching partitions at run time. */
class DppSpec extends SparkSpec {

  test("K26 the star join prunes fact partitions at runtime") {
    val df = IngestQueries.ingDpp(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)

    // PlanAudit.nodes recurses through AQE query stages — a plain
    // collect() on the adaptive plan misses scans inside stages
    val factScan = graft.monitor.PlanAudit.nodes(df, materialize = false)
      .collect { case s: FileSourceScanExec => s }
      .find(_.output.exists(_.name == "l_quantity")).get
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"expected a dynamicpruning partition filter, got ${factScan.partitionFilters}")

    val totalMonths = spark.read.parquet(IngestQueries.dppLayout(spark, sfDir))
      .select("ship_month").distinct().count()
    val readPartitions = factScan.metrics.get("numPartitions").map(_.value)
    assert(readPartitions.exists(n => n > 0 && n < totalMonths),
      s"expected 0 < read partitions < $totalMonths, got $readPartitions")
  }

  test("K26 pruned result equals the unpartitioned spelling") {
    val pruned = IngestQueries.ingDpp(spark, sfDir)
      .orderBy("l_returnflag").collect().toSeq
    val months = graft.Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1996 &&
        col("o_orderpriority") === "1-URGENT")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()
    val direct = graft.Tables.lineitem(spark, sfDir)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .join(months, "ship_month")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag").collect().toSeq
    assert(pruned == direct)
  }
}
