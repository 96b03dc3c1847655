package graft

import org.apache.spark.sql.functions._

/** Scan-efficiency evidence: filters REACH the parquet scan
  * (PushedFilters) and projection prunes the read schema — the two
  * properties that decide whether a 100 TB scan reads 100 TB or the
  * two columns it needs. Asserted on the executed plan text, the same
  * surface `.explain("formatted")` shows.
  */
class PushdownSpec extends SparkSpec {

  private def scanLine(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no parquet scan in plan:\n$plan"))
  }

  test("filter predicates push down to the parquet scan") {
    val scan = scanLine(
      Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey"))
    assert(scan.contains("PushedFilters:") &&
      scan.contains("GreaterThanOrEqual(l_quantity,45"),
      s"l_quantity filter must reach the scan: $scan")
  }

  test("projection prunes the read schema to the selected columns") {
    val scan = scanLine(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"))
    val readSchema = scan.substring(scan.indexOf("ReadSchema:"))
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan must not read unprojected columns: $readSchema")
  }

  test("ORC scans push filters and prune columns like parquet") {
    val path = java.nio.file.Files.createTempDirectory("graft_orc_pd").toString
    Tables.customer(spark, sfDir).write.mode("overwrite").orc(path)
    val df = spark.read.orc(path)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_mktsegment")
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail(s"no orc scan in plan:\n$plan"))
    assert(scan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the ORC scan: $scan")
    val readSchema = scan.substring(scan.indexOf("ReadSchema:"))
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_address"),
      s"ORC scan must not read unprojected columns: $readSchema")
  }

  test("partitioned writes give partition pruning: filtered scans list one partition") {
    val path = java.nio.file.Files.createTempDirectory("graft_pp").toString
    Tables.nation(spark, sfDir).write.mode("overwrite")
      .partitionBy("n_regionkey").parquet(path)
    val df = spark.read.parquet(path).filter(col("n_regionkey") === 2)
    val scan = scanLine(df)
    assert(scan.contains("PartitionFilters:") && scan.contains("n_regionkey"),
      s"region filter must prune partitions, not scan them: $scan")
    // the pruned scan reads exactly the one directory
    val files = df.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("n_regionkey=2")),
      s"scan touched non-matching partitions: ${files.mkString(", ")}")
  }

  test("dynamic partition pruning injects the dim filter into the fact scan at runtime") {
    import spark.implicits._
    // the 100 TB star-join shape: fact partitioned on the join key,
    // dim filtered at runtime — the fact scan must list ONLY the
    // partitions the filtered dim reaches, discovered via the reused
    // broadcast, not a static predicate
    val path = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sfDir).write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(path)
    val fact = spark.read.parquet(path)
    // the dim must be FILE-backed: a LocalRelation dim has its filter
    // constant-folded away by ConvertToLocalRelation before the
    // PartitionPruning batch runs, so no selective predicate remains
    // for DPP to clone into the fact side
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("R", 1), ("A", 2), ("N", 3)).toDF("flag", "x")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val j = fact.join(dim.filter(col("x") === 1),
      fact("l_returnflag") === dim("flag"))
    j.collect()
    // walk to the fact scan and read its partition filters directly —
    // the treeString elides long filter lists, so string-matching the
    // whole plan false-negatives
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case _ => p.children.flatMap(scans)
    }
    val factScan = scans(j.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("graft_dpp")))
    assert(factScan.isDefined, "fact scan not found")
    val pf = factScan.get.partitionFilters.mkString("; ")
    assert(pf.contains("dynamicpruning"),
      s"expected a dynamicpruning filter on the fact scan, got: '$pf'")
  }

  test("K11 z-order layout prunes row groups for the dimension a linear sort abandons") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // Morton sanity: z(3,5) interleaves to 0b100111 = 39
    val z = spark.range(1).select(graft.functions.ZOrder
      .zOrderKey(lit(3), lit(5)).as("z")).head.getLong(0)
    assert(z == 39L, s"z(3,5) = $z")
    def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      var n = -1L
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: FileSourceScanExec => n = s.metrics("numOutputRows").value
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan); n
    }
    val n = 1 << 18 // 512×512 grid, one row per cell
    val base = spark.range(n).select(
      (col("id") % 512).cast("int").as("x"),
      ((col("id") / 512) % 512).cast("int").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    base.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    base.withColumn("zk", graft.functions.ZOrder.zOrderKey(col("x"), col("y")))
      .repartitionByRange(64, col("zk")).sortWithinPartitions("zk")
      .drop("zk").write.parquet(s"$dir/zorder")
    // the y-box query: the linear-by-x layout has useless y stats in
    // every row group and reads everything; the z-order layout keeps
    // BOTH dims' stats tight enough to cut most groups
    def scanRows(path: String) = scanOutputRows(
      spark.read.parquet(path).filter(col("y") >= 100 && col("y") < 150))
    val lin = scanRows(s"$dir/linear")
    val zo = scanRows(s"$dir/zorder")
    assert(lin == n, s"linear-by-x layout must scan all rows for a y filter: $lin")
    assert(zo * 2 < lin, s"z-order must cut the y scan: zorder=$zo vs linear=$lin")
  }

  test("driver query q1 scans only its six columns with the date filter pushed") {
    val scan = scanLine(graft.queries.Relational.q1PricingSummary(spark, sfDir))
    assert(scan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter must reach the scan: $scan")
    val readSchema = scan.substring(scan.indexOf("ReadSchema:"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"q1 must not read unused columns: $readSchema")
  }
}
