package graft.store

import graft.SparkSpec
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

/** K21: ANALYZE-driven statistics — the catalog carries exact row
  * counts and column NDV/min/max after a store build, and the
  * cost-based optimizer estimates from them. */
class CboSpec extends SparkSpec {

  private lazy val table: String = {
    import spark.implicits._
    val name = GraftStore.ensureBucketed(spark, "cbo_t", 4, Seq("k")) {
      (1L to 1000L).map(i => (i, i % 10)).toDF("k", "g")
    }
    GraftStore.analyze(spark, name, cols = Seq("k", "g"))
    name
  }

  test("K21 ANALYZE records exact row count and column NDV in the catalog") {
    val stats = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).stats
      .getOrElse(fail("no stats after ANALYZE"))
    assert(stats.rowCount.contains(BigInt(1000)))
    val g = stats.colStats("g")
    assert(g.distinctCount.exists(d => d >= BigInt(9) && d <= BigInt(11)),
      s"g NDV ~10, got ${g.distinctCount}")
    assert(stats.colStats("k").min.isDefined && stats.colStats("k").max.isDefined)
  }

  test("K21 CBO estimates a selective filter below the table row count") {
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val full = spark.table(table)
      assert(full.queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(1000)))
      val est = spark.table(table).filter(col("g") === 3)
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must estimate a row count"))
      assert(est > BigInt(0) && est < BigInt(300),
        s"one of ~10 groups should estimate well under the table size, got $est")
    }
  }

  test("K41 CBO plans from MANIFEST stats with no ANALYZE call (stats merged across commits)") {
    import spark.implicits._
    val name = "cbo_manifest_t"
    // two appends: the cumulative header must merge counts and union
    // the NDV sketches across the delta chain
    SnapshotStore.commitAppend(name, (1L to 600L).map(i => (i, i % 10)).toDF("k", "g"))
    SnapshotStore.commitAppend(name, (601L to 1000L).map(i => (i, i % 10)).toDF("k", "g"))
    val st = SnapshotStore.statsOf(name, SnapshotStore.versions(name).last)
      .getOrElse(fail("no #stats header on the committed manifest"))
    assert(st.rows == 1000L && st.bytes > 0L)
    assert(st.cols("g").ndv.exists(d => d >= 9L && d <= 11L),
      s"g NDV ~10 from the merged sketch, got ${st.cols("g").ndv}")
    assert(st.cols("k").min.contains("1") && st.cols("k").max.contains("1000"))
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val full = SnapshotStore.readWithStats(spark, name)
      assert(full.queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(1000)),
        "row count must flow from the manifest header, no ANALYZE ran")
      val est = SnapshotStore.readWithStats(spark, name).filter(col("g") === 3)
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must estimate a row count"))
      assert(est > BigInt(0) && est < BigInt(300),
        s"one of ~10 groups should estimate well under the table size, got $est")
    }
  }

  test("K43 zone-pruned read narrows planning stats to the surviving files") {
    import spark.implicits._
    val name = "cbo_zoned_t"
    // two commits with DISJOINT k ranges; a k-range predicate must
    // prune the first commit's files AND shrink the planning stats
    SnapshotStore.commitAppend(name,
      (1L to 500L).map(i => (i, i % 10)).toDF("k", "g").repartition(4))
    SnapshotStore.commitAppend(name,
      (501L to 1000L).map(i => (i, i % 10)).toDF("k", "g").repartition(4))
    val (idx, df) = SnapshotStore.readZonedStats(spark, name, col("k") > 500L)
    assert(idx.lastKept.get < idx.totalFiles,
      s"the k<=500 files must prune: kept ${idx.lastKept.get}/${idx.totalFiles}")
    val ct = df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable
    }.flatten.getOrElse(fail("no catalog table attached"))
    val stats = ct.stats.getOrElse(fail("no stats attached"))
    val rc = stats.rowCount.getOrElse(fail("no row estimate"))
    assert(rc > BigInt(0) && rc < BigInt(1000),
      s"row estimate must reflect pruning, got $rc of 1000")
    val k = stats.colStats("k")
    assert(k.min.exists(m => BigDecimal(m) >= BigDecimal(501)),
      s"k.min must narrow to the surviving files' zones, got ${k.min}")
    assert(k.distinctCount.exists(_ <= rc),
      s"NDV must cap at the row estimate: ${k.distinctCount} vs $rc")
    // the estimate flows into CBO planning
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val est = df.queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(e => e > BigInt(0) && e <= rc),
        s"optimizer estimate must ride the narrowed stats: $est vs $rc")
    }
  }

  test("K44 per-file detail makes pruned planning stats EXACT (rows summed, NDV unioned)") {
    import spark.implicits._
    val name = "cbo_detail_t"
    // disjoint k ranges AND disjoint g cardinalities per commit: the
    // first holds 10 g values, the second only 3 — pruning to the
    // second must report rows EXACTLY 500 (summed, not byte
    // pro-rated) and g NDV ~3, not the global 13 capped at the
    // estimate
    SnapshotStore.commitAppend(name,
      (1L to 500L).map(i => (i, i % 10)).toDF("k", "g").repartition(4))
    SnapshotStore.commitAppend(name,
      (501L to 1000L).map(i => (i, 100L + i % 3)).toDF("k", "g").repartition(4))
    val v = SnapshotStore.versions(name).last
    val det = SnapshotStore.fileDetailsOf(name, v)
    assert(det.size == SnapshotStore.files(name, v).size,
      "every committed file must carry a detail record")
    assert(det.values.map(_.rows).sum == 1000L,
      s"detail rows must sum to the table: ${det.values.map(_.rows).sum}")
    val (idx, df) = SnapshotStore.readZonedStats(spark, name, col("k") > 500L)
    assert(idx.lastKept.get < idx.totalFiles, "the k<=500 files must prune")
    val stats = df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable
    }.flatten.flatMap(_.stats).getOrElse(fail("no stats attached"))
    assert(stats.rowCount.contains(BigInt(500)),
      s"row count must be the EXACT kept-file sum, got ${stats.rowCount}")
    val g = stats.colStats("g")
    assert(g.distinctCount.exists(d => d >= BigInt(2) && d <= BigInt(4)),
      s"g NDV must come from the kept files' sketch union (~3), got ${g.distinctCount}")
    assert(g.nullCount.contains(BigInt(0)),
      s"null count must be the kept files' exact sum, got ${g.nullCount}")
  }

  test("K48 live read: a pushed predicate prunes row groups INSIDE a kept file — bytes actually read drop, not just planned bytes") {
    import spark.implicits._
    val name = "cbo_rglive"
    val hc = spark.sparkContext.hadoopConfiguration
    val old = Option(hc.get("parquet.block.size"))
    val oldVec = Option(hc.get("parquet.hadoop.vectored.io.enabled"))
    hc.setInt("parquet.block.size", 256 * 1024)
    // Hadoop vectored IO reads through a positioned-read path the
    // FileSystem.Statistics thread counters do not see on the local
    // FS, so task input metrics UNDERCOUNT with it on (a metrics gap,
    // not a pruning gap — verified both ways); classic reads count
    // every byte and are what this test measures
    hc.setBoolean("parquet.hadoop.vectored.io.enabled", false)
    // the payload makes DATA pages dominate the file (sequential longs
    // alone delta-encode so well the footer outweighs them and bytes-
    // read would measure footer I/O, not data pruning)
    try {
      SnapshotStore.commitAppend(name,
        (1L to 20000L).map(i => (i, ("x" + java.security.MessageDigest
            .getInstance("MD5").digest(i.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString) * 8)).toDF("k", "pay")
          .coalesce(1).sortWithinPartitions("k"))
      // plan-time: the manifest's K48 detail proves the cut is available
      val plan = SnapshotStore.rowGroupPrunePlan(spark, name, col("k") <= 1000L)
      assert(plan.keptFiles == 1 && plan.totalRowGroups > 3,
        s"fixture must be one file with several row groups: $plan")
      assert(plan.keptRowGroups < plan.totalRowGroups &&
        plan.keptRgBytes < plan.keptFileBytes, s"$plan")
      // read-time: the SAME cut is enforced by the parquet reader's
      // footer statistics when the filter is pushed — measure the bytes
      // tasks actually read, full scan vs selective scan on the one file
      val tracker = graft.monitor.Monitor.registerTasks(spark)
      def readBytes(act: => Unit): Long = {
        tracker.settledDelta(); act; tracker.settledDelta().input
      }
      val df = SnapshotStore.read(spark, name)
      // both sides aggregate the SAME payload column, so the only byte
      // difference is which row groups' data pages the reader fetches
      val fullBytes = readBytes {
        df.agg(sum(length(col("pay")))).collect(); ()
      }
      val selBytes = readBytes {
        df.filter(col("k") <= 1000L).agg(sum(length(col("pay")))).collect(); ()
      }
      assert(fullBytes >= plan.keptFileBytes,
        s"the full scan reads the whole file: $fullBytes vs ${plan.keptFileBytes}")
      assert(selBytes * 2 < fullBytes,
        s"live row-group pruning must cut bytes read: $selBytes vs $fullBytes")
      assert(selBytes < plan.keptFileBytes / 2,
        s"the selective scan must read well under the file: $selBytes")
      // the mechanism the cut rides on: the predicate reached the scan
      val scan = df.filter(col("k") <= 1000L).queryExecution.executedPlan
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.getOrElse(fail("no file scan in the plan"))
      assert(scan.metadata.get("PushedFilters").exists(_.contains("LessThanOrEqual(k,1000)")),
        s"filter must be pushed to parquet: ${scan.metadata.get("PushedFilters")}")
    } finally {
      old match {
        case Some(s) => hc.set("parquet.block.size", s)
        case None => hc.unset("parquet.block.size")
      }
      oldVec match {
        case Some(s) => hc.set("parquet.hadoop.vectored.io.enabled", s)
        case None => hc.unset("parquet.hadoop.vectored.io.enabled")
      }
    }
  }

  private def withSQLConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
