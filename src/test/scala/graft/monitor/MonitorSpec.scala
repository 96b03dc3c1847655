package graft.monitor

import graft.SparkSpec

class MonitorSpec extends SparkSpec {

  test("J1 listener records completed queries with duration and rows") {
    import spark.implicits._
    val c = Monitor.register(spark)
    try {
      Seq(1, 2, 3).toDF("x").collect()
      // listener callbacks are async — poll for delivery
      var tries = 0
      while (c.snapshot.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val ms = c.snapshot
      assert(ms.nonEmpty, "no metrics captured")
      assert(ms.forall(_.durationMs > 0))
      assert(c.toJson.startsWith("[{\"name\":"))
    } finally spark.listenerManager.unregister(c)
  }

  test("J1 timed emits wall/cpu/heap JSON envelope") {
    val (res, json) = Monitor.timed("unit") { (1 to 1000).sum }
    assert(res == 500500)
    assert(json.contains("\"job\":\"unit\"") && json.contains("wall_ms") &&
      json.contains("cpu_ms") && json.contains("heap_mb"))
  }

  test("J2 streaming listener captures per-batch input volume and state size") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val c = Monitor.registerStreaming(spark)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("mon_out").outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1700000000000L)
      mem.addData((t0, "a"), (t0, "b"), (t0, "a"))
      q.processAllAvailable()
      // listener events are async — poll for delivery
      var tries = 0
      while (c.snapshot.forall(_.inputRows == 0) && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val ps = c.snapshot
      assert(ps.nonEmpty, "no progress captured")
      assert(ps.map(_.inputRows).sum == 3, s"input rows: $ps")
      assert(ps.exists(_.stateRows > 0), s"stateful agg must report state rows: $ps")
      assert(c.toJson.startsWith("[{\"query\":"))
    } finally {
      q.stop()
      spark.streams.removeListener(c)
    }
  }

  test("J7 late rows dropped by the watermark are counted and excluded from output") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val c = Monitor.registerStreaming(spark)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData((ts(0), "a")); q.processAllAvailable()
      // advance the watermark far past the first window...
      mem.addData((ts(60), "b")); q.processAllAvailable()
      // ...then inject a row 60 min late: it must be DROPPED, and the
      // drop must be OBSERVABLE (silent late-drop = silent data loss)
      mem.addData((ts(1), "a")); q.processAllAvailable()
      mem.addData((ts(61), "b")); q.processAllAvailable()
      var tries = 0
      while (c.snapshot.map(_.droppedByWatermark).sum == 0 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(c.snapshot.map(_.droppedByWatermark).sum == 1,
        s"expected exactly the late row counted: ${c.snapshot}")
      val emitted = spark.table("late_out").select("k", "n")
        .as[(String, Long)].collect().toSet
      // window(0-5, a) closed with ONE row — the late second 'a' is out
      assert(emitted.contains(("a", 1L)), s"emitted: $emitted")
    } finally {
      q.stop()
      spark.streams.removeListener(c)
    }
  }

  test("J3 task tracker attributes shuffle bytes to a bracketed query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = graft.monitor.Monitor.registerTasks(spark)
    try {
      // listener-bus delivery is async: poll the delta until the
      // shuffle bytes land (bounded)
      def settledDelta(): graft.monitor.Monitor.TaskBytes = {
        var last = t.totals
        var stable = 0
        var tries = 0
        while (stable < 3 && tries < 100) {
          Thread.sleep(50)
          val now = t.totals
          if (now == last) stable += 1 else { stable = 0; last = now }
          tries += 1
        }
        t.delta()
      }
      t.delta() // reset mark
      // a genuine shuffle: wide groupBy with broadcast disabled
      noBroadcast {
        spark.range(0, 100000).select((col("id") % 997).as("k"), col("id"))
          .repartition(8)
          .groupBy("k").agg(sum(col("id"))).write.format("noop").mode("overwrite").save()
      }
      val d = settledDelta()
      assert(d.shuffleWrite > 0, s"groupBy must write shuffle bytes: $d")
      assert(d.shuffleRead > 0, s"groupBy must read shuffle bytes: $d")
      // a narrow map-only job moves nothing
      spark.range(0, 1000).select(col("id") + 1)
        .write.format("noop").mode("overwrite").save()
      val d2 = settledDelta()
      assert(d2.shuffleWrite == 0, s"map-only job must not shuffle: $d2")
    } finally spark.sparkContext.removeSparkListener(t)
  }
}

class PlanAuditSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("J5 audit counts exchanges, codegen spans, and scan pushdown on a real star join") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 45)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
    val a = graft.monitor.PlanAudit.audit(li)
    assert(a.shuffleExchanges == 1, s"one agg shuffle expected: $a")
    assert(a.wholeStageSpans >= 1, s"agg must run codegen'd: $a")
    assert(a.fileScans == 1 && a.scansWithPushedFilters == 1,
      s"the quantity filter must reach the scan: $a")
    assert(a.readColumns == 2, s"pruned read schema expected: $a")
    assert(a.smells.isEmpty, s"clean plan must report no smells: ${a.smells}")
    // r16 verdict #7: file-layout telemetry — the scan must report how
    // many files (and bytes) it actually planned over, the counter
    // that would have named the one-file-per-bucket layout shift in
    // one artifact diff
    assert(a.filesRead >= 1, s"scan must report planned files: $a")
    assert(a.bytesRead > 0, s"scan must report planned bytes: $a")
  }

  test("J5 audit sees the broadcast side of a dim join") {
    val j = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    val a = graft.monitor.PlanAudit.audit(j)
    assert(a.broadcastExchanges == 1, s"nation must broadcast: $a")
  }

  test("J5 pushdown smell precision (r17 verdict #4): corpus-semantics full reads are clean; a genuinely unpushed selective filter trips") {
    // 1. a query whose SEMANTIC input is the whole table — no data
    // filter targets the scan, so nothing could have been pushed:
    // clean, not a buried benign hit
    val full = graft.Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val aFull = graft.monitor.PlanAudit.audit(full)
    assert(aFull.unpushedDataFilterScans == 0 &&
      !aFull.smells.exists(_.contains("pushdown")),
      s"a full-corpus aggregation must not smell: ${aFull.smells}")
    // 2. a selective filter that DOES push: clean
    val pushed = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10)
    val aPushed = graft.monitor.PlanAudit.audit(pushed)
    assert(aPushed.scansWithPushedFilters == 1 &&
      aPushed.unpushedDataFilterScans == 0, s"$aPushed")
    // 3. a DELIBERATELY unpushable selective filter (a black-box UDF —
    // no conjunct translates to a source filter): the genuine miss the
    // smell exists for
    val opaque = udf((id: Long) => id < 10)
    val missed = graft.Tables.documents(spark, sfDir)
      .filter(opaque(col("doc_id")))
    val aMissed = graft.monitor.PlanAudit.audit(missed)
    assert(aMissed.unpushedDataFilterScans == 1,
      s"the unpushed filter must be counted: $aMissed")
    assert(aMissed.smells.exists(_.contains("pushdown miss")),
      s"and smelled: ${aMissed.smells}")
    // 4. the two NEVER-actionable conjunct classes stay clean: a
    // uniform-hash split predicate (no source filter can prune a
    // uniform hash) and a derived-expression null guard (join/agg
    // artifact, zero selectivity)
    val hashSplit = graft.Tables.documents(spark, sfDir)
      .filter(conv(substring(md5(concat(lit("split|"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("int") < 6554)
    val aHash = graft.monitor.PlanAudit.audit(hashSplit)
    assert(aHash.unpushedDataFilterScans == 0,
      s"a deterministic hash split is unpushable BY DESIGN, not a miss: $aHash")
    val guarded = graft.Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
      .join(graft.Tables.documents(spark, sfDir)
        .select(md5(col("text")).as("h")), "h")
    val aGuard = graft.monitor.PlanAudit.audit(guarded)
    assert(aGuard.unpushedDataFilterScans == 0,
      s"isnotnull(md5(..)) join guards are artifacts, not misses: $aGuard")
  }

  test("J5 single-partition telemetry: global agg is benign, global window is heavy (r11)") {
    // a global scalar aggregate's final combine IS a single-partition
    // exchange, but it moves one partial row per upstream partition —
    // counted, never smelled
    val agg = graft.Tables.lineitem(spark, sfDir)
      .agg(sum("l_quantity").as("q"))
    val aAgg = graft.monitor.PlanAudit.audit(agg)
    assert(aAgg.singlePartitionExchanges >= 1,
      s"the final combine is single-partition: $aAgg")
    assert(aAgg.singlePartitionHeavy == 0,
      s"a two-phase global agg must not smell: $aAgg")
    assert(!aAgg.smells.exists(_.contains("single-partition")), s"${aAgg.smells}")
    // a no-partition window collapses the WHOLE frame into one task —
    // the vdict-class scale killer the smell exists for
    val w = graft.Tables.lineitem(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("l_orderkey")))
    val aWin = graft.monitor.PlanAudit.audit(w)
    assert(aWin.singlePartitionHeavy >= 1,
      s"the global window must count as heavy: $aWin")
    assert(aWin.smells.exists(_.contains("single-partition")), s"${aWin.smells}")
  }
}

class PlanAuditSubquerySpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("J5 audit counts scans inside expression-held subquery plans") {
    // scalar subquery over parquet: its scan lives under
    // p.subqueries, not p.children — a children-only walk missed it
    graft.Graft.registerSql(spark, sfDir)
    val df = spark.sql(
      """SELECT c_custkey FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)""".stripMargin)
    val a = graft.monitor.PlanAudit.audit(df)
    assert(a.fileScans >= 2,
      s"outer scan AND the scalar-subquery scan must both be counted: $a")
  }
}

class QualityKanonSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("J10 k-anonymity: at-risk flags on k<K, rescued only when source-generalization lifts the class past K") {
    // en/bucket0: 3 sources with k=2 each → every class at-risk, but
    //   the generalized (en, 0) class has k_gen=6 ≥ 5 → rescued.
    // de/bucket0: one source with k=2 → at-risk AND NOT rescued
    //   (k_gen=2: coarsening cannot save it; suppression territory).
    // fr/bucket1: k=5 → not at risk at all.
    val rows =
      (1 to 2).map(i => (s"a$i", "en", "s1", 10L)) ++
      (1 to 2).map(i => (s"b$i", "en", "s2", 20L)) ++
      (1 to 2).map(i => (s"c$i", "en", "s3", 30L)) ++
      (1 to 2).map(i => (s"d$i", "de", "s1", 40L)) ++
      (1 to 5).map(i => (s"e$i", "fr", "s1", 150L))
    val d = rows.zipWithIndex
      .map { case ((t, l, s, n), i) => (i.toLong, t, l, s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_kanon").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = QualityQueries.dqKanon(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out(("en", "s1")) == ((2L, 1, 1)), s"$out")
    assert(out(("en", "s2")) == ((2L, 1, 1)), s"$out")
    assert(out(("en", "s3")) == ((2L, 1, 1)), s"$out")
    assert(out(("de", "s1")) == ((2L, 1, 0)),
      s"no sibling sources to generalize into: $out")
    assert(out(("fr", "s1")) == ((5L, 0, 0)), s"$out")
  }
}
