package graft.store

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** K23: planner-integrated file skipping through [[GraftFileIndex]].
  * The load-bearing claims: (1) a plain `df.filter(...)` — no explicit
  * prune call — shrinks the planned file set; (2) results are
  * identical to the unindexed read for every predicate shape,
  * including ones the index cannot prune (conservative keep); (3) the
  * scan underneath is still Spark's own parquet source (vectorized
  * reader, pushdown intact). */
class FileIndexSpec extends SparkSpec {

  private lazy val table: String = {
    import spark.implicits._
    val df = (0L until 4000L)
      .map(k => (k, s"s${k / 1000}", java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(10000 + k / 100))))
      .toDF("k", "grp", "d")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
    SnapshotStore.commitOverwrite("fidx", df)
    "fidx"
  }

  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s.metrics("numFiles").value }.get
  }

  test("K23 a plain filter prunes files at planning time; results match unindexed") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    assert(idx.totalFiles == 8)
    val pruned = df.filter(col("k") >= 500 && col("k") < 900)
    val got = pruned.agg(count(lit(1)), sum("k")).collect().head
    // oracle by closed form: sum(500..899) = (500+899)*400/2
    assert(got.getLong(0) == 400L && got.getLong(1) == (500L + 899L) * 400L / 2L)
    assert(idx.lastKept.get() < idx.totalFiles,
      s"expected pruning, kept ${idx.lastKept.get()}/${idx.totalFiles}")
    assert(scanFileCount(pruned) == idx.lastKept.get().toLong)
  }

  test("K23 equality on a range-clustered key plans a single file") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    assert(df.filter(col("k") === 1234).count() == 1L)
    assert(idx.lastKept.get() == 1)
  }

  test("K23 IN-list keeps only the files containing the listed keys") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    assert(df.filter(col("k").isin(10L, 3990L)).count() == 2L)
    assert(idx.lastKept.get() <= 2)
  }

  test("K23 string and date zone columns prune too") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("grp", "d"))
    assert(df.filter(col("grp") === "s3").count() == 1000L)
    assert(idx.lastKept.get() <= 2, s"kept ${idx.lastKept.get()}")
    val dayOne = df.filter(col("d") === java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(10001)))
    assert(dayOne.count() == 100L)
    assert(idx.lastKept.get() <= 1)
  }

  test("K23 unprunable predicates keep every file but stay correct") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    // k % 1000 is not a zone-checkable shape → conservative keep-all
    assert(df.filter(col("k") % 1000 === 7).count() == 4L)
    assert(idx.lastKept.get() == idx.totalFiles)
    // disjunction spanning two zones keeps (at least) both, not all
    assert(df.filter(col("k") === 5 || col("k") === 3999).count() == 2L)
    assert(idx.lastKept.get() <= 2)
  }

  test("K23 filter on a column WITHOUT zone stats keeps all files, correct rows") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    assert(df.filter(col("grp") === "s0").count() == 1000L)
    assert(idx.lastKept.get() == idx.totalFiles)
  }

  test("K23 an empty survivor set yields zero rows without scanning") {
    val (idx, df) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    val out = df.filter(col("k") > 100000)
    assert(out.count() == 0L)
    assert(idx.lastKept.get() == 0)
  }

  test("K22/K23 equality on a bloom-indexed UNCLUSTERED column plans ~1 file") {
    import spark.implicits._
    // time-clustered layout, needle lookups on uid: every (min,max)
    // uid zone spans the whole domain, so only the Bloom can prune
    val df = (0L until 4000L)
      .map(k => (k, (k * 2654435761L) % 4000L, s"p${k % 7}"))
      .toDF("t", "uid", "payload")
      .repartitionByRange(8, col("t"))
      .sortWithinPartitions("t")
    SnapshotStore.commitOverwrite("fidx_bloom", df)
    val (idx, indexed) = SnapshotStore.readIndexed(spark, "fidx_bloom",
      zoneCols = Seq("t"), bloomCols = Seq("uid"))
    assert(idx.totalFiles == 8)
    val needle = (123L * 2654435761L) % 4000L
    val hit = indexed.filter(col("uid") === needle)
    assert(hit.select("t").as[Long].collect().toSeq == Seq(123L))
    assert(idx.lastKept.get() <= 2, s"kept ${idx.lastKept.get()}/8")
    assert(scanFileCount(hit) == idx.lastKept.get().toLong)
    // an absent key prunes everything (no false negatives either way)
    assert(indexed.filter(col("uid") === 999999L).count() == 0L)
    assert(idx.lastKept.get() <= 1)
    // IN over two needles keeps at most their files (+FP allowance)
    val two = indexed.filter(col("uid").isin(needle, (3777L * 2654435761L) % 4000L))
    assert(two.count() == 2L && idx.lastKept.get() <= 3)
    // zone + bloom compose: t-range AND uid-equality prune to ≤1 file
    val both = indexed.filter(col("t") < 1000L && col("uid") === needle)
    assert(both.count() == 1L && idx.lastKept.get() <= 1)
  }

  test("K42 readZoned prunes from MANIFEST per-file stats with zero index-build scan") {
    import spark.implicits._
    val name = "fidx_zoned"
    // two appends of disjoint k-ranges, each range-clustered into
    // files — zones land in each commit's #fstats header and resolve
    // across the delta chain
    SnapshotStore.commitAppend(name, (0L until 2000L).map(k => (k, s"g${k / 500}"))
      .toDF("k", "grp").repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    SnapshotStore.commitAppend(name, (2000L until 4000L).map(k => (k, s"g${k / 500}"))
      .toDF("k", "grp").repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    val (idx, df) = SnapshotStore.readZoned(spark, name)
    assert(idx.totalFiles == 8)
    // numeric zone prune across the chain: a narrow k-range from the
    // SECOND commit's files keeps a strict subset
    val narrow = df.filter(col("k") >= 2500 && col("k") < 2600)
    assert(narrow.count() == 100L, "zoned read must return exact rows")
    assert(idx.lastKept.get() < idx.totalFiles,
      s"manifest zones must prune (kept ${idx.lastKept.get()} of ${idx.totalFiles})")
    // string zones prune too; results equal the plain snapshot read
    val s = df.filter(col("grp") === "g1").count()
    assert(s == SnapshotStore.read(spark, name).filter(col("grp") === "g1").count())
    // conservative: an unprunable predicate keeps everything and stays correct
    assert(df.filter(col("k") % 7 === 0).count() ==
      SnapshotStore.read(spark, name).filter(col("k") % 7 === 0).count())
  }

  test("K23 the indexed read is immune to later commits (snapshot semantics)") {
    import spark.implicits._
    val before = SnapshotStore.readIndexed(spark, table, Seq("k"))._2
    SnapshotStore.commitAppend(table, Seq((999999L, "zz", java.sql.Date.valueOf("2020-01-01"))).toDF("k", "grp", "d"))
    assert(before.count() == 4000L)
    val (_, after) = SnapshotStore.readIndexed(spark, table, Seq("k"))
    assert(after.count() == 4001L)
  }
}
