package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class SnapshotStoreSpec extends SparkSpec {

  private def rows(name: String, v: Option[Long] = None): Set[(Long, String)] =
    SnapshotStore.read(spark, name, v).collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("s")))).toSet

  test("K20 append commits accumulate; each version stays readable") {
    import spark.implicits._
    val v0 = SnapshotStore.commitAppend("t1", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val v1 = SnapshotStore.commitAppend("t1", Seq((3L, "c")).toDF("k", "s"))
    assert((v0, v1) == ((0L, 1L)))
    assert(rows("t1") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows("t1", Some(0L)) == Set((1L, "a"), (2L, "b")))
  }

  test("K20 overwrite starts a fresh version but old snapshots survive") {
    import spark.implicits._
    SnapshotStore.commitAppend("t2", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("t2", Seq((2L, "b")).toDF("k", "s"))
    val v2 = SnapshotStore.commitOverwrite("t2", Seq((9L, "z")).toDF("k", "s"))
    assert(v2 == 2L)
    assert(rows("t2") == Set((9L, "z")))
    assert(rows("t2", Some(1L)) == Set((1L, "a"), (2L, "b")))
    assert(SnapshotStore.versions("t2") == Seq(0L, 1L, 2L))
  }

  test("K20 a snapshot plan is immune to commits made after it was built") {
    import spark.implicits._
    SnapshotStore.commitAppend("t3", Seq((1L, "a")).toDF("k", "s"))
    val snap = SnapshotStore.read(spark, "t3")
    SnapshotStore.commitAppend("t3", Seq((2L, "b")).toDF("k", "s"))
    assert(snap.count() == 1L) // the old file list, not the new table
    assert(rows("t3") == Set((1L, "a"), (2L, "b")))
  }

  test("K45 AS-OF-TIMESTAMP reads resolve to the version visible at that instant") {
    import spark.implicits._
    val name = "asof_ts_t"
    SnapshotStore.commitAppend(name, Seq((1L, "a")).toDF("k", "s"))
    Thread.sleep(15) // strictly between the two commit clocks
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotStore.commitAppend(name, Seq((2L, "b")).toDF("k", "s"))
    val vs = SnapshotStore.versions(name)
    // every commit recorded its wall clock, monotonically
    val times = vs.map(v => SnapshotStore.commitTimeOf(name, v)
      .getOrElse(fail(s"v$v missing #at")))
    assert(times == times.sorted && times.head < mid && times.last > mid)
    assert(SnapshotStore.versionAt(name, mid).contains(vs.head))
    assert(SnapshotStore.readAsOf(spark, name, mid).count() == 1L,
      "the mid-instant read must see only the first commit")
    assert(SnapshotStore.readAsOf(spark, name,
      System.currentTimeMillis()).count() == 2L)
    // before the table existed: no version
    assert(SnapshotStore.versionAt(name, times.head - 1).isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, name, times.head - 1)
    }
  }

  test("K42/K44 vacuum's checkpoint rewrite carries the RESOLVED zone and detail maps") {
    import spark.implicits._
    val name = "vac_detail_t"
    // v0 full + v1/v2 deltas (interval 10): each delta's #fstats/
    // #fdetail cover only ITS files — resolution rides #prev
    SnapshotStore.commitAppend(name, (1L to 100L).map(i => (i, i % 5)).toDF("k", "g"))
    SnapshotStore.commitAppend(name, (101L to 200L).map(i => (i, i % 5)).toDF("k", "g"))
    SnapshotStore.commitAppend(name, (201L to 300L).map(i => (i, i % 5)).toDF("k", "g"))
    val last = SnapshotStore.versions(name).last
    val zonesBefore = SnapshotStore.fileZonesOf(name, last)
    val detailBefore = SnapshotStore.fileDetailsOf(name, last)
    assert(detailBefore.size == SnapshotStore.files(name, last).size,
      "every file must carry detail before the vacuum")
    // keep=2 drops v0 → v1's #prev leaves the kept set → v1 is
    // rewritten as a full checkpoint; without resolved maps the
    // rewrite would silently lose v0's files' zones/detail
    SnapshotStore.vacuum(name, keep = 2)
    assert(SnapshotStore.fileZonesOf(name, last) == zonesBefore,
      "zone map must survive the rewrite RESOLVED")
    assert(SnapshotStore.fileDetailsOf(name, last) == detailBefore,
      "detail map must survive the rewrite RESOLVED")
    // and the consumers still see exactness: deep fsck reconciles all
    val rr = SnapshotStore.fsckRows(spark, name)
    assert(rr.size == SnapshotStore.files(name, last).size && rr.forall(_.ok))
  }

  test("K46 deep fsck catches a silently swapped data file that plain fsck passes") {
    import spark.implicits._
    val name = "fsck_rows_t"
    SnapshotStore.commitAppend(name, (1L to 100L).map(i => (i, i % 7)).toDF("k", "g"))
    // healthy: every file reconciles
    val before = SnapshotStore.fsckRows(spark, name)
    assert(before.nonEmpty && before.forall(_.ok))
    // silently SWAP one referenced file with a different-row-count
    // parquet file under the same name (rewrite-in-place incident)
    val victim = new org.apache.hadoop.fs.Path(
      SnapshotStore.files(name, SnapshotStore.versions(name).last).head)
    val tmpDir = victim.getParent.suffix("_swap")
    Seq((999L, 0L)).toDF("k", "g").coalesce(1)
      .write.mode("overwrite").parquet(tmpDir.toString)
    val fs = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newFile = fs.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.delete(victim, false)
    assert(fs.rename(newFile, victim))
    // existence-only fsck still passes; the deep fsck flags the swap
    val shallow = SnapshotStore.fsck(name)
    assert(shallow.forall(r => r.chainOk && r.nMissing == 0),
      "plain fsck must NOT see the swap (the gap K46 exists to close)")
    val after = SnapshotStore.fsckRows(spark, name)
    val bad = after.filter(!_.ok)
    assert(bad.size == 1 && bad.head.footerRows == 1L &&
      bad.head.manifestRows > 1L,
      s"the swapped file must reconcile false: $after")
  }

  test("K27 keyed diff classifies insert/delete/update and skips unchanged") {
    import spark.implicits._
    SnapshotStore.commitOverwrite("tdiff",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"))
    SnapshotStore.commitOverwrite("tdiff",
      Seq((1L, "a", 10L), (2L, "b", 99L), (4L, "d", 40L)).toDF("k", "s", "v"))
    val d = SnapshotStore.diff(spark, "tdiff", 0L, 1L, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(d == Set(
      ("update", 2L, "b", 99L),   // v2 image
      ("delete", 3L, "c", 30L),   // v1 image
      ("insert", 4L, "d", 40L)))  // key 1 unchanged → absent
  }

  test("K20 unknown table / version fail loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] { SnapshotStore.read(spark, "nope") }
    SnapshotStore.commitAppend("t4", Seq((1L, "a")).toDF("k", "s"))
    intercept[IllegalArgumentException] { SnapshotStore.read(spark, "t4", Some(7L)) }
  }

  test("K20/I30 replayed stream batch publishes no second version and no duplicate rows") {
    import spark.implicits._
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val b1 = Seq((3L, "c")).toDF("k", "s")
    val v0 = SnapshotStore.commitStreamBatch("st1", b0, batchId = 0L)
    val v0r = SnapshotStore.commitStreamBatch("st1", b0, batchId = 0L) // replay
    val v1 = SnapshotStore.commitStreamBatch("st1", b1, batchId = 1L)
    assert(v0 == v0r && v1 == v0 + 1)
    assert(SnapshotStore.versions("st1") == Seq(0L, 1L))
    assert(rows("st1") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(SnapshotStore.batchIdOf("st1", v1).contains(1L))
  }

  test("K20/I30 a real stream lands exactly-once through the foreachBatch sink") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q = mem.toDF().toDF("k", "s").writeStream
      .outputMode("append")
      .foreachBatch(SnapshotStore.streamSink("st2") _)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    assert(rows("st2") == Set((1L, "a"), (2L, "b")))
    assert(SnapshotStore.versions("st2").nonEmpty)
  }

  test("K20 vacuum drops old versions and their unreferenced files; survivors intact") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    SnapshotStore.commitAppend("t6", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitOverwrite("t6", Seq((2L, "b")).toDF("k", "s"))
    SnapshotStore.commitAppend("t6", Seq((3L, "c")).toDF("k", "s"))
    def dataFiles: Long = {
      val dir = Paths.get(SnapshotStore.read(spark, "t6").inputFiles.head
        .stripPrefix("file:")).getParent.getParent
      Files.walk(dir).iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val before = dataFiles
    SnapshotStore.vacuum("t6", keep = 2)
    assert(SnapshotStore.versions("t6") == Seq(1L, 2L))
    assert(rows("t6") == Set((2L, "b"), (3L, "c")))
    assert(rows("t6", Some(1L)) == Set((2L, "b")))
    assert(dataFiles < before, "v0's overwritten files must be deleted")
    intercept[IllegalArgumentException] { SnapshotStore.read(spark, "t6", Some(0L)) }
  }

  test("K20 schema evolution: appended column visible, pre-evolution rows null it") {
    import spark.implicits._
    SnapshotStore.commitAppend("t7", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("t7",
      Seq((2L, "b", 7.5)).toDF("k", "s", "score"))
    val latest = SnapshotStore.read(spark, "t7").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(latest == Set((1L, "a", None), (2L, "b", Some(7.5))))
    // the pre-evolution snapshot has no score column at all
    assert(SnapshotStore.read(spark, "t7", Some(0L))
      .schema.fieldNames.toSeq == Seq("k", "s"))
    // a type change on an existing column fails loudly
    intercept[IllegalArgumentException] {
      SnapshotStore.commitAppend("t7", Seq(("x", "c")).toDF("k", "s"))
    }
  }

  test("K20/I31 CDC merge-apply: upsert existing, insert new, delete, one atomic version") {
    import spark.implicits._
    SnapshotStore.commitAppend("t8",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
    val changes = Seq(
      (2L, "B2", "upsert"),  // update existing key
      (4L, "d", "upsert"),   // brand-new key
      (3L, null.asInstanceOf[String], "delete"), // key-only delete
    ).toDF("k", "s", "op")
    val v = SnapshotStore.applyChanges(spark, "t8", changes, Seq("k"))
    assert(v == 1L)
    assert(rows("t8") == Set((1L, "a"), (2L, "B2"), (4L, "d")))
    // pre-merge snapshot untouched
    assert(rows("t8", Some(0L)) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("K20 filters still push down through a snapshot read") {
    import spark.implicits._
    SnapshotStore.commitAppend("t5", (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"))
    val df = SnapshotStore.read(spark, "t5").filter(col("k") === 42L)
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan parquet")).getOrElse("")
    assert(scan.contains("PushedFilters:") && scan.contains("EqualTo(k,42"), scan)
    assert(df.count() == 1L)
  }

  test("K28 append manifests are delta-encoded; checkpoints bound the chain; vacuum repairs it") {
    import spark.implicits._
    SnapshotStore.setCheckpointInterval(4)
    try {
      (0 until 10).foreach(i =>
        SnapshotStore.commitAppend("t9", Seq((i.toLong, s"s$i")).toDF("k", "s")))
      // every version resolves to its full prefix
      (0 until 10).foreach { i =>
        assert(SnapshotStore.files("t9", i.toLong).size == i + 1, s"v$i")
        assert(rows("t9", Some(i.toLong)) ==
          (0 to i).map(j => (j.toLong, s"s$j")).toSet, s"v$i")
      }
      // delta manifests carry ONE file; checkpoints (v0, v4, v8) are full
      val manifestsDir = java.nio.file.Paths.get(
        new java.net.URI(SnapshotStore.files("t9", 9L).head).getPath)
        .getParent.getParent.resolve("_manifests")
      def manifestDataLines(v: Long): Int =
        java.nio.file.Files.readAllLines(
          manifestsDir.resolve(f"v$v%06d.txt")).asScala
          .count(l => l.nonEmpty && !l.startsWith("#"))
      assert(manifestDataLines(4L) == 5 && manifestDataLines(8L) == 9)
      assert(manifestDataLines(3L) == 1 && manifestDataLines(9L) == 1)
      // vacuum drops v0..v6; v7 (a delta) must be rewritten as a full
      // checkpoint so the kept chain never dangles
      SnapshotStore.vacuum("t9", keep = 3)
      assert(SnapshotStore.versions("t9") == Seq(7L, 8L, 9L))
      assert(rows("t9", Some(7L)) == (0 to 7).map(j => (j.toLong, s"s$j")).toSet)
      assert(rows("t9", Some(9L)) == (0 to 9).map(j => (j.toLong, s"s$j")).toSet)
      assert(manifestDataLines(7L) == 8) // now a checkpoint
    } finally SnapshotStore.setCheckpointInterval(10)
  }

  test("K29 write-audit-publish: a failing audit aborts invisibly; a passing one lands atomically") {
    import spark.implicits._
    SnapshotStore.commitAppend("twap", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    // stage a BAD batch (null key) — the audit rejects it
    val bad = SnapshotStore.stage("twap",
      Seq((Option.empty[Long], "x"), (Some(3L), "c")).toDF("k", "s"))
    // audit runs against the would-be table: current ++ staged bytes
    val preview = SnapshotStore.stagedRead(spark, bad)
    assert(preview.count() == 4L)
    val nulls = preview.filter(col("k").isNull).count()
    assert(nulls == 1L)
    SnapshotStore.abort(bad)
    // the table never saw the staged batch; no version was created
    assert(SnapshotStore.versions("twap") == Seq(0L))
    assert(rows("twap") == Set((1L, "a"), (2L, "b")))
    // stage a GOOD batch; audit passes; publish is one atomic version
    val good = SnapshotStore.stage("twap", Seq((3L, "c")).toDF("k", "s"))
    assert(SnapshotStore.stagedRead(spark, good).filter(col("k").isNull).count() == 0L)
    // a concurrent commit lands BETWEEN stage and publish — publish
    // must resolve its version and carry-forward list at publish time
    SnapshotStore.commitAppend("twap", Seq((9L, "z")).toDF("k", "s"))
    val v = SnapshotStore.publish(good)
    assert(v == 2L)
    assert(rows("twap") == Set((1L, "a"), (2L, "b"), (9L, "z"), (3L, "c")))
    // published staged files live in the versioned data area
    assert(SnapshotStore.files("twap", v).forall(_.contains("data_v")))
  }

  test("K31 tags pin versions by name and protect them from vacuum") {
    import spark.implicits._
    SnapshotStore.setCheckpointInterval(4)
    try {
      (0 until 10).foreach(i =>
        SnapshotStore.commitAppend("ttag", Seq((i.toLong, s"s$i")).toDF("k", "s")))
      // pin v2 (a delta deep in the droppable prefix) as "run-17"
      assert(SnapshotStore.tag("ttag", "run-17", Some(2L)) == 2L)
      assert(SnapshotStore.tag("ttag", "latest") == 9L) // defaults to last
      assert(SnapshotStore.tags("ttag") == Map("run-17" -> 2L, "latest" -> 9L))
      assert(SnapshotStore.readTag(spark, "ttag", "run-17").count() == 3L)
      // vacuum keep-2 must preserve v2 (tagged) alongside v8,v9 — and
      // repair BOTH dangling chains (v2→v1 dropped, v8→v7 dropped)
      SnapshotStore.vacuum("ttag", keep = 2)
      assert(SnapshotStore.versions("ttag") == Seq(2L, 8L, 9L))
      assert(SnapshotStore.readTag(spark, "ttag", "run-17")
        .as[(Long, String)].collect().toSet ==
        (0 to 2).map(j => (j.toLong, s"s$j")).toSet)
      assert(SnapshotStore.read(spark, "ttag", Some(9L)).count() == 10L)
      // untag → the next vacuum reclaims it
      SnapshotStore.deleteTag("ttag", "run-17")
      SnapshotStore.vacuum("ttag", keep = 2)
      assert(SnapshotStore.versions("ttag") == Seq(8L, 9L))
      intercept[IllegalArgumentException] {
        SnapshotStore.readTag(spark, "ttag", "run-17")
      }
    } finally SnapshotStore.setCheckpointInterval(10)
  }

  test("K31 a half-published tag (crash between delete and rename) recovers and still pins vacuum") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    (0 until 4).foreach(i =>
      SnapshotStore.commitAppend("ttagcrash", Seq((i.toLong, s"s$i")).toDF("k", "s")))
    // derive the table layout from a data file path (the dirs are
    // private): <base>/<name>/data_vN/part…
    val dataFile = new Path(SnapshotStore.files("ttagcrash", 0L).head)
    val tableDir = dataFile.getParent.getParent
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tagsDir = new Path(tableDir, "_tags")
    fs.mkdirs(tagsDir)
    // simulate tag()'s crash window: only the tmp exists
    val tmp = new Path(tagsDir, ".pinned.tmp")
    val out = fs.create(tmp, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    // tags() finishes the publish; the version stays vacuum-protected
    assert(SnapshotStore.tags("ttagcrash") == Map("pinned" -> 1L))
    assert(fs.exists(new Path(tagsDir, "pinned.txt")) && !fs.exists(tmp),
      "recovery must complete the rename")
    SnapshotStore.vacuum("ttagcrash", keep = 1)
    assert(SnapshotStore.versions("ttagcrash").contains(1L),
      "the recovered tag must protect its version from vacuum")
    assert(SnapshotStore.readTag(spark, "ttagcrash", "pinned").count() == 2L)
  }

  test("K28 an interrupted vacuum checkpoint rewrite (surviving .ckpt.tmp) recovers on read") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    (0 until 3).foreach(i =>
      SnapshotStore.commitAppend("tckptcrash", Seq((i.toLong, s"s$i")).toDF("k", "s")))
    val dataFile = new Path(SnapshotStore.files("tckptcrash", 0L).head)
    val mdir = new Path(dataFile.getParent.getParent, "_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: v2's full manifest exists only as the
    // checkpoint tmp (delete happened, rename did not)
    val target = new Path(mdir, "v000002.txt")
    val lines = {
      val in = fs.open(target)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val tmp = new Path(mdir, ".v2.ckpt.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    fs.delete(target, false)
    // versions() lists the tmp-only version; the first read finishes
    // the publish and the table state is intact
    assert(SnapshotStore.versions("tckptcrash") == Seq(0L, 1L, 2L))
    assert(SnapshotStore.read(spark, "tckptcrash", Some(2L)).count() == 3L)
    assert(fs.exists(target) && !fs.exists(tmp),
      "recovery must complete the rename")
  }

  test("K32 restore publishes a new version referencing the old files; history survives") {
    import spark.implicits._
    SnapshotStore.commitAppend("trst", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    SnapshotStore.commitAppend("trst", Seq((3L, "c")).toDF("k", "s"))       // v1
    SnapshotStore.commitOverwrite("trst", Seq((9L, "z")).toDF("k", "s"))    // v2
    val v3 = SnapshotStore.restore("trst", 1L)
    assert(v3 == 3L)
    // head content == v1 content, nothing copied (same file paths)
    assert(rows("trst") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(SnapshotStore.files("trst", 3L).toSet ==
      SnapshotStore.files("trst", 1L).toSet)
    // the bad overwrite stays readable as history
    assert(rows("trst", Some(2L)) == Set((9L, "z")))
    // the rollback is itself a commit: restore the restore
    val v4 = SnapshotStore.restore("trst", 2L)
    assert(v4 == 4L && rows("trst") == Set((9L, "z")))
    // tag-addressed restore (K32 over K31)
    SnapshotStore.tag("trst", "good", Some(1L))
    assert(SnapshotStore.restoreTag("trst", "good") == 5L)
    assert(rows("trst") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // vacuum keep-2 retains the restored head's files (referenced-file
    // rule) even though v0/v1 manifests drop
    SnapshotStore.deleteTag("trst", "good")
    SnapshotStore.vacuum("trst", keep = 2)
    assert(SnapshotStore.versions("trst") == Seq(4L, 5L))
    assert(rows("trst") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] { SnapshotStore.restore("trst", 0L) }
  }

  test("K33 fastCount answers from footers and matches a real count at every version") {
    import spark.implicits._
    SnapshotStore.commitAppend("tfc", (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"))
    SnapshotStore.commitAppend("tfc", (101L to 130L).map(i => (i, s"s$i")).toDF("k", "s"))
    SnapshotStore.commitOverwrite("tfc", (1L to 7L).map(i => (i, s"s$i")).toDF("k", "s"))
    assert(SnapshotStore.fastCount(spark, "tfc", Some(0L)) == 100L)
    assert(SnapshotStore.fastCount(spark, "tfc", Some(1L)) == 130L)
    assert(SnapshotStore.fastCount(spark, "tfc") == 7L)
    // agrees with the scan across the whole history, incl. a restore
    SnapshotStore.restore("tfc", 1L)
    (0L to 3L).foreach { v =>
      assert(SnapshotStore.fastCount(spark, "tfc", Some(v)) ==
        SnapshotStore.read(spark, "tfc", Some(v)).count())
    }
    intercept[IllegalArgumentException] { SnapshotStore.fastCount(spark, "nope") }
  }

  test("K35 shallow clone: zero-copy, divergent histories, clone vacuum never touches source") {
    import spark.implicits._
    SnapshotStore.commitAppend("tsrc", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    SnapshotStore.commitAppend("tsrc", Seq((3L, "c")).toDF("k", "s"))     // v1
    val v0 = SnapshotStore.cloneTable("tsrc", "tclone")
    assert(v0 == 0L)
    // same rows, same underlying files (no copy)
    assert(rows("tclone") == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(SnapshotStore.files("tclone", 0L).toSet ==
      SnapshotStore.files("tsrc", 1L).toSet)
    // histories diverge independently
    SnapshotStore.commitAppend("tclone", Seq((9L, "z")).toDF("k", "s"))
    SnapshotStore.commitAppend("tsrc", Seq((4L, "d")).toDF("k", "s"))
    assert(rows("tclone") == Set((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")))
    assert(rows("tsrc") == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // the clone's vacuum GCs only its own data dirs: source intact
    SnapshotStore.vacuum("tclone", keep = 1)
    assert(rows("tsrc") == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(rows("tclone") == Set((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")))
    intercept[IllegalArgumentException] { SnapshotStore.cloneTable("tsrc", "tclone") }
    intercept[IllegalArgumentException] { SnapshotStore.cloneTable("nope", "t2") }
  }

  test("K38 vacuum dry run predicts exactly what the real vacuum then drops") {
    import spark.implicits._
    SnapshotStore.commitAppend("tdry", Seq((0L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("tdry", Seq((1L, "b")).toDF("k", "s"))
    // the overwrite orphans v0/v1's files once their manifests drop
    SnapshotStore.commitOverwrite("tdry", Seq((2L, "c")).toDF("k", "s"))
    SnapshotStore.commitAppend("tdry", Seq((3L, "d")).toDF("k", "s"))
    SnapshotStore.commitAppend("tdry", Seq((4L, "e")).toDF("k", "s"))
    val plan = SnapshotStore.vacuumDryRun("tdry", keep = 2)
    // kept {3,4} resolve through the v2 overwrite → v0/v1 data files
    // are the victims
    assert(plan.dropVersions == Seq(0L, 1L, 2L))
    assert(plan.dropFiles.nonEmpty && plan.dropBytes > 0)
    val before = SnapshotStore.files("tdry", 4L).toSet
    SnapshotStore.vacuum("tdry", keep = 2)
    assert(SnapshotStore.versions("tdry") == Seq(3L, 4L))
    // the dry run's victims are exactly the files now gone
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    plan.dropFiles.foreach(f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(f)), s"$f not deleted"))
    assert(SnapshotStore.files("tdry", 4L).toSet == before, "kept head intact")
    assert(SnapshotStore.read(spark, "tdry", Some(4L)).count() == 3L)
  }

  test("K40 fsck reports resolvable chains and detects a missing data file") {
    import spark.implicits._
    SnapshotStore.commitAppend("tfsck", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("tfsck", Seq((2L, "b")).toDF("k", "s"))
    val clean = SnapshotStore.fsck("tfsck")
    assert(clean.map(_.version) == Seq(0L, 1L))
    assert(clean.forall(r => r.chainOk && r.nMissing == 0 && r.nFiles > 0))
    // sabotage: delete one of v0's data files out of band
    val victim = SnapshotStore.files("tfsck", 0L).head
    val fs = new org.apache.hadoop.fs.Path(victim).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(victim), false)
    val dirty = SnapshotStore.fsck("tfsck")
    // both versions reference the deleted file (v1 appends onto v0)
    assert(dirty.forall(r => r.chainOk && r.nMissing == 1 &&
      r.missing == Seq(victim)))
  }

  test("K20 store speaks FileSystem URIs: commit/read/vacuum under an explicit file:// base") {
    import spark.implicits._
    val uriBase = "file://" + java.nio.file.Files
      .createTempDirectory("graft_snap_uri").toString
    SnapshotStore.setBase(uriBase)
    try {
      SnapshotStore.commitAppend("u1", Seq((1L, "a")).toDF("k", "s"))
      SnapshotStore.commitAppend("u1", Seq((2L, "b")).toDF("k", "s"))
      SnapshotStore.commitOverwrite("u1", Seq((3L, "c")).toDF("k", "s"))
      assert(SnapshotStore.versions("u1") == Seq(0L, 1L, 2L))
      // manifests record fs-qualified URIs, and reads plan over them
      assert(SnapshotStore.files("u1", 2L).forall(_.startsWith("file:")))
      assert(SnapshotStore.read(spark, "u1").as[(Long, String)].collect().toSet
        == Set((3L, "c")))
      assert(SnapshotStore.read(spark, "u1", Some(1L)).as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (2L, "b")))
      // vacuum through the same FileSystem: v0/v1 manifests + their
      // unreferenced data files go; the survivor still reads
      SnapshotStore.vacuum("u1", keep = 1)
      assert(SnapshotStore.versions("u1") == Seq(2L))
      assert(SnapshotStore.read(spark, "u1").count() == 1L)
    } finally SnapshotStore.setBase(
      s"${System.getProperty("java.io.tmpdir")}/graft_snap_${java.util.UUID.randomUUID().toString.take(8)}")
  }

  test("K52 CHECK constraints: violating commits publish nothing, NULL passes, existing data gates registration") {
    import spark.implicits._
    val name = "tconstraint"
    SnapshotStore.commitAppend(name, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    SnapshotStore.addCheckConstraint(name, "k-positive", "k > 0")
    // a valid append passes
    SnapshotStore.commitAppend(name, Seq((3L, "c")).toDF("k", "s"))
    assert(SnapshotStore.versions(name) == Seq(0L, 1L))
    // a violating append throws, names the constraint, publishes NOTHING
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.commitAppend(name, Seq((-5L, "x"), (4L, "d")).toDF("k", "s"))
    }
    assert(e.getMessage.contains("k-positive") && e.getMessage.contains("1 row(s)"))
    assert(SnapshotStore.versions(name) == Seq(0L, 1L),
      "a failed commit must not publish a version")
    assert(rows(name) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // SQL CHECK three-valued semantics: NULL passes, only FALSE violates
    SnapshotStore.commitAppend(name,
      Seq((Some(5L), "e"), (None, "nul")).toDF("k", "s"))
    assert(SnapshotStore.versions(name) == Seq(0L, 1L, 2L))
    // mergeKeyed enforces against the upsert batch too
    intercept[IllegalArgumentException] {
      SnapshotStore.mergeKeyed(spark, name,
        Seq((-9L, "bad")).toDF("k", "s"), Seq("k"))
    }
    // registration is gated on the EXISTING head
    intercept[IllegalArgumentException] {
      SnapshotStore.addCheckConstraint(name, "s-short", "length(s) <= 1")
    }
    // dropped constraint stops gating
    SnapshotStore.dropConstraint(name, "k-positive")
    SnapshotStore.commitAppend(name, Seq((-1L, "z")).toDF("k", "s"))
    assert(SnapshotStore.read(spark, name).count() == 6L)
  }

  test("K52 staged publish enforces CHECK constraints on the staged bytes; the stage survives for the auditor") {
    import spark.implicits._
    val name = "twapconstraint"
    SnapshotStore.commitAppend(name, Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.addCheckConstraint(name, "k-positive", "k > 0")
    val bad = SnapshotStore.stage(name, Seq((-3L, "x")).toDF("k", "s"))
    val e = intercept[IllegalArgumentException] { SnapshotStore.publish(bad) }
    assert(e.getMessage.contains("k-positive"))
    assert(SnapshotStore.versions(name) == Seq(0L),
      "a rejected staged publish must create no version")
    SnapshotStore.abort(bad)
    val good = SnapshotStore.stage(name, Seq((3L, "c")).toDF("k", "s"))
    assert(SnapshotStore.publish(good) == 1L)
    assert(rows(name) == Set((1L, "a"), (3L, "c")))
    // r15 advice: publish takes an EXPLICIT session like every other
    // store entry point — a constraint-bearing publish from a thread
    // with no ACTIVE session must still enforce (not throw an
    // unrelated-looking SparkSession.active error). Run on a fresh
    // thread (thread-local active session absent there).
    val bad2 = SnapshotStore.stage(name, Seq((-7L, "y")).toDF("k", "s"))
    @volatile var caught: Option[Throwable] = None
    val t = new Thread(() => {
      try { SnapshotStore.publish(bad2, append = true, Some(spark)); () }
      catch { case e: Throwable => caught = Some(e) }
    })
    t.start(); t.join()
    assert(caught.exists(e => e.isInstanceOf[IllegalArgumentException] &&
      e.getMessage.contains("k-positive")),
      s"explicit-session publish must enforce the constraint off-thread: $caught")
    SnapshotStore.abort(bad2)
    assert(SnapshotStore.versions(name) == Seq(0L, 1L))
  }

  test("K52 validates the WRITTEN bytes: a source that re-evaluates differently cannot sneak violating rows past the check") {
    import spark.implicits._
    val name = "ttoctou"
    SnapshotStore.commitAppend(name, Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.addCheckConstraint(name, "k-positive", "k > 0")
    // a stateful source: the FIRST full evaluation yields k=1 (valid),
    // every later one k=-1 (violating). A pre-write check would bless
    // the first evaluation and the write would land the second — the
    // TOCTOU the post-write validation closes.
    val n = 64L
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    val flaky = org.apache.spark.sql.functions.udf((_: Long) =>
      if (counter.incrementAndGet() <= n) 1L else -1L).asNondeterministic()
    val df = spark.range(n).coalesce(1)
      .select(flaky(col("id")).as("k"), lit("x").as("s"))
    SnapshotStore.commitAppend(name, df)
    val got = SnapshotStore.read(spark, name).filter(col("k") < 0).count()
    assert(got == 0L,
      "the constraint must gate the bytes that actually landed")
  }

  test("K42/K49 sticky stats poison: a COW merge never claims bounds for a column carried files leave unzoned") {
    import spark.implicits._
    val name = "tpoison"
    // timestamp is min/max-TRACKED in the stats header but never
    // ZONED (zones are numeric/string only) — after a COW delete the
    // carried files contribute no t bounds, so the merged header must
    // not resurrect the rewritten files' (subset) t min/max
    val df = (1L to 1000L).map(i =>
      (i, new java.sql.Timestamp(1000000000000L + i * 1000L))).toDF("k", "t")
    SnapshotStore.commitOverwrite(name, df.repartitionByRange(4, col("k")))
    assert(SnapshotStore.statsOf(name, 0L).exists(_.cols("t").min.isDefined),
      "a full commit computes t bounds exactly")
    val v1 = SnapshotStore.deleteWhere(spark, name, col("k") <= 10L)
    val s = SnapshotStore.statsOf(name, v1).get
    assert(s.rows == 990L)
    assert(s.cols("t").min.isEmpty && s.cols("t").max.isEmpty,
      "t bounds from only the rewritten files would understate the table")
    assert(s.cols("k").min.isDefined && s.cols("k").max.isDefined,
      "the zoned column keeps exact merged bounds")
  }

  test("K51 clustering depth: 1 for a range-clustered table, ~files for interleaved, repaired by a clustered rewrite") {
    import spark.implicits._
    val name = "tclusterdepth"
    // interleaved: round-robin partitioning puts every k range in
    // every file → every point predicate hits all files
    SnapshotStore.commitOverwrite(name,
      (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "s").repartition(4))
    val bad = SnapshotStore.clusteringDepth(name, "k")
    assert(bad.nFiles == 4 && bad.nZoned == 4)
    assert(bad.maxDepth == 4, s"interleaved zones must fully overlap: $bad")
    assert(bad.overlapPairs == 6L, s"all C(4,2) pairs overlap: $bad")
    // the OPTIMIZE decision this metric drives: a range-clustered
    // rewrite gives disjoint zones → depth 1, zero overlapping pairs
    SnapshotStore.commitOverwrite(name,
      (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")))
    val good = SnapshotStore.clusteringDepth(name, "k")
    assert(good.nZoned == 4 && good.maxDepth == 1 && good.overlapPairs == 0L,
      s"range clustering must be depth 1: $good")
    // history is versioned like everything else
    assert(SnapshotStore.clusteringDepth(name, "k", Some(0L)).maxDepth == 4)
    intercept[IllegalArgumentException] {
      SnapshotStore.clusteringDepth(name, "nope")
    }
  }

  test("K49 copy-on-write DELETE rewrites only zone-affected files; untouched files and their metadata carry verbatim") {
    import spark.implicits._
    val name = "tcowdel"
    SnapshotStore.commitAppend(name,
      (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")))
    val v0 = SnapshotStore.versions(name).last
    val files0 = SnapshotStore.files(name, v0)
    assert(files0.size == 4)
    // k < 250 lives in the first range file(s) only
    val v1 = SnapshotStore.deleteWhere(spark, name, col("k") < 250L)
    assert(v1 == v0 + 1)
    val files1 = SnapshotStore.files(name, v1)
    val carried = files1.toSet intersect files0.toSet
    assert(carried.nonEmpty && carried.size >= 2,
      s"untouched files must carry by PATH (no rewrite): ${files1.size} vs ${files0.size}")
    assert((files0.toSet -- files1.toSet).nonEmpty, "affected file(s) must be replaced")
    // content: exactly the non-matching rows survive; v0 is intact
    assert(SnapshotStore.read(spark, name).count() == 751L)
    assert(SnapshotStore.read(spark, name)
      .agg(min(col("k"))).collect().head.getLong(0) == 250L)
    assert(rows(name, Some(v0)).size == 1000)
    // metadata carried for untouched + computed for fresh: full coverage
    val det = SnapshotStore.fileDetailsOf(name, v1)
    assert(files1.forall(f => det.contains(new java.net.URI(f).getPath)),
      "every file of the new head must carry detail (carried or fresh)")
    assert(det.values.map(_.rows).sum == 751L)
    val st = SnapshotStore.statsOf(name, v1).getOrElse(fail("no stats"))
    assert(st.rows == 751L, s"COW stats must stay exact: ${st.rows}")
    assert(SnapshotStore.fileRowGroupsOf(name, v1).keySet ==
      det.keySet, "row-group records must cover the same files")
    // deep fsck reconciles both grains after the rewrite
    assert(SnapshotStore.fsckRows(spark, name).forall(_.ok))
    assert(SnapshotStore.fsckRowGroups(spark, name).forall(_.ok))
    // a provably-unmatchable predicate is a metadata no-op
    assert(SnapshotStore.deleteWhere(spark, name, col("k") > 5000L) == v1)
  }

  test("K49 fully-covered files drop metadata-only (never read); null rows block the fast path") {
    import spark.implicits._
    val name = "tcowfast"
    SnapshotStore.commitAppend(name,
      (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")))
    val v0 = SnapshotStore.versions(name).last
    val files0 = SnapshotStore.files(name, v0)
    // k < 255: the first range file ([1..~250]) is FULLY covered →
    // dropped from the manifest without a read; the second is partial →
    // rewritten. Proof: the rewrite output holds ONLY the partial
    // file's survivors — if the covered file had been rewritten, its
    // rows would appear in the new data directory.
    val v1 = SnapshotStore.deleteWhere(spark, name, col("k") < 255L)
    val files1 = SnapshotStore.files(name, v1)
    val fresh = files1.filterNot(files0.toSet)
    assert(fresh.nonEmpty, "the partially-covered file must rewrite")
    val freshRows = spark.read.parquet(fresh: _*)
      .agg(count(lit(1)), min(col("k")), max(col("k"))).collect().head
    assert(SnapshotStore.read(spark, name).count() == 746L)
    assert(freshRows.getLong(0) < 300L,
      s"rewrite output must hold ONLY the partial file's survivors " +
        s"(got ${freshRows.getLong(0)} rows - a fully-covered file was rewritten)")
    assert(freshRows.getLong(1) == 255L)
    assert(SnapshotStore.statsOf(name, v1).exists(_.rows == 746L))
    assert(SnapshotStore.fsckRows(spark, name).forall(_.ok))
    // NULL rows in the proof column BLOCK the fast path: zone bounds
    // ignore nulls, and a null row does NOT match k < 100 - it must
    // survive the delete (the whole-file drop would lose it)
    val name2 = "tcowfastnull"
    SnapshotStore.commitAppend(name2,
      (Seq((Some(1L), "a"), (Some(2L), "b"), (None, "nul")))
        .toDF("k", "s").coalesce(1))
    val v2 = SnapshotStore.deleteWhere(spark, name2, col("k") < 100L)
    assert(v2 == 1L)
    val left = SnapshotStore.read(spark, name2).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSet
    assert(left == Set((None, "nul")),
      s"the null-k row must survive a k<100 delete: $left")
  }

  test("K50 keyed MERGE upserts matched rows, inserts new ones, rewrites only affected files") {
    import spark.implicits._
    val name = "tcowmerge"
    SnapshotStore.commitAppend(name,
      (1L to 1000L).map(i => (i, s"old$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")))
    val v0 = SnapshotStore.versions(name).last
    val files0 = SnapshotStore.files(name, v0)
    // batch: update keys 10 and 20 (both in the low range file), insert 5000
    val v1 = SnapshotStore.mergeKeyed(spark, name,
      Seq((10L, "NEW10"), (20L, "NEW20"), (5000L, "NEW5000")).toDF("k", "s"),
      Seq("k"))
    assert(v1 == v0 + 1)
    val files1 = SnapshotStore.files(name, v1)
    assert((files1.toSet intersect files0.toSet).nonEmpty,
      "files whose zones cannot hold a batch key must carry by path")
    val got = rows(name)
    assert(got.size == 1001)
    assert(got((10L, "NEW10")) && got((20L, "NEW20")) && got((5000L, "NEW5000")))
    assert(!got.exists(_ == (10L, "old10")) && got((11L, "old11")))
    // v0 unchanged (time travel across a merge)
    assert(rows(name, Some(v0))((10L, "old10")))
    // exact stats after the upsert
    assert(SnapshotStore.statsOf(name, v1).exists(_.rows == 1001L))
    assert(SnapshotStore.fsckRows(spark, name).forall(_.ok))
    // K50 corpus-scale path: a batch ABOVE maxBatchKeys merges via the
    // distributed semi-join (keys never collect to the driver) with
    // the same semantics as the bounded path
    val v2 = SnapshotStore.mergeKeyed(spark, name,
      (1L to 50L).map(i => (i, s"x$i")).toDF("k", "s"), Seq("k"),
      maxBatchKeys = 10)
    val got2 = rows(name, Some(v2))
    assert(got2.size == 1001)
    assert(got2((1L, "x1")) && got2((50L, "x50")) && got2((51L, "old51")) &&
      got2((5000L, "NEW5000")) && !got2.exists(_ == (10L, "NEW10")))
    // untouched files (zones outside the batch's key range) carry by path
    assert((SnapshotStore.files(name, v2).toSet intersect
      SnapshotStore.files(name, v1).toSet).nonEmpty,
      "shuffle-path merge must still carry untouched files by path")
    // ...and the result is row-identical to a full overwrite rebuild
    val expect = ((1L to 1000L).map(i =>
      if (i <= 50L) (i, s"x$i") else (i, s"old$i")).toSet + ((5000L, "NEW5000")))
    assert(got2 == expect,
      "shuffle-path merge must equal the commitOverwrite rebuild")
    // MERGE source hygiene: duplicate keys and NULL keys are rejected
    intercept[IllegalArgumentException] {
      SnapshotStore.mergeKeyed(spark, name,
        Seq((7L, "a"), (7L, "b")).toDF("k", "s"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.mergeKeyed(spark, name,
        Seq((Option.empty[Long], "n")).toDF("k", "s"), Seq("k"))
    }
  }

  test("K50+K22 Bloom-pruned MERGE: a domain-spanning hash-keyed batch semi-join-scans only true-positive files; result equals the rebuild") {
    import spark.implicits._
    val name = "tbloommerge"
    // content-hash-shaped keys: hash-partitioned layout, every file's
    // k zone spans ~the whole domain → per-key min/max narrowing keeps
    // ALL files (the r15 verdict #4 degenerate shape)
    def hk(i: Long): Long = (i * 2654435761L) & 0xffffffffL
    val rows0 = (1L to 2000L).map(i => (hk(i), s"old$i"))
    SnapshotStore.commitOverwrite(name,
      rows0.toDF("k", "s").repartition(4, col("k")))
    val v0 = SnapshotStore.versions(name).last
    val files0 = SnapshotStore.files(name, v0)
    assert(files0.size == 4)
    assert(SnapshotStore.clusteringDepth(name, "k").maxDepth == 4,
      "hash layout must fully interleave k zones (zone narrowing is useless here)")
    SnapshotStore.ensureBloomIndex(spark, name, "k")
    // batch: keys from ONE file only, but spanning nearly the whole k
    // domain; > maxBatchKeys forces the corpus-scale shuffle path
    val f0 = files0.sorted.head
    val f0keys = spark.read.parquet(f0).select("k")
      .orderBy("k").as[Long].collect()
    val batchKeys = Seq(f0keys.head, f0keys(f0keys.length / 2), f0keys.last)
    val batch = batchKeys.map(k => (k, s"NEW$k")).toDF("k", "s")
    val v1 = SnapshotStore.mergeKeyed(spark, name, batch, Seq("k"),
      maxBatchKeys = 2)
    // the Bloom probe must hand the semi-join ONLY the true-positive
    // file (filters sized at ~1e6 expected keys over 500 actual →
    // false positives are deterministic-zero at this fill)
    assert(SnapshotStore.lastMergeProbeScanFiles ==
      Seq(new java.net.URI(f0).getPath),
      s"semi-join must scan only the Bloom-positive file: " +
        s"${SnapshotStore.lastMergeProbeScanFiles.size} of ${files0.size}")
    // untouched files carry by path; result identical to the rebuild
    assert((SnapshotStore.files(name, v1).toSet intersect files0.toSet).size == 3,
      "the three Bloom-negative files must carry verbatim")
    val got = rows(name, Some(v1))
    val want = rows0.map { case (k, s) =>
      if (batchKeys.contains(k)) (k, s"NEW$k") else (k, s) }.toSet
    assert(got == want, "merge result must equal the commitOverwrite rebuild")
    // files WITHOUT an index entry are kept unconditionally (no false
    // negatives) — the merge's own output files are unindexed until
    // the next ensure, which is INCREMENTAL: only they are scanned,
    // the carried files' filters are reused (immutable data files)
    val freshFiles = SnapshotStore.files(name, v1).toSet -- files0.toSet
    assert(SnapshotStore.ensureBloomIndex(spark, name, "k") == freshFiles.size,
      "re-ensure must index exactly the merge's fresh files")
    // a domain-spanning INSERT-ONLY batch (no key present anywhere):
    // the Bloom probe empties the candidate set — zero files scanned
    val inserts = Seq(1L, 4294967295L, 2147483647L)
      .filterNot(rows0.map(_._1).toSet)
      .map(k => (k, s"INS$k")).toDF("k", "s")
    val v2 = SnapshotStore.mergeKeyed(spark, name, inserts, Seq("k"),
      maxBatchKeys = 2)
    assert(SnapshotStore.lastMergeProbeScanFiles.isEmpty,
      "an all-new-keys batch must scan NO files (pure insert)")
    assert((SnapshotStore.files(name, v2).toSet intersect
      SnapshotStore.files(name, v1).toSet).size ==
      SnapshotStore.files(name, v1).size,
      "every prior file carries on a pure insert")
    val n2 = want.size + inserts.count()
    assert(rows(name, Some(v2)).size == n2)
    // TYPE-WIDENED batches: an INT-typed batch against the BIGINT key
    // must still probe POSITIVE — keys hash as the TABLE's column
    // type (a raw-type hash is 4 bytes vs 8: a false-negative prune
    // that silently INSERTS a duplicate next to the row it meant to
    // update). Exercise BOTH probe paths.
    SnapshotStore.ensureBloomIndex(spark, name, "k")
    val smallKey = rows0.map(_._1).filter(_ <= Int.MaxValue).min
    // corpus-scale path (maxBatchKeys = 0 forces it)
    val v3 = SnapshotStore.mergeKeyed(spark, name,
      Seq((smallKey.toInt, "RETYPED")).toDF("k", "s"), Seq("k"),
      maxBatchKeys = 0)
    val got3 = rows(name, Some(v3))
    assert(got3.size == n2, "a widened-type update must not insert a duplicate")
    assert(got3((smallKey, "RETYPED")))
    // bounded driver-side path (default maxBatchKeys)
    val v4 = SnapshotStore.mergeKeyed(spark, name,
      Seq((smallKey.toInt, "RETYPED2")).toDF("k", "s"), Seq("k"))
    val got4 = rows(name, Some(v4))
    assert(got4.size == n2 && got4((smallKey, "RETYPED2")),
      "the bounded Bloom probe must also hash as the table's key type")
  }

  test("K53 OPTIMIZE ZORDER: identical rows in a new version; the useless dimension's depth collapses; a 2D box prunes files; history intact") {
    import spark.implicits._
    val name = "tzorder"
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    // x-linear layout: x zones are disjoint, every file spans ALL of y
    SnapshotStore.commitOverwrite(name, grid.toDF("x", "y")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x", "y"))
    val yBefore = SnapshotStore.clusteringDepth(name, "y")
    assert(yBefore.maxDepth == yBefore.nFiles,
      s"x-linear layout must fully overlap on y: $yBefore")
    val v1 = SnapshotStore.optimizeZOrder(spark, name, ("x", "y"), files = 8)
    def rowSet(v: Long) = SnapshotStore.read(spark, name, Some(v))
      .as[(Long, Long)].collect().toSet
    assert(rowSet(v1) == grid.toSet && rowSet(0L) == grid.toSet,
      "OPTIMIZE must not change a single row, and v0 must time-travel")
    val yAfter = SnapshotStore.clusteringDepth(name, "y", Some(v1))
    assert(yAfter.maxDepth < yBefore.maxDepth,
      s"z-order must tighten the formerly useless dimension: $yAfter")
    val xAfter = SnapshotStore.clusteringDepth(name, "x", Some(v1))
    assert(xAfter.maxDepth <= 4 && yAfter.maxDepth <= 4,
      s"both dimensions reasonably tight under z-order: $xAfter / $yAfter")
    // a 2D box predicate now prunes FILES (the low-quadrant tile lives
    // in one z range); under the x-linear layout y gave no pruning
    val plan = SnapshotStore.rowGroupPrunePlan(spark, name,
      col("x") < 8L && col("y") < 8L, Some(v1))
    assert(plan.keptFiles < plan.totalFiles,
      s"the z layout must prune files for a 2D box: $plan")
    // r15 verdict #3 — the ADVISOR closes the K51→K53 loop: decision
    // from the manifest alone, rewrite only when depth demands it
    val name2 = "tzadvisor"
    SnapshotStore.commitOverwrite(name2, grid.toDF("x", "y")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x", "y"))
    val advice = SnapshotStore.optimizeIfAdvised(spark, name2, ("x", "y"),
      depthThreshold = 4)
    assert(advice.rewrite && advice.depth2 == 8,
      s"x-linear layout (y depth 8) must trigger the rewrite: $advice")
    val vOpt = advice.optimizedVersion.getOrElse(fail("advised but not rewritten"))
    // measured depth collapse after the advisor-triggered rewrite...
    val d2 = SnapshotStore.clusteringDepth(name2, "y", Some(vOpt)).maxDepth
    assert(d2 <= 4, s"advisor-triggered ZORDER must collapse y depth: $d2")
    // ...a 2D box predicate now prunes files...
    val plan2 = SnapshotStore.rowGroupPrunePlan(spark, name2,
      col("x") < 8L && col("y") < 8L, Some(vOpt))
    assert(plan2.keptFiles < plan2.totalFiles, s"box must prune: $plan2")
    // ...and the SAME advisor now says SKIP (no maintenance churn)
    val again = SnapshotStore.optimizeIfAdvised(spark, name2, ("x", "y"),
      depthThreshold = 4)
    assert(!again.rewrite && again.optimizedVersion.isEmpty,
      s"a freshly optimized table must not re-rewrite: $again")
    assert(SnapshotStore.versions(name2).last == vOpt,
      "skip must publish nothing")

    // r15 advice: OPTIMIZE of an EMPTY current version is a no-op (the
    // current version comes back), not an NPE from max(z) = NULL
    val empty = "tzorderempty"
    SnapshotStore.commitOverwrite(empty,
      grid.toDF("x", "y").limit(0))
    val vEmpty = SnapshotStore.versions(empty).last
    assert(SnapshotStore.optimizeZOrder(spark, empty, ("x", "y")) == vEmpty,
      "OPTIMIZE of an empty table must return the current version untouched")
    assert(SnapshotStore.versions(empty).last == vEmpty)
  }

  test("K48 row-group detail: strictly fewer bytes than file-grain pruning on a mixed file; deep fsck reconciles; survives vacuum rewrite") {
    import spark.implicits._
    val name = "trgdetail"
    val hc = spark.sparkContext.hadoopConfiguration
    val old = Option(hc.get("parquet.block.size"))
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      // ONE file, k-sorted, tiny block size → several row groups with
      // disjoint k ranges inside a single file
      SnapshotStore.commitAppend(name,
        (1L to 20000L).map(i => (i, i % 7)).toDF("k", "g")
          .coalesce(1).sortWithinPartitions("k"))
    } finally old match {
      case Some(s) => hc.set("parquet.block.size", s)
      case None => hc.unset("parquet.block.size")
    }
    val v = SnapshotStore.versions(name).last
    val rg = SnapshotStore.fileRowGroupsOf(name, v)
    assert(rg.size == 1, s"expected one data file, got ${rg.keys}")
    val rgs = rg.values.head
    assert(rgs.size >= 2, s"need a mixed multi-row-group file, got ${rgs.size}")
    assert(rgs.map(_.rows).sum == 20000L)
    assert(rgs.forall(_.zones.contains("k")), "every row group must zone k")
    // a predicate INSIDE the file's k range: file-grain pruning keeps the
    // whole file; row-group grain keeps only the tail groups
    val plan = SnapshotStore.rowGroupPrunePlan(spark, name, col("k") > 19500L)
    assert(plan.totalFiles == 1 && plan.keptFiles == 1,
      "the file itself must survive file-grain pruning")
    assert(plan.keptRowGroups < plan.totalRowGroups,
      s"row groups must prune within the file: $plan")
    assert(plan.keptRgBytes < plan.keptFileBytes,
      s"row-group grain must keep STRICTLY fewer bytes: $plan")
    assert(plan.rgExact && plan.keptRgRows < 20000L && plan.keptRgRows >= 500L,
      s"kept row-group rows must bound the scan output: $plan")
    // planning statistics ride the tighter grain…
    val (_, df) = SnapshotStore.readZonedStats(spark, name, col("k") > 19500L)
    val stats = df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable
    }.flatten.flatMap(_.stats).getOrElse(fail("no stats attached"))
    assert(stats.rowCount.contains(BigInt(plan.keptRgRows)),
      s"row estimate must be the kept-ROW-GROUP sum, got ${stats.rowCount}")
    // …and the pruned read still answers exactly
    assert(df.count() == 500L)
    // K46 deep fsck reconciles the record against the live footers
    val rep = SnapshotStore.fsckRowGroups(spark, name)
    assert(rep.nonEmpty && rep.forall(_.ok), s"$rep")
    // the resolved map survives a vacuum checkpoint rewrite (the K42/K44
    // resolution discipline)
    SnapshotStore.commitAppend(name, Seq((100000L, 1L)).toDF("k", "g"))
    SnapshotStore.commitAppend(name, Seq((100001L, 2L)).toDF("k", "g"))
    val head = SnapshotStore.versions(name).last
    val before = SnapshotStore.fileRowGroupsOf(name, head)
    SnapshotStore.vacuum(name, keep = 2)
    val after = SnapshotStore.fileRowGroupsOf(name, SnapshotStore.versions(name).last)
    assert(after == before,
      "vacuum's checkpoint rewrite must carry the RESOLVED row-group map")
    assert(SnapshotStore.fsckRowGroups(spark, name).forall(_.ok))
  }

  test("K41 appending a double column containing NaN never fails the commit; NaN stays the max") {
    import spark.implicits._
    val name = "tnanstats"
    SnapshotStore.commitAppend(name, Seq((1L, 1.5), (2L, 3.5)).toDF("k", "x"))
    // second commit's max renders "NaN" — the stats merge must rank it
    // above every finite value instead of throwing NumberFormatException
    // (stats are advisory; a data-dependent commit failure is the bug)
    SnapshotStore.commitAppend(name, Seq((3L, Double.NaN), (4L, 0.5)).toDF("k", "x"))
    assert(SnapshotStore.versions(name) == Seq(0L, 1L))
    val st = SnapshotStore.statsOf(name, 1L).getOrElse(fail("stats missing"))
    assert(st.rows == 4L, "merge stayed cumulative")
    assert(st.cols("x").max.contains("NaN"), "NaN orders above all finite values")
    assert(st.cols("x").min.contains("0.5"))
  }

  test("K38 a stale vacuum .ckpt.tmp cannot resurrect a dropped version") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val name = "tstaletmp"
    (0 until 3).foreach(i =>
      SnapshotStore.commitAppend(name, Seq((i.toLong, s"s$i")).toDF("k", "s")))
    val dataFile = new Path(SnapshotStore.files(name, 0L).head)
    val mdir = new Path(dataFile.getParent.getParent, "_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a vacuum that crashed AFTER writing v0's checkpoint tmp
    // but BEFORE its delete→rename (published target intact, tmp never
    // consumed): the tmp's stale file list references v0-era data
    val target = new Path(mdir, "v000000.txt")
    val lines = {
      val in = fs.open(target)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val tmp = new Path(mdir, ".v0.ckpt.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    // a later vacuum drops v0: BOTH the manifest and the stale tmp must
    // go, or versions() resurrects v0 pointing at deleted data files
    SnapshotStore.vacuum(name, keep = 1)
    assert(!fs.exists(tmp), "the stale checkpoint tmp must be deleted with its version")
    assert(SnapshotStore.versions(name) == Seq(2L),
      "a dropped version must stay dropped")
    assert(rows(name) == Set((0L, "s0"), (1L, "s1"), (2L, "s2")))
  }

  test("K38 vacuum sweeps a stale .ckpt.tmp of a KEPT version whose target is intact") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val name = "tkepttmp"
    (0 until 2).foreach(i =>
      SnapshotStore.commitAppend(name, Seq((i.toLong, s"s$i")).toDF("k", "s")))
    val dataFile = new Path(SnapshotStore.files(name, 0L).head)
    val mdir = new Path(dataFile.getParent.getParent, "_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(mdir, ".v1.ckpt.tmp")
    val out = fs.create(tmp, true)
    try out.write("#schema={}\n".getBytes("UTF-8")) finally out.close()
    SnapshotStore.vacuum(name, keep = 2) // drops nothing
    // keep=2 drops nothing, but the sweep still removes the stale tmp
    // under the store lock (readers only touch a tmp when the target is
    // missing, so this can never race a recovery publish)
    assert(fs.exists(new Path(mdir, "v000001.txt")) && !fs.exists(tmp),
      "stale tmp of a kept version must not linger to a later drop")
    assert(rows(name) == Set((0L, "s0"), (1L, "s1")))
  }

  test("K45 commit clocks are strictly monotonic even against a stepped-back wall clock") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val name = "tmonoat"
    SnapshotStore.commitAppend(name, Seq((1L, "a")).toDF("k", "s"))
    // simulate a forward clock step recorded at v0: rewrite its #at one
    // minute into the future; the next commit's now() is then "behind"
    val dataFile = new Path(SnapshotStore.files(name, 0L).head)
    val mdir = new Path(dataFile.getParent.getParent, "_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(mdir, "v000000.txt")
    val future = System.currentTimeMillis() + 60000L
    val rewritten = {
      val in = fs.open(target)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map(l =>
        if (l.startsWith("#at=")) s"#at=$future" else l).mkString("\n")
      finally in.close()
    }
    val out = fs.create(target, true)
    try out.write(rewritten.getBytes("UTF-8")) finally out.close()
    SnapshotStore.commitAppend(name, Seq((2L, "b")).toDF("k", "s"))
    val Seq(t0, t1) = SnapshotStore.versions(name)
      .map(v => SnapshotStore.commitTimeOf(name, v).getOrElse(fail("missing #at")))
    // the bump rule max(now, prev+1) makes ties and regressions impossible,
    // so AS-OF reads (and ing_asof's t1 > t0 contract) can rely on it
    assert(t0 == future && t1 == future + 1L,
      s"expected the commit clock to bump past the stepped anchor: $t0 -> $t1")
    assert(SnapshotStore.versionAt(name, t0).contains(0L))
    assert(SnapshotStore.versionAt(name, t1).contains(1L))
  }

  test("K56 fleet maintenance: declared contracts drive the loop; one pass rewrites only decayed tables; the second pass is all-skip; properties survive atomically") {
    import spark.implicits._
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    // decayed: x-linear layout, y depth == nFiles → must rewrite
    val decayed = "tfleet_decayed"
    SnapshotStore.commitOverwrite(decayed, grid.toDF("x", "y")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x", "y"))
    SnapshotStore.setClusteringDims(decayed, ("x", "y"))
    // healthy: already z-ordered → must skip
    val healthy = "tfleet_healthy"
    SnapshotStore.commitOverwrite(healthy, grid.toDF("x", "y")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x", "y"))
    SnapshotStore.setClusteringDims(healthy, ("x", "y"))
    SnapshotStore.optimizeZOrder(spark, healthy, ("x", "y"), files = 8)
    val healthyV = SnapshotStore.versions(healthy).last
    // undeclared: no contract → reported, never touched
    val plain = "tfleet_plain"
    SnapshotStore.commitOverwrite(plain, grid.toDF("x", "y"))
    val plainV = SnapshotStore.versions(plain).last

    val m = SnapshotStore.maintainFleet(spark, depthThreshold = 4)
    assert(m.rewritten.contains(decayed), s"decayed table must rewrite: $m")
    assert(m.skipped.contains(healthy), s"z-ordered table must skip: $m")
    assert(m.undeclared.contains(plain), "no contract → report, don't guess")
    assert(SnapshotStore.versions(healthy).last == healthyV &&
      SnapshotStore.versions(plain).last == plainV,
      "maintenance must publish nothing on skipped/undeclared tables")
    val vOpt = m.advice.find(_.name == decayed).get.optimizedVersion
      .getOrElse(fail("advised but not rewritten"))
    assert(SnapshotStore.clusteringDepth(decayed, "y", Some(vOpt)).maxDepth <= 4,
      "fleet-triggered ZORDER must collapse the decayed dimension")
    assert(SnapshotStore.read(spark, decayed, Some(vOpt))
      .as[(Long, Long)].collect().toSet == grid.toSet,
      "maintenance must not change a single row")
    // idempotence: the loop is schedulable — a second pass over the
    // fleet advises SKIP on every table it just maintained
    val m2 = SnapshotStore.maintainFleet(spark, depthThreshold = 4)
    assert(Seq(decayed, healthy).forall(m2.skipped.contains),
      s"second pass must be all-skip on maintained tables: $m2")
    assert(SnapshotStore.versions(decayed).last == vOpt,
      "all-skip must publish nothing")
    // property file: last write wins, other keys survive
    SnapshotStore.setTableProperty(plain, "owner", "pipeline-a")
    SnapshotStore.setClusteringDims(plain, ("y", "x"))
    assert(SnapshotStore.declaredClusteringDims(plain).contains(("y", "x")))
    assert(SnapshotStore.tableProperties(plain)("owner") == "pipeline-a")
    // r16 review #1: a crash in the delete→rename window leaves only
    // .props.tmp — the next read must finish the publish, never lose
    // the map. Simulate by moving the published file onto the tmp.
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dir = SnapshotStore.tableDir(plain)
    val target = new org.apache.hadoop.fs.Path(dir, "_props.txt")
    val tmp = new org.apache.hadoop.fs.Path(dir, ".props.tmp")
    assert(fs.rename(target, tmp), "crash simulation setup")
    assert(SnapshotStore.declaredClusteringDims(plain).contains(("y", "x")),
      "a surviving .props.tmp must be recovered, not lost")
    assert(fs.exists(target) && !fs.exists(tmp), "recovery must republish")
    // r16 review #3: a malformed foreign-written value reads as
    // undeclared — one bad table must not poison the fleet loop
    SnapshotStore.setTableProperty(plain, "clustering.dims", "only-one-dim")
    assert(SnapshotStore.declaredClusteringDims(plain).isEmpty)
    val m3 = SnapshotStore.maintainFleet(spark, depthThreshold = 4)
    assert(m3.undeclared.contains(plain),
      "malformed contract → reported undeclared, loop completes")
  }

  test("K59 retention loop: only tables clearing the reclaim floor vacuum, tags survive, scoped to the namespace") {
    import spark.implicits._
    def fill(name: String, overwrites: Int, rows: Int): Unit =
      (0 until overwrites).foreach { i =>
        SnapshotStore.commitOverwrite(name,
          (0 until rows).map(j => (j.toLong + i, s"v$i-$j")).toDF("k", "s"))
      }
    // heavy garbage: 4 overwrites of 5k rows → 3 dead versions
    fill("rket_big", 4, 5000)
    SnapshotStore.tag("rket_big", "pinned", Some(0L))
    // trivial garbage: 2 overwrites of 5 rows → reclaim below floor
    fill("rket_small", 2, 5)
    // nothing to drop: single version
    fill("rket_single", 1, 5)
    val before = SnapshotStore.versions("rket_small")
    val advice = SnapshotStore.maintainRetention(keep = 1,
      minReclaimBytes = 64 * 1024, scope = _.startsWith("rket_"))
    val byName = advice.map(a => a.name -> a).toMap
    assert(byName.keySet == Set("rket_big", "rket_small", "rket_single"),
      s"scope must bound the loop: ${byName.keySet}")
    assert(byName("rket_big").vacuumed &&
      byName("rket_big").reclaimBytes >= 64 * 1024,
      s"heavy garbage must vacuum: ${byName("rket_big")}")
    assert(!byName("rket_small").vacuumed &&
      SnapshotStore.versions("rket_small") == before,
      "below-floor reclaim must be advised only, nothing dropped")
    assert(!byName("rket_single").vacuumed &&
      byName("rket_single").reclaimBytes == 0L)
    // tag protection rides through the loop: v0 is pinned, v3 is live
    val kept = SnapshotStore.versions("rket_big")
    assert(kept.contains(0L) && kept.contains(3L) && kept.size == 2,
      s"tagged + newest must survive keep=1: $kept")
    // idempotence: a second pass vacuums nothing — the heavy table's
    // reclaim is spent, and the below-floor table's garbage REMAINS
    // advised-only (the policy's point: it never clears the floor)
    val again = SnapshotStore.maintainRetention(keep = 1,
      minReclaimBytes = 64 * 1024, scope = _.startsWith("rket_"))
    assert(again.forall(!_.vacuumed), s"second pass must be all-skip: $again")
    assert(again.find(_.name == "rket_big").get.reclaimBytes == 0L,
      "the vacuumed table's reclaim must be spent")
  }

  test("OCC: two interleaved writers' disjoint-file appends BOTH commit; no lost update, linear chain") {
    import spark.implicits._
    SnapshotStore.commitAppend("occ1", Seq((1L, "base")).toDF("k", "s"))
    // writer A builds its manifest for v1; the hook fires writer B's
    // FULL commit in the race window (reentrant lock = same-thread
    // interleave, the cross-process schedule a single JVM can't
    // otherwise produce); B takes v1, A's CAS rename fails, A rebuilds
    // its delta against B's head and retries at v2
    var fired = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired) {
        fired = true
        SnapshotStore.publishRaceHook = () => ()
        SnapshotStore.commitAppend("occ1", Seq((2L, "writerB")).toDF("k", "s"))
      }
    }
    val vA = try
      SnapshotStore.commitAppend("occ1", Seq((3L, "writerA")).toDF("k", "s"))
    finally SnapshotStore.publishRaceHook = () => ()
    assert(fired, "the race must actually have been injected")
    assert(vA == 2L, s"A must land AFTER B's stolen version: $vA")
    assert(SnapshotStore.versions("occ1") == Seq(0L, 1L, 2L),
      "version chain must stay linear — no gaps, no forks")
    // NO lost update: both writers' rows are visible at the head
    assert(rows("occ1") == Set((1L, "base"), (2L, "writerB"), (3L, "writerA")))
    // and B's intermediate snapshot is exactly base + B
    assert(rows("occ1", Some(1L)) == Set((1L, "base"), (2L, "writerB")))
  }

  test("OCC: an append losing the race TWICE rebuilds against each new head and still commits linearly") {
    import spark.implicits._
    SnapshotStore.commitAppend("occ4", Seq((1L, "base")).toDF("k", "s"))
    // the hook fires on EVERY publish attempt: writer A's first two
    // attempts each lose to a fresh writer-B commit, the third lands
    // (inHook suppresses the hook during B's own nested publish)
    var races = 0
    var inHook = false
    SnapshotStore.publishRaceHook = () => {
      if (!inHook && races < 2) {
        races += 1
        inHook = true
        try SnapshotStore.commitAppend("occ4",
          Seq((10L + races, s"b$races")).toDF("k", "s"))
        finally inHook = false
      }
    }
    val vA = try
      SnapshotStore.commitAppend("occ4", Seq((3L, "writerA")).toDF("k", "s"))
    finally SnapshotStore.publishRaceHook = () => ()
    assert(races == 2)
    assert(vA == 3L, s"A must land after BOTH stolen versions: $vA")
    assert(SnapshotStore.versions("occ4") == Seq(0L, 1L, 2L, 3L))
    assert(rows("occ4") == Set((1L, "base"), (11L, "b1"), (12L, "b2"), (3L, "writerA")),
      "all four writers' rows visible — two rebuilds, zero lost updates")
  }

  test("OCC: a concurrent commit under an OVERWRITE classifies as a true conflict and aborts cleanly") {
    import spark.implicits._
    SnapshotStore.commitAppend("occ2", Seq((1L, "base")).toDF("k", "s"))
    var fired = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired) {
        fired = true
        SnapshotStore.publishRaceHook = () => ()
        SnapshotStore.commitAppend("occ2", Seq((2L, "writerB")).toDF("k", "s"))
      }
    }
    val e = try intercept[SnapshotStore.ConcurrentWriteException] {
      SnapshotStore.commitOverwrite("occ2", Seq((9L, "clobber")).toDF("k", "s"))
    } finally SnapshotStore.publishRaceHook = () => ()
    assert(fired)
    assert(e.getMessage.contains("overwrite"),
      s"the abort must classify the conflict: ${e.getMessage}")
    // the abort is CLEAN: B's commit stands, no half-published version
    assert(SnapshotStore.versions("occ2") == Seq(0L, 1L))
    assert(rows("occ2") == Set((1L, "base"), (2L, "writerB")))
    // and the table keeps working after the abort
    SnapshotStore.commitAppend("occ2", Seq((3L, "after")).toDF("k", "s"))
    assert(rows("occ2") == Set((1L, "base"), (2L, "writerB"), (3L, "after")))
  }

  test("OCC REBASE: a COW merge racing a DISJOINT-file append rebases and commits — linear chain, no lost update") {
    import spark.implicits._
    SnapshotStore.commitAppend("occ3",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    var fired = false
    var inHook = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired && !inHook) {
        fired = true; inHook = true
        // writer B lands a plain append (a NEW file — disjoint from
        // every file the COW rewrites) in the COW's race window
        try SnapshotStore.commitAppend("occ3", Seq((9L, "z")).toDF("k", "s"))
        finally inHook = false
      }
    }
    val (vCow, _, _) = try
      SnapshotStore.applyChangesCow(spark, "occ3",
        Seq((1L, "A", "upsert")).toDF("k", "s", "op"), Seq("k"))
    finally SnapshotStore.publishRaceHook = () => ()
    assert(fired, "the race must actually have been injected")
    // r17 verdict #2: the COW re-lists its untouched files against
    // B's head and commits AFTER it — no abort, no retry storm
    assert(vCow == 2L, s"the rebased COW must land after B's stolen version: $vCow")
    assert(SnapshotStore.versions("occ3") == Seq(0L, 1L, 2L),
      "version chain must stay linear — no gaps, no forks")
    // no lost update in either direction: B's appended row AND the
    // COW's upsert are both visible at the head
    assert(rows("occ3") == Set((1L, "A"), (2L, "b"), (9L, "z")))
    // B's intermediate snapshot is exactly base + B, pre-merge
    assert(rows("occ3", Some(1L)) == Set((1L, "a"), (2L, "b"), (9L, "z")))
  }

  test("OCC REBASE: two COW merges rewriting the SAME file are a true conflict — the loser aborts, a re-run succeeds") {
    import spark.implicits._
    // one data file, so any two keyed rewrites overlap by construction
    SnapshotStore.commitAppend("occ5",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    var fired = false
    var inHook = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired && !inHook) {
        fired = true; inHook = true
        try SnapshotStore.applyChangesCow(spark, "occ5",
          Seq((2L, "B", "upsert")).toDF("k", "s", "op"), Seq("k"))
        finally inHook = false
      }
    }
    val e = try intercept[SnapshotStore.ConcurrentWriteException] {
      SnapshotStore.applyChangesCow(spark, "occ5",
        Seq((1L, "A", "upsert")).toDF("k", "s", "op"), Seq("k"))
    } finally SnapshotStore.publishRaceHook = () => ()
    assert(fired)
    assert(e.getMessage.contains("overlapping"),
      s"the abort must classify the overlap: ${e.getMessage}")
    // clean abort: the winning COW stands alone
    assert(rows("occ5") == Set((1L, "a"), (2L, "B")))
    // and the losing intent succeeds re-run against the new snapshot
    SnapshotStore.applyChangesCow(spark, "occ5",
      Seq((1L, "A", "upsert")).toDF("k", "s", "op"), Seq("k"))
    assert(rows("occ5") == Set((1L, "A"), (2L, "B")))
  }

  test("exactly-once across processes: a fresh process replaying a committed batchId no-ops via the manifest headers") {
    import spark.implicits._
    val v0 = SnapshotStore.commitStreamBatch("sb_xproc",
      Seq((1L, "a")).toDF("k", "s"), batchId = 0L)
    val v1 = SnapshotStore.commitStreamBatch("sb_xproc",
      Seq((2L, "b")).toDF("k", "s"), batchId = 1L)
    assert((v0, v1) == ((0L, 1L)))
    // a SECOND process starts with an empty per-process cache — the
    // r17 advice #4 hazard: without the miss-path manifest refresh it
    // would re-append batch 1 and silently break exactly-once
    SnapshotStore.forgetBatchCache("sb_xproc")
    val vReplay = SnapshotStore.commitStreamBatch("sb_xproc",
      Seq((99L, "POISON")).toDF("k", "s"), batchId = 1L)
    assert(vReplay == v1, "the replay must resolve to the committed version")
    assert(rows("sb_xproc") == Set((1L, "a"), (2L, "b")),
      "the replayed batch must not double-append")
    // and a genuinely new batch still commits
    val v2 = SnapshotStore.commitStreamBatch("sb_xproc",
      Seq((3L, "c")).toDF("k", "s"), batchId = 2L)
    assert(v2 == 2L)
    assert(rows("sb_xproc") == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("exactly-once batch FENCING: two processes replaying the same batch simultaneously publish ONE version; the loser adopts it") {
    import spark.implicits._
    val name = "sb_fence"
    SnapshotStore.commitStreamBatch(name,
      Seq((1L, "base")).toDF("k", "s"), batchId = 0L)
    // writer A (this cache) replays batch 1; in its CAS window writer
    // B — a FRESH process (cache forgotten) — commits the SAME batch
    // with its own (equivalent-in-production) rows and wins the race
    var fired = false
    var inHook = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired && !inHook) {
        fired = true; inHook = true
        try {
          SnapshotStore.forgetBatchCache(name)
          SnapshotStore.commitStreamBatch(name,
            Seq((2L, "writerB")).toDF("k", "s"), batchId = 1L)
        } finally inHook = false
      }
    }
    val vA = try SnapshotStore.commitStreamBatch(name,
      Seq((2L, "writerA")).toDF("k", "s"), batchId = 1L)
    finally SnapshotStore.publishRaceHook = () => ()
    assert(fired, "the race must actually have been injected")
    // ONE version for batch 1 — A adopted B's commit instead of
    // appending a duplicate (the pre-r18 behavior: versions 0,1,2 and
    // both writers' rows visible)
    assert(SnapshotStore.versions(name) == Seq(0L, 1L),
      "the same batch must never publish twice")
    assert(vA == 1L, "the loser must return the winner's version")
    assert(rows(name) == Set((1L, "base"), (2L, "writerB")),
      "exactly one replay's rows are visible")
    // A's discarded data directory is gone (not left for vacuum)
    val dir = SnapshotStore.tableDir(name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("data_v")).toSeq
    assert(dataDirs.length == 2,
      s"only the two published commits' data dirs may remain: $dataDirs")
    // and the stream keeps working: the next batch appends normally
    val v2 = SnapshotStore.commitStreamBatch(name,
      Seq((3L, "c")).toDF("k", "s"), batchId = 2L)
    assert(v2 == 2L)
    assert(rows(name) == Set((1L, "base"), (2L, "writerB"), (3L, "c")))
  }

  test("exactly-once cache FOLD: versions raced in by another process during a commit are folded, so their batches replay as no-ops (r18 advice #1)") {
    import spark.implicits._
    val name = "sb_fold"
    SnapshotStore.commitStreamBatch(name,
      Seq((1L, "base")).toDF("k", "s"), batchId = 0L)
    // while THIS process commits batch 1, another process (no shared
    // cache — commitAsOtherProcess touches only the disk) wins the
    // CAS with its batch 7; our retry publishes batch 1 AFTER it.
    var fired = false
    SnapshotStore.publishRaceHook = () => {
      if (!fired) {
        fired = true
        SnapshotStore.commitAsOtherProcess(name,
          Seq((7L, "otherproc")).toDF("k", "s"), key = "7")
      }
    }
    val v1 = try SnapshotStore.commitStreamBatch(name,
      Seq((2L, "ours")).toDF("k", "s"), batchId = 1L)
    finally SnapshotStore.publishRaceHook = () => ()
    assert(fired, "the race must actually have been injected")
    assert(SnapshotStore.versions(name) == Seq(0L, 1L, 2L) && v1 == 2L,
      "other process at v1, our retried batch 1 at v2")
    // THE POINT: a replay of the raced-in batch 7 in THIS process must
    // resolve to the other process's version. Before the fold fix the
    // cache's seenV max-bumped past v1 without reading its header, so
    // this replay refreshed versions > 2, found nothing, and appended
    // a duplicate.
    val vReplay = SnapshotStore.commitStreamBatch(name,
      Seq((99L, "POISON")).toDF("k", "s"), batchId = 7L)
    assert(vReplay == 1L,
      "the raced-in batch must replay to its committed version, not re-append")
    assert(rows(name) == Set((1L, "base"), (7L, "otherproc"), (2L, "ours")),
      "no duplicate rows after the replay")
  }

  test("exactly-once writer IDENTITY: two streaming queries sharing a table keep separate batchId spaces (r18 advice #2)") {
    import spark.implicits._
    val name = "sb_qid"
    // both queries legitimately start at batchId 0 — under a single
    // shared identity the second commit would be swallowed as a replay
    val vA = SnapshotStore.commitStreamBatch(name,
      Seq((1L, "qA-b0")).toDF("k", "s"), batchId = 0L, queryId = "qA")
    val vB = SnapshotStore.commitStreamBatch(name,
      Seq((2L, "qB-b0")).toDF("k", "s"), batchId = 0L, queryId = "qB")
    assert((vA, vB) == ((0L, 1L)), "distinct identities both commit")
    assert(rows(name) == Set((1L, "qA-b0"), (2L, "qB-b0")))
    // replays stay idempotent PER identity — including from a fresh
    // process (cache forgotten, manifests are the source of truth)
    SnapshotStore.forgetBatchCache(name)
    val vAr = SnapshotStore.commitStreamBatch(name,
      Seq((9L, "POISON")).toDF("k", "s"), batchId = 0L, queryId = "qA")
    assert(vAr == vA, "qA's batch 0 replay resolves to qA's version")
    assert(rows(name) == Set((1L, "qA-b0"), (2L, "qB-b0")))
    // the numeric tail stays readable for history display
    assert(SnapshotStore.batchIdOf(name, vB).contains(0L))
    assert(SnapshotStore.batchKeyOf(name, vB).contains("qB:0"))
  }

  test("vacuum sweeps ORPHANED publish tmps past the grace; fresh ones and ckpt tmps survive") {
    import spark.implicits._
    SnapshotStore.commitAppend("vtmp", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("vtmp", Seq((2L, "b")).toDF("k", "s"))
    val mdir = new org.apache.hadoop.fs.Path(
      SnapshotStore.tableDir("vtmp"), "_manifests")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a writer that crashed between tmp-create and rename-CAS leaves
    // this forever under the unique-name scheme (r17 advice #3)
    val stale = new org.apache.hadoop.fs.Path(mdir, ".v7.deadbeef.tmp")
    fs.create(stale, true).close()
    fs.setTimes(stale, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    val fresh = new org.apache.hadoop.fs.Path(mdir, ".v8.0abc1234.tmp")
    fs.create(fresh, true).close()
    SnapshotStore.vacuum("vtmp", keep = 1, orphanGraceMs = 3600 * 1000L)
    assert(!fs.exists(stale), "a day-old orphaned publish tmp must sweep")
    assert(fs.exists(fresh),
      "a tmp younger than the grace (an in-flight cross-process publish) must survive")
    // grace 0 (single-process default): everything unreferenced goes
    SnapshotStore.vacuum("vtmp", keep = 1)
    assert(!fs.exists(fresh))
    assert(rows("vtmp") == Set((1L, "a"), (2L, "b")),
      "published manifests and data are untouched by the tmp sweep")
  }

  test("K59 retention loop plumbs the orphan grace through to its vacuums") {
    import spark.implicits._
    SnapshotStore.commitAppend("vret_g", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("vret_g", Seq((2L, "b")).toDF("k", "s"))
    val dir = SnapshotStore.tableDir("vret_g")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an in-flight cross-process commit: data landed, manifest not yet
    val inflight = new org.apache.hadoop.fs.Path(
      dir, "data_v9_inflight/part-0.parquet")
    val out = fs.create(inflight, true)
    out.write("not yet published".getBytes("UTF-8")); out.close()
    // r17 advice #1: the AUTOMATED path must honor the grace — before
    // the plumb it always swept with the destructive default
    val advice = SnapshotStore.maintainRetention(keep = 1,
      minReclaimBytes = 0L, scope = _ == "vret_g",
      orphanGraceMs = 3600 * 1000L)
    assert(advice.exists(a => a.name == "vret_g" && a.vacuumed),
      "the old version must actually have been vacuumed")
    assert(fs.exists(inflight),
      "the automated retention loop must not sweep an in-grace file")
    assert(rows("vret_g") == Set((1L, "a"), (2L, "b")))
  }

  test("vacuum orphan grace: a fresh unreferenced file (an in-flight cross-process commit) survives; an old one sweeps") {
    import spark.implicits._
    SnapshotStore.commitAppend("vgrace", Seq((1L, "a")).toDF("k", "s"))
    SnapshotStore.commitAppend("vgrace", Seq((2L, "b")).toDF("k", "s"))
    // simulate a concurrent writer mid-commit: data written under the
    // table dir, manifest not yet published
    val dir = SnapshotStore.tableDir("vgrace")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inflight = new org.apache.hadoop.fs.Path(dir, "data_v9_inflight/part-0.parquet")
    val out = fs.create(inflight, true)
    out.write("not yet published".getBytes("UTF-8")); out.close()
    // with a grace window the fresh file MUST survive the sweep
    SnapshotStore.vacuum("vgrace", keep = 1, orphanGraceMs = 60 * 60 * 1000L)
    assert(fs.exists(inflight),
      "an unreferenced file younger than the grace must not be swept")
    // with the single-process default (grace 0) it sweeps — a new
    // version first, because the orphan sweep piggybacks on a vacuum
    // that actually drops something
    SnapshotStore.commitAppend("vgrace", Seq((3L, "c")).toDF("k", "s"))
    SnapshotStore.vacuum("vgrace", keep = 1)
    assert(!fs.exists(inflight))
    assert(rows("vgrace") == Set((1L, "a"), (2L, "b"), (3L, "c")),
      "referenced data is untouched either way")
  }

  test("K61 time-based retention: versions older than the horizon drop, the young tail and the minKeep floor survive, tags still pin") {
    import spark.implicits._
    SnapshotStore.commitAppend("vtime", Seq((1L, "old")).toDF("k", "s"))
    Thread.sleep(30)
    val horizon = System.currentTimeMillis()
    Thread.sleep(30)
    SnapshotStore.commitAppend("vtime", Seq((2L, "young")).toDF("k", "s"))
    SnapshotStore.commitAppend("vtime", Seq((3L, "younger")).toDF("k", "s"))
    // retain everything committed after `horizon`: v0 ages out, the
    // young tail survives regardless of count
    SnapshotStore.vacuumOlderThan("vtime",
      retainMs = System.currentTimeMillis() - horizon)
    assert(SnapshotStore.versions("vtime") == Seq(1L, 2L),
      "only the pre-horizon version may drop")
    assert(rows("vtime") == Set((1L, "old"), (2L, "young"), (3L, "younger")),
      "the head's DATA is complete — appends carry prior rows forward")
    // a zero-retention sweep still keeps the minKeep floor
    SnapshotStore.vacuumOlderThan("vtime", retainMs = 0L)
    assert(SnapshotStore.versions("vtime") == Seq(2L),
      "minKeep must floor a total-expiry sweep at the head")
    // tag protection rides the shared vacuum machinery
    SnapshotStore.commitAppend("vtime", Seq((4L, "d")).toDF("k", "s"))
    SnapshotStore.tag("vtime", "pin", Some(2L))
    Thread.sleep(30)
    SnapshotStore.vacuumOlderThan("vtime", retainMs = 0L)
    assert(SnapshotStore.versions("vtime") == Seq(2L, 3L),
      "the tagged version survives a sweep that would otherwise drop it")
  }

  test("K61 the retention loop speaks the time grammar: the young tail lifts keep above the count floor") {
    import spark.implicits._
    SnapshotStore.commitAppend("vret_t", Seq((1L, "a")).toDF("k", "s"))
    Thread.sleep(30)
    val horizon = System.currentTimeMillis()
    Thread.sleep(30)
    SnapshotStore.commitAppend("vret_t", Seq((2L, "b")).toDF("k", "s"))
    SnapshotStore.commitAppend("vret_t", Seq((3L, "c")).toDF("k", "s"))
    // keep=1 alone would drop v0 AND v1; the time horizon protects the
    // post-horizon tail (v1, v2), so only v0 may age out
    val advice = SnapshotStore.maintainRetention(keep = 1,
      minReclaimBytes = 0L, scope = _ == "vret_t",
      retainMs = Some(System.currentTimeMillis() - horizon))
    assert(advice.exists(a => a.name == "vret_t" && a.vacuumed && a.keep == 2))
    assert(SnapshotStore.versions("vret_t") == Seq(1L, 2L),
      "time horizon must lift keep above the count floor")
    assert(rows("vret_t") == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("K62 history reads as data: commit clocks, stream batch ids, manifest kinds, file counts, cumulative rows") {
    import spark.implicits._
    SnapshotStore.commitAppend("hist1", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    SnapshotStore.commitStreamBatch("hist1", Seq((3L, "c")).toDF("k", "s"),
      batchId = 42L)
    SnapshotStore.commitOverwrite("hist1", Seq((9L, "z")).toDF("k", "s"))
    val h = SnapshotStore.history(spark, "hist1").orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // commit clocks present and strictly monotone (K45)
    val ats = h.map(_.getLong(1))
    assert(ats.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
    // only the stream commit carries a batch id
    assert(h.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2))).toSeq ==
      Seq(None, Some(42L), None))
    // v1 is a delta onto v0; the overwrite is a natural checkpoint
    assert(h.map(_.getString(3)).toSeq ==
      Seq("checkpoint", "delta", "checkpoint"))
    // cumulative K41 rows: 2 -> 3 -> 1
    assert(h.map(r => if (r.isNullAt(5)) -1L else r.getLong(5)).toSeq ==
      Seq(2L, 3L, 1L))
    assert(h.forall(_.getInt(4) >= 1), "every version lists files")
  }

  test("props recovery: a TORN .props.tmp never displaces an intact target; a complete one wins") {
    SnapshotStore.setTableProperty("pt1", "a", "1")
    SnapshotStore.setTableProperty("pt1", "b", "2")
    // simulate the crash-mid-write: a truncated tmp (no end marker)
    val dir = SnapshotStore.tableDir("pt1")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, ".props.tmp")
    val out = fs.create(tmp, true)
    out.write("a=POISON".getBytes("UTF-8")); out.close()
    assert(SnapshotStore.tableProperties("pt1") == Map("a" -> "1", "b" -> "2"),
      "torn tmp must be discarded, target kept")
    assert(!fs.exists(tmp), "the torn tmp must be swept")
    // a COMPLETE tmp (full map + marker) is the newer intent and wins
    val out2 = fs.create(tmp, true)
    out2.write("a=9\nc=3\n#end=2".getBytes("UTF-8")); out2.close()
    assert(SnapshotStore.tableProperties("pt1") == Map("a" -> "9", "c" -> "3"),
      "complete tmp must finish its publish on read")
    assert(SnapshotStore.tableProperties("pt1") == Map("a" -> "9", "c" -> "3"),
      "and the adoption must be durable")
  }
}
