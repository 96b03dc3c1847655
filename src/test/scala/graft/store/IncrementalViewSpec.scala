package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K25: the materialized aggregate must equal a fresh group-by of the
  * base table after every refresh, and an append-only advance must
  * scan ONLY the appended files — otherwise it's a cache, not
  * incremental maintenance. */
class IncrementalViewSpec extends SparkSpec {

  private def mvRows(name: String): Map[String, (Long, Long)] =
    IncrementalView.read(spark, name).collect()
      .map(r => r.getString(r.fieldIndex("g")) ->
        ((r.getLong(r.fieldIndex("n_rows")), r.getLong(r.fieldIndex("sum_v"))))).toMap

  test("K25 first refresh is a full build; append refresh scans only new files") {
    import spark.implicits._
    SnapshotStore.commitAppend("ivbase",
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "v").repartition(2))
    val r0 = IncrementalView.refresh(spark, "ivbase", "ivmv", Seq("g"), Seq("v"))
    assert(!r0.incremental)
    assert(mvRows("ivmv") == Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))

    val v0Files = SnapshotStore.files("ivbase", r0.baseVersion).size
    SnapshotStore.commitAppend("ivbase",
      Seq(("b", 5L), ("c", 7L)).toDF("g", "v").repartition(1))
    val r1 = IncrementalView.refresh(spark, "ivbase", "ivmv", Seq("g"), Seq("v"))
    assert(r1.incremental, "append-only advance must take the delta path")
    val added = SnapshotStore.files("ivbase", r1.baseVersion).size - v0Files
    assert(r1.filesScanned == added && added < SnapshotStore.files("ivbase", r1.baseVersion).size)
    assert(mvRows("ivmv") == Map("a" -> ((2L, 3L)), "b" -> ((2L, 15L)), "c" -> ((1L, 7L))))
  }

  test("K25 refresh with no new commits scans nothing") {
    val r = IncrementalView.refresh(spark, "ivbase", "ivmv", Seq("g"), Seq("v"))
    assert(r.incremental && r.filesScanned == 0)
  }

  test("K25 a vacuumed-away reflected version forces a full rebuild, not a crash") {
    import spark.implicits._
    SnapshotStore.commitAppend("ivvac", Seq(("a", 1L)).toDF("g", "v").repartition(1))
    IncrementalView.refresh(spark, "ivvac", "ivvacmv", Seq("g"), Seq("v"))
    SnapshotStore.commitAppend("ivvac", Seq(("b", 2L)).toDF("g", "v").repartition(1))
    SnapshotStore.vacuum("ivvac", keep = 1) // v0 (the reflected one) is gone
    SnapshotStore.commitAppend("ivvac", Seq(("c", 3L)).toDF("g", "v").repartition(1))
    val r = IncrementalView.refresh(spark, "ivvac", "ivvacmv", Seq("g"), Seq("v"))
    assert(!r.incremental, "gone manifest must fall back to full recompute")
    val got = IncrementalView.read(spark, "ivvacmv").collect()
      .map(x => (x.getString(0), x.getLong(2))).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("K25 an overwrite breaks the append chain and forces a correct full rebuild") {
    import spark.implicits._
    SnapshotStore.commitOverwrite("ivbase", Seq(("z", 100L), ("z", 1L)).toDF("g", "v"))
    val r = IncrementalView.refresh(spark, "ivbase", "ivmv", Seq("g"), Seq("v"))
    assert(!r.incremental, "rewritten history must fall back to full recompute")
    assert(mvRows("ivmv") == Map("z" -> ((2L, 101L))))
  }

  test("K25 a file-level COW merge advances by SIGNED delta, scanning only rewritten files") {
    import spark.implicits._
    // 6 files, two keys per file — the layout a COW merge mostly reuses
    val base = (0L until 12L).map(k => (s"g${k % 3}", k, k * 10L))
      .toDF("g", "k", "v").repartition(6, col("k"))
    SnapshotStore.commitOverwrite("ivcow", base)
    val r0 = IncrementalView.refresh(spark, "ivcow", "ivcowmv", Seq("g"), Seq("v"))
    assert(!r0.incremental)
    val total = SnapshotStore.files("ivcow", r0.baseVersion).size
    // CDC: update key 4 (g1, v 40 → 999), delete key 7 (g1)
    val changes = Seq(("u", 4L, "g1", 999L), ("d", 7L, null.asInstanceOf[String], 0L))
      .toDF("op0", "k", "g", "v")
      .select(col("k"), col("g"), col("v"),
        when(col("op0") === "u", "upsert").otherwise("delete").as("op"))
    val (v1, rewritten, filesTotal) =
      SnapshotStore.applyChangesCow(spark, "ivcow", changes, Seq("k"))
    assert(filesTotal == total && rewritten < total,
      s"COW must rewrite a strict subset: $rewritten of $filesTotal")
    // untouched files carried by reference into the new manifest
    val carried = SnapshotStore.files("ivcow", v1)
      .intersect(SnapshotStore.files("ivcow", r0.baseVersion)).size
    assert(carried == total - rewritten)
    val r1 = IncrementalView.refresh(spark, "ivcow", "ivcowmv", Seq("g"), Seq("v"))
    assert(r1.incremental, "COW advance must take the signed-delta path")
    assert(r1.filesScanned < filesTotal,
      s"scanned ${r1.filesScanned} of $filesTotal — not incremental")
    // the view equals a fresh group-by of the merged table
    val expect = SnapshotStore.read(spark, "ivcow").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(mvRows("ivcowmv") == expect)
    // a COW delete of an ENTIRE group drops its row from the view
    val dropG2 = (0L until 12L).filter(_ % 3 == 2)
      .map(k => (k, null.asInstanceOf[String], 0L, "delete"))
      .toDF("k", "g", "v", "op")
    SnapshotStore.applyChangesCow(spark, "ivcow", dropG2, Seq("k"))
    val r2 = IncrementalView.refresh(spark, "ivcow", "ivcowmv", Seq("g"), Seq("v"))
    assert(r2.incremental)
    assert(!mvRows("ivcowmv").contains("g2"))
  }

  test("K22-located COW: the Bloom index finds affected files without scanning; stale stats fall back") {
    import spark.implicits._
    val base = (0L until 12L).map(k => (s"g${k % 3}", k, k * 10L))
      .toDF("g", "k", "v").repartition(6, col("k"))
    SnapshotStore.commitOverwrite("ivcowb", base)
    val files = SnapshotStore.files("ivcowb", 0L)
    // build the per-file Bloom stats over the CURRENT version's files
    val stats = BloomIndex.build(spark,
      new java.io.File(new java.net.URI(files.head).getPath).getParent, "k")
      .cache()
    val changes = Seq((4L, "g1", 999L, "upsert"),
        (7L, null.asInstanceOf[String], 0L, "delete"))
      .toDF("k", "g", "v", "op")
    val (v1, rewritten, total) = SnapshotStore.applyChangesCow(
      spark, "ivcowb", changes, Seq("k"), bloomStats = Some(stats))
    assert(rewritten < total, s"bloom locate must rewrite a subset: $rewritten/$total")
    val got = SnapshotStore.read(spark, "ivcowb")
      .as[(String, Long, Long)].collect().toMap2
    assert(got.get(4L).contains(("g1", 999L)) && !got.contains(7L) &&
      got.size == 11, s"merged table wrong: $got")
    // stats now cover only v0's files — v1 added new ones, so a second
    // bloom-located merge must detect the gap and fall back to scan
    val more = Seq((4L, null.asInstanceOf[String], 0L, "delete")).toDF("k", "g", "v", "op")
    val (_, _, _) = SnapshotStore.applyChangesCow(
      spark, "ivcowb", more, Seq("k"), bloomStats = Some(stats))
    assert(SnapshotStore.read(spark, "ivcowb").filter(col("k") === 4L).count() == 0L,
      "stale stats must not let a delete survive")
  }

  test("K58 join MV: staggered appends advance by delta propagation, equal to the full join at every step; history rewrite falls back full") {
    import spark.implicits._
    def full(): Set[(Long, String, Long)] =
      SnapshotStore.read(spark, "jva").join(SnapshotStore.read(spark, "jvb"), Seq("k"))
        .as[(Long, String, Long)].collect().toSet
    def mv(): Set[(Long, String, Long)] =
      IncrementalView.read(spark, "jvmv").as[(Long, String, Long)].collect().toSet
    SnapshotStore.commitAppend("jva",
      Seq((1L, "a1"), (2L, "a2")).toDF("k", "av").repartition(2))
    SnapshotStore.commitAppend("jvb",
      Seq((1L, 10L), (1L, 11L), (3L, 30L)).toDF("k", "bv").repartition(1))
    val r0 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(!r0.incremental && mv() == full() &&
      mv() == Set((1L, "a1", 10L), (1L, "a1", 11L)))
    // ΔA arrives: its rows must join the WHOLE current B (incl. k=3)
    SnapshotStore.commitAppend("jva",
      Seq((3L, "a3")).toDF("k", "av").repartition(1))
    val r1 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(r1.incremental && r1.deltaFilesScanned == 1, s"$r1")
    assert(mv() == full() && mv()((3L, "a3", 30L)))
    // ΔB arrives: must join A as of the REFLECTED version (which now
    // includes a3) — and ΔA⋈ΔB must not double-count
    SnapshotStore.commitAppend("jvb",
      Seq((2L, 20L), (3L, 31L)).toDF("k", "bv").repartition(1))
    val r2 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(r2.incremental && r2.deltaFilesScanned == 1, s"$r2")
    assert(mv() == full() && mv()((2L, "a2", 20L)) && mv()((3L, "a3", 31L)))
    // BOTH deltas in one refresh: ΔA⋈B_new covers ΔA⋈ΔB, A_old⋈ΔB
    // covers the rest — exactly once each
    SnapshotStore.commitAppend("jva",
      Seq((4L, "a4")).toDF("k", "av").repartition(1))
    SnapshotStore.commitAppend("jvb",
      Seq((4L, 40L), (1L, 12L)).toDF("k", "bv").repartition(1))
    val r3 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(r3.incremental && r3.deltaFilesScanned == 2, s"$r3")
    assert(mv() == full(), "both-sides delta must still equal the full join")
    // no-op refresh scans nothing
    val r4 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(r4.incremental && r4.deltaFilesScanned == 0)
    // COMPOSITION: the join MV is itself an append-only snapshot
    // table, so a K25 aggregate MV over it advances incrementally on
    // the join MV's delta commits — the star-schema dashboard chain
    // (fact⋈dim → per-key rollup) maintained end-to-end without ever
    // rescanning either base
    val c0 = IncrementalView.refresh(spark, "jvmv", "jvaggmv", Seq("av"), Seq("bv"))
    assert(!c0.incremental, "first chained build is full (of the MV, not the bases)")
    SnapshotStore.commitAppend("jvb",
      Seq((4L, 41L)).toDF("k", "bv").repartition(1))
    IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    val c1 = IncrementalView.refresh(spark, "jvmv", "jvaggmv", Seq("av"), Seq("bv"))
    assert(c1.incremental, "the chained aggregate must advance on the join MV's append")
    val agg = IncrementalView.read(spark, "jvaggmv")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expect = full().groupBy(_._2)
      .map { case (a, rows) => a -> ((rows.size.toLong, rows.toSeq.map(_._3).sum)) }
    assert(agg == expect, s"$agg vs $expect")

    // an OVERWRITE on a base breaks the append-only subset relation:
    // the next refresh must go full and still be exact
    SnapshotStore.commitOverwrite("jva",
      Seq((1L, "A1"), (4L, "A4")).toDF("k", "av").repartition(1))
    val r5 = IncrementalView.refreshJoin(spark, "jva", "jvb", "jvmv", Seq("k"))
    assert(!r5.incremental, "history rewrite must force the full path")
    assert(mv() == full() && mv().forall(t => t._2 == "A1" || t._2 == "A4"))
  }

  implicit private class Tup3Map(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[Long, (String, Long)] =
      rows.map { case (g, k, v) => k -> ((g, v)) }.toMap
  }
}
