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
}
