package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K47: the F27 delete repair APPLIED to the persisted graph as a
  * snapshot commit — the ANN index as a maintained lake table. */
class KnnMaintenanceSpec extends SparkSpec {

  test("K47 applying the delete repair commits a clean v1 and keeps v0 time-travelable") {
    import graft.store.SnapshotStore
    val (name, v0, v1) = SimQueries.applyDeleteRepair(spark, sfDir)
    assert(v1 > v0)
    val before = SnapshotStore.read(spark, name, Some(v0))
    val after = SnapshotStore.read(spark, name, Some(v1))
    val dead = (c: org.apache.spark.sql.Column) =>
      c % SimQueries.DeleteMod === 0
    // the tombstoned batch existed in v0 (the test is non-vacuous)
    assert(before.filter(dead(col("src_id")) || dead(col("nbr_id"))).count() > 0)
    // 1. no dead reference survives in v1, in either role
    assert(after.filter(dead(col("src_id")) || dead(col("nbr_id"))).count() == 0)
    // 2. affected sources carry EXACTLY the repaired adjacency
    val repaired = SimQueries.simKnnDelete(spark, sfDir)
    val affected = repaired.select("src_id").distinct()
    val afterAffected = after.join(affected, "src_id")
    assert(afterAffected.exceptAll(repaired).isEmpty &&
      repaired.exceptAll(afterAffected).isEmpty,
      "affected adjacency must equal the repair exactly")
    // 3. untouched sources' rows are carried byte-stable from v0
    val untouchedBefore = before
      .filter(!dead(col("src_id")) && !dead(col("nbr_id")))
      .join(affected, Seq("src_id"), "left_anti")
    val untouchedAfter = after.join(affected, Seq("src_id"), "left_anti")
    assert(untouchedAfter.exceptAll(untouchedBefore).isEmpty &&
      untouchedBefore.exceptAll(untouchedAfter).isEmpty,
      "untouched adjacency must carry over unchanged")
    // 4. time travel: v0 still reads its original content
    assert(before.count() > after.count(),
      "the pre-delete index must remain larger and readable at v0")
  }
}
