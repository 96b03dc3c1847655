package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {

  /** Table clustered on k (8 disjoint files) but indexed and probed on
    * the UNRELATED high-cardinality column uid — the shape where zone
    * maps are useless and the Bloom index earns its keep. Each uid
    * appears exactly once, so every lookup's true home is ONE file. */
  private lazy val layout: (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, (i * 2654435761L) % 100000L))
      .toDF("k", "uid")
    val path = ZoneMap.ensureRangeLayout(spark, "bloomspec", df, "k", 8)
    (path, BloomIndex.build(spark, path, "uid", expectedPerFile = 1000L)
      .localCheckpoint(true))
  }

  test("K22 no false negatives: every present uid is found through the index") {
    val (path, stats) = layout
    val present = Seq(0L, 997L, 3999L).map(i => (i * 2654435761L) % 100000L)
    present.foreach { uid =>
      val got = BloomIndex.lookup(spark, path, stats, "uid", uid)
        .select("uid").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(uid), s"uid $uid must be found, got $got")
    }
  }

  test("K22 a probe whose boxed type differs from the column type still finds the row") {
    val (path, stats) = layout
    // uid 0 exists (i=0); probe with an Int — the lookup must cast to
    // the column's LongType before hashing, or the hash never matches
    val got = BloomIndex.lookup(spark, path, stats, "uid", 0)
      .select("uid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L), s"Int probe against Long column must hit, got $got")
  }

  test("K22 lookups plan over far fewer files than the table holds") {
    val (_, stats) = layout
    val probed = (0 until 50).map { i =>
      val uid = ((i * 81L) * 2654435761L) % 100000L // i*81 <= 3969: present
      BloomIndex.pruneFiles(stats, uid).length
    }
    assert(probed.forall(n => n >= 1 && n <= 8))
    // ~1% fpp at the sized filter: on average a point lookup should
    // touch ~1 file, not all 8; allow slack but demand real pruning
    assert(probed.sum <= 2 * probed.length,
      s"mean files/lookup ${probed.sum.toDouble / probed.length} — index not selective")
  }

  test("K22 an absent key usually skips every file, and always returns zero rows") {
    val (path, stats) = layout
    val out = BloomIndex.lookup(spark, path, stats, "uid", 100001L)
    assert(out.count() == 0L)
  }
}
