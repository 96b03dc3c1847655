package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {

  private lazy val layout: (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, i % 17)).toDF("k", "v")
    val path = ZoneMap.ensureRangeLayout(spark, "zmspec", df, "k", 8)
    (path, ZoneMap.stats(spark, path, Seq("k")))
  }

  test("K19 zones are disjoint per file and cover the value range") {
    val (_, stats) = layout
    val zones = stats.collect()
      .map(r => (r.getLong(r.fieldIndex("k_min")), r.getLong(r.fieldIndex("k_max"))))
      .sortBy(_._1)
    assert(zones.length == 8)
    assert(zones.head._1 == 0L && zones.last._2 == 3999L)
    zones.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, s"zones overlap: $aMax >= $bMin")
    }
  }

  test("K19 a narrow window plans over a strict subset of files") {
    val (_, stats) = layout
    val survivors = ZoneMap.pruneFiles(stats, "k", lit(100L), lit(200L))
    assert(survivors.nonEmpty && survivors.length < 8,
      s"expected a strict subset, got ${survivors.length}/8")
  }

  test("K19 pruned read equals the full filtered read") {
    val (path, stats) = layout
    val pruned = ZoneMap.prunedRead(spark, path, stats, "k", lit(950L), lit(1450L))
      .agg(count(lit(1)), sum(col("k")), sum(col("v"))).collect().head
    val full = spark.read.parquet(path)
      .filter(col("k").between(950L, 1450L))
      .agg(count(lit(1)), sum(col("k")), sum(col("v"))).collect().head
    assert(pruned == full)
    assert(pruned.getLong(0) == 501L)
  }

  test("K19 an empty-overlap window reads zero files and zero rows") {
    val (path, stats) = layout
    assert(ZoneMap.pruneFiles(stats, "k", lit(9000L), lit(9999L)).isEmpty)
    val out = ZoneMap.prunedRead(spark, path, stats, "k", lit(9000L), lit(9999L))
    assert(out.count() == 0L)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v"))
  }
}
