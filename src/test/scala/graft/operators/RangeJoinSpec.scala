package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("grid-bucketed range join equals the naive cross join, boundaries included") {
    val points = Seq(1L -> 0.0, 2L -> 9.99, 3L -> 10.0, 4L -> 25.0,
      5L -> 49.999, 6L -> 50.0, 7L -> 75.3, 8L -> 100.0)
      .toDF("id", "p")
    // overlapping bands; band b2's hi sits exactly on a bucket boundary
    val ranges = Seq(("b0", 0.0, 10.0), ("b1", 5.0, 50.0),
      ("b2", 40.0, 80.0), ("b3", 75.3, 120.0)).toDF("band", "lo", "hi")
    val fast = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 10.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    val naive = points.crossJoin(ranges)
      .filter(col("lo") <= col("p") && col("p") < col("hi"))
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(fast == naive)
    // spot-check semantics: lo inclusive (0.0 in b0, 75.3 in b3),
    // hi exclusive (10.0 NOT in b0, 50.0 NOT in b1), overlap matched twice
    assert(fast.contains((1L, "b0")) && fast.contains((7L, "b3")))
    assert(!fast.contains((3L, "b0")) && !fast.contains((6L, "b1")))
    assert(fast.count(_._1 == 2L) == 2) // 9.99 in b0 AND b1
  }

  test("no duplicate matches when a range spans many buckets") {
    val points = Seq(1L -> 33.0).toDF("id", "p")
    val ranges = Seq(("wide", 0.0, 1000.0)).toDF("band", "lo", "hi")
    val out = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 10.0)
    assert(out.count() == 1)
  }
}
