package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points matched to [lo, hi) ranges (SURVEY §2
  * K4).
  *
  * The naive formulation — a cross join filtered on the range predicate
  * — is quadratic: Spark plans a BroadcastNestedLoopJoin, and every
  * point is tested against every range. The scale path is GRID
  * BUCKETING: each range explodes to the fixed-width buckets it covers,
  * each point maps to exactly one bucket, and the join becomes an
  * EQUI-join on the bucket id (hash-shuffleable, AQE-skew-splittable)
  * followed by the precise predicate. Cost: O(points + ranges ×
  * avg_span/width + matches). Pick `bucketWidth` near the median range
  * span, so each range covers O(1) buckets.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `ranges` whose
    * [loCol, hiCol) interval contains pointCol. Output: all point
    * columns + all range columns. */
  def pointInRange(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // a range covers buckets floor(lo/w)..floor(hi/w); the last bucket
    // is included even when hi sits exactly on its boundary — the
    // precise predicate below removes any overreach
    val rb = ranges.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pb.join(rb, Seq("__bucket"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
