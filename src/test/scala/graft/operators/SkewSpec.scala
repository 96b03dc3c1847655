package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 20k rows of one hot key + a tail of 100 other keys
    val big = spark.range(20000).select(lit(7).as("k"), col("id").as("payload"))
      .unionAll(spark.range(100).select((col("id") + 100).as("k"), col("id").as("payload")))
    val small = (Seq(7) ++ (100 until 200)).toDF("k")
      .withColumn("dim", concat(lit("d"), col("k")))
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
    assert(plain.size == 20100)
  }

  test("salt spreads the hot key across sub-keys") {
    import spark.implicits._
    val big = spark.range(10000).select(lit(7).as("k"), col("id").as("payload"))
    val spread = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, "all 8 salt buckets should be hit")
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.min * 2, s"uneven spread: ${counts.toSeq}")
  }
}
