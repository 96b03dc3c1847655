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

  test("K7 AQE skew-join splits the hot partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the size gates so local-scale skew triggers the same
      // runtime split the 256MB defaults give a real cluster
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // allow the split even when it inserts an extra shuffle (a keyed
      // aggregation after the join would otherwise veto it)
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = spark.range(200000)
        .select(lit(7).as("k"), concat(lit("x"), col("id")).as("payload"))
        .unionAll(spark.range(200)
          .select((col("id") + 100).as("k"), lit("t").as("payload")))
      val small = ((7L +: (100L until 300L)).toDF("k"))
        .withColumn("dim", concat(lit("d"), col("k")))
      val joined = big.join(small, Seq("k")).groupBy("k").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join side (skew=true absent):\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
