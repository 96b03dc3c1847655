package graft.monitor

import graft.SparkSpec

class MonitorSpec extends SparkSpec {

  test("J1 listener records completed queries with duration and rows") {
    import spark.implicits._
    val c = Monitor.register(spark)
    try {
      Seq(1, 2, 3).toDF("x").collect()
      // listener callbacks are async — poll for delivery
      var tries = 0
      while (c.snapshot.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val ms = c.snapshot
      assert(ms.nonEmpty, "no metrics captured")
      assert(ms.forall(_.durationMs > 0))
      assert(c.toJson.startsWith("[{\"name\":"))
    } finally spark.listenerManager.unregister(c)
  }

  test("J1 timed emits wall/cpu/heap JSON envelope") {
    val (res, json) = Monitor.timed("unit") { (1 to 1000).sum }
    assert(res == 500500)
    assert(json.contains("\"job\":\"unit\"") && json.contains("wall_ms") &&
      json.contains("cpu_ms") && json.contains("heap_mb"))
  }

  test("J2 streaming listener captures per-batch input volume and state size") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val c = Monitor.registerStreaming(spark)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("mon_out").outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1700000000000L)
      mem.addData((t0, "a"), (t0, "b"), (t0, "a"))
      q.processAllAvailable()
      // listener events are async — poll for delivery
      var tries = 0
      while (c.snapshot.forall(_.inputRows == 0) && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val ps = c.snapshot
      assert(ps.nonEmpty, "no progress captured")
      assert(ps.map(_.inputRows).sum == 3, s"input rows: $ps")
      assert(ps.exists(_.stateRows > 0), s"stateful agg must report state rows: $ps")
      assert(c.toJson.startsWith("[{\"query\":"))
    } finally {
      q.stop()
      spark.streams.removeListener(c)
    }
  }
}
