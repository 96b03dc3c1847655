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
}
