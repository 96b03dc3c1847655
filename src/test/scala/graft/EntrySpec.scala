package graft

class EntrySpec extends SparkSpec {

  test("driver contract: entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("src_label", "src", "rel", "dst_label", "dst", "weight"))
  }

  test("driver contract: every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("driver contract: every query runs and yields rows at sf0.001 or sf0.01") {
    // smoke-run everything the driver will run (row counts at the
    // smallest SF where the table exists)
    val dir = "/root/testdata/sf0.01"
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).limit(1).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
