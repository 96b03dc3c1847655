package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at the given SF,
  * emitting ONE JSON line. Fixes from the r1 verdict:
  *  - a warm-up pass (q1 + a parquet scan) absorbs session/JIT/footer
  *    warm-up so the first timed query isn't penalized;
  *  - results are fully materialized through the noop sink (the whole
  *    plan executes — no count()-only shortcuts skipping projections);
  *  - failures are loud: stack trace to stderr, value -1 in the JSON,
  *    and a nonzero "errors" count instead of a silently-fast number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Either[Throwable, Unit] =
      try Right(SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
      catch { case e: Throwable => Left(e) }

    // Warm-up: untimed scan + one full query execution.
    materialize(SparkEntry.queries.keys.head).left.foreach(e =>
      System.err.println(s"[bench] warm-up failed: $e"))

    // One-time persisted-store builds (kg edge table + dedup signature
    // tables), paid HERE and reported as build_sec — the per-query
    // numbers below time the query-many read path only (r3 advice:
    // don't let min-of-two silently hide the build in whichever query
    // touches the store first).
    val buildSec =
      try graft.store.GraftStore.timeBuild(Seq(
        () => { graft.kg.KgQueries.storedEdges(spark, sfDir); () },
        () => graft.dedup.DedupQueries.warmStores(spark, sfDir),
        () => graft.graph.GraphQueries.warmStores(spark, sfDir),
        () => graft.sim.SimQueries.warmStores(spark, sfDir)))
      catch { case e: Throwable =>
        System.err.println(s"[bench] store build failed: $e"); -1.0 }

    var errors = 0
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      materialize(name) match {
        case Right(_) => (System.nanoTime() - t0) / 1e9
        case Left(e) =>
          errors += 1
          // one-line summary FIRST (name + root cause) so a truncated
          // log tail still identifies the failing query, then the trace
          var root: Throwable = e
          while (root.getCause != null && root.getCause != root) root = root.getCause
          System.err.println(
            s"[bench] $name FAILED: ${root.getClass.getName}: ${root.getMessage}")
          e.printStackTrace()
          -1.0
      }
    }
    // two timed passes per query, min taken: absorbs single-run VM /
    // GC noise so round-over-round numbers are comparable
    val results = SparkEntry.queries.keys.map { name =>
      val first = timeOnce(name)
      val sec = if (first < 0) first else math.min(first, timeOnce(name))
      name -> sec
    }.toSeq
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","build_sec":$buildSec,"queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
    if (errors > 0) sys.exit(1)
  }
}
