package graft.store

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K19: file-level zone-map index + pruned reader — the file-skipping
  * layer ABOVE what the engine already does for free. Spark prunes
  * partitions (directory level) and parquet row groups (footer
  * min/max, after a footer read per file); what a 100 TB unpartitioned
  * table still pays is LISTING AND FOOTER-READING every file on every
  * query. A zone map is the classic warehouse answer (Netezza zone
  * maps, Snowflake micro-partition metadata, Delta/Iceberg file
  * stats): one tiny stats row per file (min/max of the clustered
  * columns), consulted FIRST so the scan plans over only the files
  * whose range intersects the predicate.
  *
  * The surface here is deliberately explicit rather than a catalog
  * hook: `ensureRangeLayout` writes the table range-clustered on the
  * zone column (repartitionByRange + sortWithinPartitions — one
  * disjoint range per file, which is what makes zones selective),
  * `stats` derives the per-file min/max with one distributed
  * aggregation keyed on `input_file_name()`, and `prunedRead` filters
  * the stats table by interval overlap, collects ONLY the surviving
  * file names (the driver holds a file list either way — the same
  * thing FileSourceScanExec holds after listing), and re-applies the
  * predicate as a residual filter since zone granularity is the file.
  * Both layout and stats are write-once / query-many (memoized per
  * (session, name), stats persisted via [[GraftStore]]).
  */
object ZoneMap {

  private val layouts = TrieMap.empty[(SparkSession, String), (String, String, Int)]

  private lazy val base: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_zm_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Write `df` range-clustered on `rangeCol` into ~`numFiles` files
    * (one disjoint value range per file); memoized per (session,
    * name). Returns the layout path. */
  def ensureRangeLayout(spark: SparkSession, name: String, df: => DataFrame,
      rangeCol: String, numFiles: Int): String = {
    val (path, col0, n0) = layouts.getOrElseUpdate((spark, name), {
      val path = s"$base/$name"
      df.repartitionByRange(numFiles, col(rangeCol))
        .sortWithinPartitions(rangeCol)
        .write.mode("overwrite").parquet(path)
      (path, rangeCol, numFiles)
    })
    // same loud-mismatch contract as GraftStore.ensureBucketed: a name
    // reused with different clustering must not silently serve the old
    // layout (zones would be non-disjoint for the new column)
    require(col0 == rangeCol && n0 == numFiles,
      s"layout '$name' was built on ($col0, $n0 files) but requested " +
        s"($rangeCol, $numFiles) — use a distinct name per parameterization")
    path
  }

  /** Per-file min/max stats for `cols` — one distributed aggregation,
    * one output row per file. */
  def stats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The file names whose [min, max] zone intersects [lo, hi]. */
  def pruneFiles(statsDf: DataFrame, c: String, lo: Column, hi: Column): Array[String] =
    statsDf.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
      .select("file").collect().map(_.getString(0))

  /** Read only the zone-surviving files of `path`, with the range
    * predicate re-applied as a residual filter (zones are file-
    * granular). An empty survivor set returns an empty frame with the
    * layout's schema — zero files touched. */
  def prunedRead(spark: SparkSession, path: String, statsDf: DataFrame,
      c: String, lo: Column, hi: Column): DataFrame = {
    val files = pruneFiles(statsDf, c, lo, hi)
    val full = spark.read.parquet(path)
    if (files.isEmpty) full.limit(0)
    else spark.read.schema(full.schema).parquet(files: _*)
      .filter(col(c) >= lo && col(c) <= hi)
  }
}
