package graft.store

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K30: parquet physical-layout audit — the file-health scan a
  * 100 TB lake runs over its footers: row-group sizes and counts,
  * compression ratios, dictionary-encoding coverage. The failure
  * modes it catches are the quiet performance killers — a streaming
  * sink leaving thousands of KB-scale row groups (every scan pays
  * per-row-group setup), a column that silently fell out of
  * dictionary encoding (4-10× size regression), a table written
  * uncompressed. Reading a FOOTER costs two seeks and a few KB —
  * the audit never touches data pages, so auditing a million files
  * is a metadata job, not a table scan.
  *
  * Scale shape: the file list distributes over executors
  * (mapPartitions on a paths dataset); each task opens footers for
  * its slice via the Hadoop `InputFile` API (HDFS/S3A-portable, same
  * config story as the store layer). One output row per row group —
  * aggregate-scale, never data-scale.
  */
object ParquetLayout {

  /** One row per (file, row group): counts, byte sizes (uncompressed
    * and on-disk), column count, how many columns carry a dictionary
    * encoding, and the codec of the first column chunk. */
  def audit(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isFile) Seq(root.toString)
      else fs.listStatus(root).iterator.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq.sorted
    auditFiles(spark, files)
  }

  /** [[audit]] over an EXPLICIT file list — the entry point for
    * manifest-driven callers (the K33 fast count hands the snapshot
    * head's file list straight from the manifest, no directory
    * listing). */
  def auditFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    import spark.implicits._
    val slices = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    // Ship the SESSION Hadoop conf to executors: a bare Configuration()
    // would drop spark.hadoop.* (object-store creds/endpoints) and read
    // differently on s3a/hdfs than every other store-layer path.
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files).repartition(slices).mapPartitions { it =>
      val conf = confBc.value.value
      it.flatMap { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), conf))
        try {
          reader.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
            case (b, i) =>
              val cols = b.getColumns.asScala.toList
              (f, i, b.getRowCount, b.getTotalByteSize, b.getCompressedSize,
                cols.size,
                cols.count(_.getEncodings.asScala.exists(_.name.contains("DICTIONARY"))),
                cols.headOption.map(_.getCodec.name).getOrElse("NONE"))
          }
        } finally reader.close()
      }
    }.toDF("file", "row_group", "n_rows", "uncompressed_bytes",
      "compressed_bytes", "n_cols", "dict_cols", "codec")
  }

  /** The health roll-up over [[audit]]: per file the row-group count,
    * min/avg row-group rows (small-row-group disease), compression
    * ratio, and dictionary coverage — the one frame an alerting rule
    * thresholds. `smallRowGroupRows` marks row groups below the
    * given row count. */
  def health(audit: DataFrame, smallRowGroupRows: Long = 10000L): DataFrame =
    audit.groupBy("file").agg(
      count(lit(1)).as("n_row_groups"),
      sum("n_rows").as("n_rows"),
      min("n_rows").as("min_rg_rows"),
      sum(when(col("n_rows") < smallRowGroupRows, 1).otherwise(0)).as("small_row_groups"),
      round(sum("uncompressed_bytes").cast("double") /
        sum("compressed_bytes"), 4).as("compression_ratio"),
      round(avg(col("dict_cols").cast("double") / col("n_cols")), 4).as("dict_coverage"))
}
