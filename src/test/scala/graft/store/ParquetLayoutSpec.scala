package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K30: the footer audit must report real physical facts — the spec
  * writes files whose layout it CONTROLS (forced-small row groups,
  * a dictionary-friendly low-cardinality column, snappy codec) and
  * checks the audit recovers them, then exercises the health
  * roll-up's small-row-group detector. */
class ParquetLayoutSpec extends SparkSpec {

  test("K30 footer audit recovers row groups, encodings, codec; health flags small row groups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pql").toString
    // ~1.6 MB of rows into 64 KB row groups → many row groups per file;
    // `grp` is 5-valued (dictionary-encodes), `payload` is unique text
    (0L until 20000L).map(i => (i, s"g${i % 5}", s"payload_$i"))
      .toDF("id", "grp", "payload")
      .coalesce(2)
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .option("compression", "snappy")
      .parquet(dir)
    val a = ParquetLayout.audit(spark, dir).cache()
    val files = a.select("file").distinct().count()
    assert(files == 2L, s"expected 2 files, got $files")
    // forced-small blocks → multiple row groups somewhere
    assert(a.count() > files, s"expected >1 row group per file")
    // row counts must reconcile exactly with the data
    assert(a.agg(sum("n_rows")).head.getLong(0) == 20000L)
    // every column chunk of every row group: snappy, and the
    // low-cardinality column keeps ≥1 dictionary-encoded column
    assert(a.filter(col("codec") =!= "SNAPPY").count() == 0L)
    assert(a.filter(col("dict_cols") < 1).count() == 0L)
    assert(a.filter(col("compressed_bytes") > col("uncompressed_bytes")).count() == 0L)
    // health roll-up: with a 10k threshold the 64 KB groups all flag
    val h = ParquetLayout.health(a, smallRowGroupRows = 10000L).collect()
    assert(h.length == 2)
    h.foreach { r =>
      assert(r.getAs[Long]("small_row_groups") > 0L)
      assert(r.getAs[Double]("compression_ratio") >= 1.0)
      assert(r.getAs[Double]("dict_coverage") > 0.0)
    }
    // and with generous blocks the same data audits clean
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pql2").toString
    spark.read.parquet(dir).coalesce(1)
      .write.mode("overwrite").parquet(dir2)
    val h2 = ParquetLayout.health(ParquetLayout.audit(spark, dir2)).collect()
    assert(h2.length == 1 && h2.head.getAs[Long]("n_row_groups") == 1L)
  }
}
