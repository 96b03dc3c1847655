package graft.store

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.dedup.Dedup

/** Persisted signature/edge-table surface (r3): write-once /
  * query-many, with the candidate self-join exchange-free on the
  * bucketed banding key, and results identical to the self-contained
  * in-plan operators.
  */
class StoreSpec extends SparkSpec {

  private lazy val st = Dedup.writeSignatureTables(spark,
    Tables.documents(spark, sfDir), "doc_id", "text",
    k = 3, bands = 4, rowsPerBand = 3, key = "storespec")

  test("banded candidate self-join is exchange-free on the bucketed table") {
    noBroadcast {
      val banded = spark.table(st.banded)
      val a = banded.select(col("band"), col("bucket"), col("id").as("doc_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("doc_b"))
      val joined = a.join(b, Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
      assert(countExchanges(joined) == 0,
        "bucketed (band,bucket) self-join must not shuffle")
    }
  }

  test("countExchanges detects real shuffles (negative control for the assertion above)") {
    noBroadcast {
      // join on a NON-bucket-aligned key: must shuffle, and the counter
      // must see it through the AQE query-stage wrapping
      val banded = spark.table(st.banded)
      val a = banded.select(col("bucket"), col("id").as("doc_a"))
      val b = banded.select(col("bucket"), col("id").as("doc_b"))
      val joined = a.join(b, Seq("bucket")).filter(col("doc_a") < col("doc_b"))
      assert(countExchanges(joined) > 0,
        "a non-bucket-aligned join must shuffle; if this is 0 the counter is blind")
    }
  }

  test("store-backed minhash pairs equal the in-plan operator") {
    val docs = Tables.documents(spark, sfDir)
    val fromStore = Dedup.minhashPairsFromBanded(spark.table(st.banded))
      .orderBy("doc_a", "doc_b").collect().toSeq
    val inPlan = Dedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 4, 3)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(fromStore == inPlan)
  }

  test("store-backed jaccard pairs equal the in-plan operator") {
    val docs = Tables.documents(spark, sfDir)
    val fromStore = Dedup.jaccardVerify(
        Dedup.minhashPairsFromBanded(spark.table(st.banded)),
        spark.table(st.sig).select(col("id"), col("sh")), 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val inPlan = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 4, 3, 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(fromStore == inPlan)
  }

  test("ensureBucketed memoizes: the build runs once per (session, name)") {
    var builds = 0
    def build = { builds += 1; Tables.region(spark, sfDir) }
    val n1 = GraftStore.ensureBucketed(spark, "graft_memo_test", 2, Seq("r_regionkey"))(build)
    val n2 = GraftStore.ensureBucketed(spark, "graft_memo_test", 2, Seq("r_regionkey"))(build)
    assert(n1 == n2 && builds == 1)
    assert(spark.table(n1).count() == Tables.region(spark, sfDir).count())
  }

  test("ensureBucketed writes exactly one file per bucket regardless of input partitioning") {
    import spark.implicits._
    // 64 input partitions × 8 buckets exploded into 512 files before
    // the r16 pre-repartition fix (graph_bfs paid 2048 file opens per
    // hop on undh2); the build-time shuffle must collapse that to
    // bucket-count files
    val name = GraftStore.ensureBucketed(spark, "graft_onefile_bucket", 8, Seq("k")) {
      spark.range(0, 10000, 1, 64).select(col("id").as("k"), (col("id") * 2).as("v"))
    }
    val loc = spark.sql(s"DESCRIBE FORMATTED $name").collect()
      .find(_.getString(0).trim == "Location").get.getString(1)
    val files = new java.io.File(new java.net.URI(loc)).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 8,
      s"expected one file per bucket, got ${files.length}")
    assert(spark.table(name).count() == 10000L)
  }

  test("ensureBucketed fails fast when a name is reused with different parameters") {
    GraftStore.ensureBucketed(spark, "graft_memo_params", 2, Seq("r_regionkey")) {
      Tables.region(spark, sfDir)
    }
    intercept[IllegalArgumentException] {
      GraftStore.ensureBucketed(spark, "graft_memo_params", 4, Seq("r_name")) {
        Tables.region(spark, sfDir)
      }
    }
  }

  test("K10 compaction collapses a many-small-files table, content byte-identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 40 tiny files of 25 rows each
    (0L until 1000L).map(i => (i, s"row_$i")).toDF("id", "s")
      .repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
      .collect().map(_.toString).sorted
    val stats = GraftStore.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(stats.filesBefore >= 40, s"$stats")
    assert(stats.filesAfter == 1, s"one file at a 1 GiB target: $stats")
    assert(stats.rows == 1000L)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq, "content must round-trip")
    // staging/backup directories are gone
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("compact")),
      s"no staging leftovers: ${parent.mkString(",")}")
  }
}
