package graft.dedup

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** E17: the streaming ingest-dedup face — E1's fingerprint on an
  * unbounded stream with watermark-bounded state, pinned against the
  * batch exact-dedup on the same rows including a cross-batch replay
  * and a re-spaced (whitespace-differing) duplicate. */
class DedupStreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("E17 streaming dedup suppresses replays across batches and matches the batch key set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (ts(0), 1L, "the quick brown fox"),
      (ts(1), 2L, "a wholly different document"),
      (ts(2), 3L, "the quick brown fox"),        // same-batch dup
      (ts(8), 4L, "  the  quick   brown fox "),  // cross-batch re-spaced replay
      (ts(9), 5L, "a third text"),
    )
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = DedupStreaming.dedupStreaming(
        mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)   // the replay arrives in batch 2
      q.processAllAvailable()
      val kept = spark.table("dedup_out")
        .select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // one survivor per distinct normalized text: ids 1 (or 3 — first
      // arrival within the batch), 2, 5; the re-spaced id-4 replay is
      // suppressed ACROSS batches
      assert(kept.length == 3, s"3 survivors expected, got ${kept.toSeq}")
      assert(!kept.map(_._1).contains(4L),
        s"the re-spaced cross-batch replay must be suppressed: ${kept.toSeq}")
      // key-set parity with the batch E1 operator on the same rows:
      // its survivors (is_dup = 0), mapped back to their fingerprints
      val docsDf = docs.toDF("ts", "doc_id", "text")
      val survivors = Dedup.exactDedup(docsDf, "doc_id", "text")
        .filter(col("is_dup") === 0).select("doc_id")
      val batchKeys = docsDf.join(survivors, "doc_id")
        .select(md5(regexp_replace(trim(col("text")), " +", " ")))
        .collect().map(_.getString(0)).toSet
      assert(kept.map(_._2).toSet == batchKeys,
        "stream and batch must agree on the surviving fingerprint set")
    } finally q.stop()
  }
}
