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

  test("I59 streaming admission decontamination: per-batch verdicts equal the batch audit; a replayed batch publishes nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // frozen held-out set: one benchmark-ish sentence
    val evalDocs = Seq((100L, "the quick brown fox jumps over it"))
      .toDF("doc_id", "text")
    val evalGrams = DedupQueries.docGrams(evalDocs).select("gh").distinct()
      .localCheckpoint(true)
    val incoming = Seq(
      (1L, "the quick brown fox jumps over it again and again"), // leaks 2+ grams
      (2L, "a wholly different training document with many words"),
      (3L, "short doc"),                                         // < n words: 0 grams
      (4L, "again the quick brown fox jumps near the fence"),    // leaks 1 gram
    )
    val table = "decontam_sink_t"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(DedupStreaming.decontaminateSink(evalGrams, table) _)
      .start()
    try {
      mem.addData(incoming.take(2): _*)
      q.processAllAvailable()
      mem.addData(incoming.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.store.SnapshotStore.read(spark, table)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // stream ≡ batch: the same audit over all incoming rows at once
    val want = DedupQueries.decontaminateAgainst(
        incoming.toDF("doc_id", "text"), evalGrams)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == want, s"\nstream $got\nbatch  $want")
    assert(got(1L)._2 == 1 && got(4L)._2 == 1,
      s"the leaked benchmark grams must flag: $got")
    assert(got(2L) == ((0L, 0)) && got(3L) == ((0L, 0)),
      s"clean and sub-n docs keep zero rows: $got")
    // exactly-once: replaying batch 0 through the sink publishes no
    // second version and no duplicate verdict rows
    val versionsBefore = graft.store.SnapshotStore.versions(table)
    DedupStreaming.decontaminateSink(evalGrams, table)(
      incoming.take(2).toDF("doc_id", "text"), 0L)
    assert(graft.store.SnapshotStore.versions(table) == versionsBefore,
      "a replayed batchId must no-op through the store sink")
    assert(graft.store.SnapshotStore.read(spark, table).count() == 4L)
  }
}
