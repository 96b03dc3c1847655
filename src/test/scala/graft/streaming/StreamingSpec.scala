package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private lazy val evs = Seq(
    // user 1: two sessions (gap 40min between min 20 and min 61)
    Streaming.Ev(1L, ts(0), 1.0), Streaming.Ev(1L, ts(10), 2.0), Streaming.Ev(1L, ts(20), 3.0),
    Streaming.Ev(1L, ts(61), 4.0), Streaming.Ev(1L, ts(70), 5.0),
    // user 2: one session
    Streaming.Ev(2L, ts(5), 1.5), Streaming.Ev(2L, ts(25), 2.5),
  )

  test("I2 streaming sessionization matches the batch gaps-and-islands oracle") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.Ev]
    val q = Streaming.sessionsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // watermark-advancing flush event (far future, separate user)
      mem.addData(Streaming.Ev(99L, ts(10000), 0.0))
      q.processAllAvailable()
      mem.addData(Streaming.Ev(99L, ts(20000), 0.0)) // second batch so timeouts fire
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter(col("user_id") =!= 99L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val batch = Streaming.sessionsBatch(evs.toDF(), Streaming.SessionGapSec)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
        .toSet
      assert(batch.size == 3)
      assert(streamed == batch,
        s"streaming $streamed\nvs batch $batch")
    } finally q.stop()
  }

  test("I2 native session_window aggregation matches gaps-and-islands sessionization") {
    import spark.implicits._
    // the built-in session_window must agree with the hand-rolled
    // formulation the oracle pins (start = min ts, end bound = last
    // event + gap, same membership) — cross-validates both shapes
    val df = evs.toDF()
    val native = df
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${Streaming.SessionGapSec} seconds").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        (col("w.end").cast("long") - Streaming.SessionGapSec)
          .cast("timestamp").as("session_end_upper"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4))).toSet
    val batch = Streaming.sessionsBatch(df, Streaming.SessionGapSec)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(4), r.getDouble(5))).toSet
    assert(native.nonEmpty && native == batch,
      s"native $native vs gaps-and-islands $batch")
  }

  test("I1 streaming windowed counts match batch on closed windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      val data = Seq((ts(0), "click", 1.0), (ts(2), "click", 2.0),
        (ts(6), "view", 3.0), (ts(11), "click", 4.0))
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((ts(10000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((ts(20000), "flush", 0.0)); q.processAllAvailable()
      val streamed = spark.table("win_out").filter(col("event_type") =!= "flush")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Streaming.windowedCounts(asEvents(data.toDF()))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("I16 streaming sliding windows match batch; each event in 2 windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val q = Streaming.slidingCounts(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("slide_out").outputMode("append").start()
    try {
      val data = Seq((ts(0), "click", 1.0), (ts(6), "click", 2.0), (ts(12), "view", 3.0))
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((ts(10000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((ts(20000), "flush", 0.0)); q.processAllAvailable()
      val streamed = spark.table("slide_out").filter(col("event_type") =!= "flush")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Streaming.slidingCounts(asEvents(data.toDF()))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      // sliding invariant: every event contributes to exactly 2 windows
      assert(batch.toSeq.map(_._3).sum == 2L * data.size)
    } finally q.stop()
  }

  test("I12 streaming dedup drops identity repeats, also across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("user_id", "event_type", "ts")
    val q = Streaming.dedupWithinWatermark(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData((1L, "click", ts(0)), (1L, "click", ts(0)), (1L, "view", ts(1)))
      q.processAllAvailable()
      // repeat of (1, click, t0) in a LATER microbatch, still inside
      // the watermark window — state must remember and drop it
      mem.addData((1L, "click", ts(0)), (2L, "click", ts(2)))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSeq
      assert(out.length == 3)
      assert(out.toSet == Set((1L, "click", ts(0)), (1L, "view", ts(1)),
        (2L, "click", ts(2))))
    } finally q.stop()
  }

  test("I4 file stream lands checkpointed parquet output") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stream")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckp = base.resolve("ckp").toString
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val d2 = Seq((3L, "c")).toDF("id", "s")
    d1.write.mode("append").parquet(src)
    d2.write.mode("append").parquet(src)
    val q = Streaming.fileStreamToParquet(spark, src, d1.schema, "parquet", out, ckp)
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
    assert(got.count() == 3)
    assert(got.columns.toSeq == Seq("id", "s"))
  }

  test("I4 restart from checkpoint processes only NEW files — no duplicates") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_restart")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckp = base.resolve("ckp").toString
    val schema = Seq((1L, "a")).toDF("id", "s").schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("append").parquet(src)
    val q1 = Streaming.fileStreamToParquet(spark, src, schema, "parquet", out, ckp)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 2)
    // new files arrive while no query runs; the restarted query must
    // resume from the checkpoint and emit ONLY them (exactly-once sink)
    Seq((3L, "c")).toDF("id", "s").write.mode("append").parquet(src)
    val q2 = Streaming.fileStreamToParquet(spark, src, schema, "parquet", out, ckp)
    q2.awaitTermination(60000)
    val got = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")), s"duplicated or lost rows: $got")
  }

  test("K5 histogram sketch aggregates inside streaming state; matches batch sketch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the mergeable TypedImperativeAggregate must serialize through
    // the state store and merge across micro-batches — the same
    // store-and-merge contract the batch/store path relies on
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "k", "x")
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("k").agg(
        graft.functions.VectorFunctions.qhist(spark, col("x"), 0.0, 10.0, 5).as("h"))
    val q = agg(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("qh_out").outputMode("complete").start()
    try {
      val b1 = Seq((ts(0), "a", 1.0), (ts(1), "a", 3.0), (ts(2), "b", 9.0))
      val b2 = Seq((ts(3), "a", 3.5), (ts(4), "b", 0.5))
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*) // must MERGE into batch-1 state, not replace
      q.processAllAvailable()
      val streamed = spark.table("qh_out")
        .as[(String, Seq[Long])].collect().toMap
      val batch = agg(asEvents((b1 ++ b2).toDF()))
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(batch("a") == Seq(1L, 2L, 0L, 0L, 0L)) // 1.0 | 3.0, 3.5 (bin width 2)
      assert(batch("b") == Seq(1L, 0L, 0L, 0L, 1L))
    } finally q.stop()
  }

  test("K13 CMS sketch aggregates inside streaming state; matches batch sketch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // same store-and-merge contract as K5: the counter matrix must
    // serialize through the state store and vector-ADD across
    // micro-batches (merge-order independence makes streamed == batch
    // exact, counter for counter)
    val mem = MemoryStream[(Timestamp, String, String)]
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "k", "item").groupBy("k").agg(
        graft.functions.VectorFunctions.cms(spark, col("item"), 2, 8).as("sk"))
    val q = agg(mem.toDF())
      .writeStream.format("memory").queryName("cms_out").outputMode("complete").start()
    try {
      val b1 = Seq((ts(0), "a", "x"), (ts(1), "a", "y"), (ts(2), "b", "x"))
      val b2 = Seq((ts(3), "a", "x"), (ts(4), "b", "z"))
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*) // must MERGE into batch-1 counters, not replace
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .as[(String, Seq[Long])].collect().toMap
      val batch = agg((b1 ++ b2).toDF())
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(batch("a").sum == 2 * 3 && batch("b").sum == 2 * 2,
        "each row of the matrix counts every item once")
    } finally q.stop()
  }

  test("I4 idempotent foreachBatch sink: a replayed batch does not duplicate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("graft_idem").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "s")
      .writeStream
      .foreachBatch(Streaming.idempotentBatchSink(base) _)
      .option("checkpointLocation", s"$base/ckp")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val first = Streaming.readCommittedBatches(spark, base)
        .as[(Long, String)].collect().toSet
      assert(first == Set((1L, "a"), (2L, "b"), (3L, "c")))
      // simulate the at-least-once replay window: re-deliver batch 0
      // through the sink function with DIFFERENT content — the marker
      // must make the sink skip, leaving the original commit untouched
      // (content-differing replay is exactly what a non-idempotent
      // sink would corrupt on)
      Streaming.idempotentBatchSink(base)(Seq((9L, "X")).toDF("id", "s"), 0L)
      val after = Streaming.readCommittedBatches(spark, base)
        .as[(Long, String)].collect().toSet
      assert(after == first, s"replay must be a no-op: $after")
    } finally q.stop()
  }

  test("I9 streaming weekly activity + cohort finishing match the batch retention matrix") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("user_id", "ts", "event_type")
    val q = Streaming.weeklyActive(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("weekly_out").outputMode("append").start()
    try {
      val wk = 7 * 1440 // minutes per week
      val data = Seq(
        (1L, ts(0), "signup"), (1L, ts(10), "view"),      // cohort w0, active w0
        (1L, ts(wk + 5), "click"),                        // active w1
        (2L, ts(wk + 10), "signup"),                      // cohort w1
        (2L, ts(2 * wk + 3), "view"),                     // active w2
        (3L, ts(5), "view"))                              // never signs up
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*) // cross-batch: counts merge in state
      q.processAllAvailable()
      mem.addData((99L, ts(100000), "flush")); q.processAllAvailable()
      mem.addData((99L, ts(200000), "flush")); q.processAllAvailable()
      val streamedActive = spark.table("weekly_out")
        .filter(col("user_id") =!= 99L).select("user_id", "week")
      val batchDf = asEvents(data.toDF())
      val cohorts = EventOps.cohortWeeks(batchDf, "signup")
      val streamed = EventOps.retentionFromActivity(streamedActive, broadcast(cohorts))
        .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
      val batch = EventOps.retention(batchDf, "signup")
        .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
      // non-cohort user 3 must not appear in any cell: user 1 hits
      // offsets 0,1 of cohort-week w0; user 2 offsets 0,1 of w1
      assert(batch.toSeq.map(_._3).sum == 4L, s"cells: $batch")
    } finally q.stop()
  }

  test("I4 offset-keyed MERGE sink: replayed offsets with different content are a no-op") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val store = Files.createTempDirectory("graft_offsets").toString + "/store"
    val mem = MemoryStream[(String, Int, Long, String)]
    val asKafka = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("topic", "partition", "offset", "payload")
    val q = asKafka(mem.toDF())
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        Streaming.offsetMergeSink(store)(df, id))
      .start()
    try {
      mem.addData(("t", 0, 0L, "a"), ("t", 0, 1L, "b"))
      q.processAllAvailable()
      mem.addData(("t", 0, 2L, "c"))
      q.processAllAvailable()
      // the at-least-once replay window: offsets 0-1 re-delivered with
      // DIFFERENT payloads (plus a genuinely new offset 3) — the merge
      // must keep the original rows and admit only the new key
      Streaming.offsetMergeSink(store)(
        asKafka(Seq(("t", 0, 0L, "X"), ("t", 0, 1L, "Y"), ("t", 0, 3L, "d")).toDF()), 0L)
      val out = spark.read.parquet(store)
        .as[(String, Int, Long, String)].collect().toSet
      assert(out == Set(("t", 0, 0L, "a"), ("t", 0, 1L, "b"),
        ("t", 0, 2L, "c"), ("t", 0, 3L, "d")), s"store: $out")
    } finally q.stop()
  }

  test("I38 dead-letter split sink: both tables land exactly-once, replay converges") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.store.SnapshotStore
    val mem = MemoryStream[Streaming.ThEv]
    val valid = org.apache.spark.sql.functions.col("user_id") > 0L
    val q = mem.toDS().toDF()
      .writeStream
      .foreachBatch(Streaming.deadLetterSink("dlq_ok", "dlq_bad", valid) _)
      .start()
    try {
      mem.addData(
        Streaming.ThEv(1L, 7L, ts(0)), Streaming.ThEv(2L, 0L, ts(1)),
        Streaming.ThEv(3L, 9L, ts(2)))
      q.processAllAvailable()
      mem.addData(Streaming.ThEv(4L, 0L, ts(3)), Streaming.ThEv(5L, 2L, ts(4)))
      q.processAllAvailable()
      def ids(t: String) = SnapshotStore.read(spark, t)
        .select("event_id").as[Long].collect().toSet
      assert(ids("dlq_ok") == Set(1L, 3L, 5L))
      assert(ids("dlq_bad") == Set(2L, 4L))
      // dead-letter rows carry their batchId for audit joins
      assert(SnapshotStore.read(spark, "dlq_bad")
        .select("batch_id").as[Long].collect().toSet == Set(0L, 1L))
      // the crash-replay window: batch 0 re-delivered — BOTH tables
      // must no-op on the known batchId, nothing duplicates
      val replay = Seq(
        Streaming.ThEv(1L, 7L, ts(0)), Streaming.ThEv(2L, 0L, ts(1)),
        Streaming.ThEv(3L, 9L, ts(2))).toDF()
      Streaming.deadLetterSink("dlq_ok", "dlq_bad", valid)(replay, 0L)
      assert(ids("dlq_ok") == Set(1L, 3L, 5L) && ids("dlq_bad") == Set(2L, 4L))
      assert(SnapshotStore.versions("dlq_ok").size == 2 &&
        SnapshotStore.versions("dlq_bad").size == 2)
    } finally q.stop()
  }

  test("A19/I38 streaming WET face: file-streamed WARC chunks split into corpus + dead letter; stream ≡ batch across micro-batches") {
    import spark.implicits._
    import graft.store.SnapshotStore
    import graft.sources.IngestQueries
    val base = Files.createTempDirectory("graft_wet")
    val src = base.resolve("src").toString
    val ckp = base.resolve("ckp").toString
    // one fixture generator drives both faces: ids cycle garbage (%9),
    // truncated fetch (%5) and record type (%3), so the stream's two
    // micro-batches exercise every accept/reject class
    def docs(ids: Seq[Long]) = ids
      .map(i => (i, s"wet payload number $i with several more words"))
      .toDF("doc_id", "text")
    val all = (1L to 60L).toSeq
    val bin1 = IngestQueries.warcContainerOf(docs(all.take(30)))
    val bin2 = IngestQueries.warcContainerOf(docs(all.drop(30)))
    bin1.coalesce(1).write.mode("append").parquet(src)
    val q = spark.readStream.schema(bin1.schema).parquet(src)
      .writeStream.option("checkpointLocation", ckp)
      .foreachBatch(Streaming.wetCorpusSink("wet_corpus", "wet_dlq") _)
      .start()
    try {
      q.processAllAvailable()
      bin2.coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // batch face over the SAME fixture, the WET gate verbatim
    val parsed = IngestQueries.withWarcRecord(
      IngestQueries.warcContainerOf(docs(all)), "_bin")
    val gate = col("valid_warc") === 1 &&
      col("warc_type") === "response" && col("truncated") === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "target_uri", "payload_md5", "payload")
      .as[(Long, String, String, String)].collect().toSet
    val batchOk = rows(parsed.filter(gate))
    assert(batchOk.nonEmpty)
    assert(rows(SnapshotStore.read(spark, "wet_corpus")) == batchOk,
      "streamed corpus must equal the batch WET slice")
    val streamDead = SnapshotStore.read(spark, "wet_dlq")
      .select("doc_id").as[Long].collect().toSet
    val batchDead = parsed.filter(!coalesce(gate, lit(false)))
      .select("doc_id").as[Long].collect().toSet
    assert(streamDead == batchDead && streamDead.nonEmpty,
      "every rejected record must be preserved in the dead letter")
    // all three reject classes are present and disjoint from the corpus
    assert(streamDead.exists(_ % 9 == 0) &&
      streamDead.exists(i => i % 5 == 0 && i % 9 != 0) &&
      streamDead.exists(i => i % 3 != 0 && i % 9 != 0 && i % 5 != 0))
    assert(batchOk.map(_._1).intersect(streamDead).isEmpty)
    // two micro-batches → two exactly-once versions per table; a
    // replayed first batch no-ops on its batchId
    assert(SnapshotStore.versions("wet_corpus").size == 2 &&
      SnapshotStore.versions("wet_dlq").size == 2)
    Streaming.wetCorpusSink("wet_corpus", "wet_dlq")(bin1, 0L)
    assert(SnapshotStore.versions("wet_corpus").size == 2 &&
      rows(SnapshotStore.read(spark, "wet_corpus")) == batchOk)
  }

  test("I53 incremental corpus admission: URL/fingerprint first-wins within and across batches; replay converges") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.store.SnapshotStore
    val mem = MemoryStream[(Long, String, String, String)]
    val q = mem.toDS().toDF("doc_id", "canonical", "fp", "payload")
      .writeStream
      .foreachBatch(Streaming.corpusAdmitSink("adm_corpus") _)
      .start()
    try {
      mem.addData((1L, "u1", "fA", "a"), (2L, "u1", "fB", "b"),
        (3L, "u2", "fA", "c"), (4L, "u3", "fC", "d"))
      q.processAllAvailable()
      mem.addData((5L, "u1", "fD", "e"), (6L, "u4", "fC", "f"),
        (7L, "u4", "fE", "g"), (8L, "u5", "fF", "h"))
      q.processAllAvailable()
    } finally q.stop()
    def ids = SnapshotStore.read(spark, "adm_corpus")
      .select("doc_id").as[Long].collect().toSet
    // batch 1: 2 loses u1 to 1; 3 loses fA to 1; 4 admits.
    // batch 2: 5 loses u1 to the CORPUS; 6 loses fC to the corpus;
    // 7 loses u4 to 6 WITHIN the batch even though 6 was itself
    // rejected (keys gate independently — the documented conservative
    // policy: never a duplicate, occasionally an extra rejection);
    // 8 admits.
    assert(ids == Set(1L, 4L, 8L), s"admitted: $ids")
    assert(SnapshotStore.versions("adm_corpus").size == 2)
    // no duplicate keys ever land
    val c = SnapshotStore.read(spark, "adm_corpus")
    assert(c.groupBy("canonical").count().filter(col("count") > 1).isEmpty)
    assert(c.groupBy("fp").count().filter(col("count") > 1).isEmpty)
    // replayed first batch: anti-joins empty it AND the batchId no-ops
    Streaming.corpusAdmitSink("adm_corpus")(
      Seq((1L, "u1", "fA", "a"), (4L, "u3", "fC", "d"))
        .toDF("doc_id", "canonical", "fp", "payload"), 0L)
    assert(ids == Set(1L, 4L, 8L) &&
      SnapshotStore.versions("adm_corpus").size == 2)
  }

  test("I54 streaming corpus gate: full A22 gate per micro-batch equals the batch corpus_keep on the shared fixture; replay idempotent") {
    import spark.implicits._
    import graft.store.SnapshotStore
    import graft.sources.IngestQueries
    // the batch reference: A22's oracled gate over the sf fixture
    val batch = IngestQueries.ingCorpusGate(spark, sfDir)
      .select("doc_id", "canonical", "allowed", "url_unique",
        "gopher_keep", "is_dup", "corpus_keep")
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(batch.nonEmpty && batch.values.exists(_._7 == 1) &&
      batch.values.exists(_._7 == 0))
    // the stream input: the SAME WET slice with the SAME fixture URL,
    // arriving in two doc_id-ordered micro-batches (crawl order)
    val wet = IngestQueries.withWarcRecord(
        IngestQueries.warcContainer(spark, sfDir), "_bin")
      .filter(col("valid_warc") === 1 && col("truncated") === 0 &&
        col("warc_type") === "response")
      .select(col("doc_id"), IngestQueries.gateFixtureUrl(col("doc_id")).as("url"),
        col("payload").as("text"))
    val mid = wet.agg(org.apache.spark.sql.functions.percentile_approx(
      col("doc_id"), lit(0.5), lit(100))).collect().head.getLong(0)
    val robots = spark.range(7).select(
      concat(lit("www.site"), col("id"), lit(".example.com")).as("host"),
      IngestQueries.gateFixtureRobots(col("id").cast("string")).as("robots"))
    val sink = Streaming.corpusGateSink("gate_corpus", "gate_dlq", robots) _
    sink(wet.filter(col("doc_id") <= mid), 0L)
    sink(wet.filter(col("doc_id") > mid), 1L)
    // stream ≡ batch: every wet doc lands in exactly one table, with
    // the SAME evidence flags the batch gate computes — the admitted
    // set IS the batch corpus_keep set
    def flags(t: String) = SnapshotStore.read(spark, t)
      .select("doc_id", "canonical", "allowed", "url_unique",
        "gopher_keep", "is_dup", "corpus_keep")
      .as[(Long, String, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    val corpus = flags("gate_corpus")
    val dead = flags("gate_dlq")
    assert(corpus.keySet.intersect(dead.keySet).isEmpty)
    assert(corpus.keySet ++ dead.keySet == batch.keySet)
    assert(corpus.keySet == batch.filter(_._2._7 == 1).keySet,
      s"admitted must equal batch corpus_keep=1 " +
        s"(${corpus.size} vs ${batch.count(_._2._7 == 1)})")
    (corpus ++ dead).foreach { case (id, got) =>
      assert(got == batch(id), s"doc $id: stream $got != batch ${batch(id)}")
    }
    // replay of the first micro-batch: reclassifies against the
    // BEFORE-batch-0 state (none) and both batchId commits no-op
    sink(wet.filter(col("doc_id") <= mid), 0L)
    assert(SnapshotStore.versions("gate_corpus").size == 2 &&
      SnapshotStore.versions("gate_dlq").size == 2)
    assert(flags("gate_corpus") == corpus && flags("gate_dlq") == dead)
  }

  test("I55 streaming perceptual admission: Hamming near-dups rejected within and across batches; replay converges") {
    import spark.implicits._
    import graft.store.SnapshotStore
    val sink = Streaming.dhashAdmitSink("img_corpus") _
    // band values picked so near-dups differ by ONE low bit in b0
    // (hamming 1, three shared bands → always a banding candidate)
    // and unrelated images share NO band at all
    val b0 = Seq(
      (1L, 100, 200, 300, 400, "a"),
      (2L, 101, 200, 300, 400, "b"),     // 1 bit from doc 1 → in-batch reject
      (10L, 1000, 2000, 3000, 4000, "c")
    ).toDF("doc_id", "b0", "b1", "b2", "b3", "payload")
    sink(b0, 0L)
    val b1 = Seq(
      (3L, 102, 200, 300, 400, "d"),     // 1 bit from CORPUS doc 1 → reject
      (11L, 1001, 2000, 3000, 4000, "e"),// 1 bit from corpus doc 10 → reject
      (20L, 5000, 6000, 7000, 8000, "f"),
      (21L, 5001, 6000, 7000, 8000, "g") // 1 bit from 20 WITHIN batch → reject
    ).toDF("doc_id", "b0", "b1", "b2", "b3", "payload")
    sink(b1, 1L)
    def ids = SnapshotStore.read(spark, "img_corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 10L, 20L), s"admitted: $ids")
    // the admitted set is pairwise FAR by construction of the rule:
    // no two admitted rows may sit within the threshold
    val kept = SnapshotStore.read(spark, "img_corpus")
      .select("doc_id", "b0", "b1", "b2", "b3")
      .as[(Long, Int, Int, Int, Int)].collect()
    for (x <- kept; y <- kept if x._1 < y._1) {
      val ham = Integer.bitCount(x._2 ^ y._2) + Integer.bitCount(x._3 ^ y._3) +
        Integer.bitCount(x._4 ^ y._4) + Integer.bitCount(x._5 ^ y._5)
      assert(ham > graft.multimodal.Multimodal.DHashThreshold,
        s"admitted pair (${x._1}, ${y._1}) within threshold: $ham")
    }
    // the r16 review gap, closed by sub-band blocking: a distance-4
    // pair sharing NO 16-bit storage band (one flipped bit in EACH
    // band) must still be caught — 4 bands is pigeonhole-safe only to
    // distance 3; the sink blocks on threshold+1 = 7 sub-bands
    val b2 = Seq((30L, 101, 201, 301, 401, "h"))
      .toDF("doc_id", "b0", "b1", "b2", "b3", "payload")
    sink(b2, 2L)
    assert(ids == Set(1L, 10L, 20L),
      "a distance-4 near-dup with no shared 16-bit band must be rejected")
    // replayed first batch: reclassifies against BEFORE-batch-0 state
    // (empty) and the batchId commit no-ops
    sink(b0, 0L)
    assert(ids == Set(1L, 10L, 20L) &&
      SnapshotStore.versions("img_corpus").size == 3)
  }

  test("I56 streaming perplexity gate: stream admissions == the batch KN filter, unscoreable docs dead-letter with NULL score, replay idempotent") {
    import spark.implicits._
    import graft.store.SnapshotStore
    import graft.text.TextQueries
    val d = graft.Tables.documents(spark, sfDir)
    val model = TextQueries.knModelOf(
      d.filter(TextQueries.isTrainSplit(col("doc_id"))))
    val batchScores = TextQueries.textKnScore(spark, sfDir)
      .select("doc_id", "kn_surprise").as[(Long, Double)].collect().toMap
    val thr = batchScores.values.toSeq.sorted.apply(batchScores.size / 2)
    val sink = Streaming.perplexityGateSink("ppl_corpus", "ppl_dlq", model, thr) _
    val base = d.select("doc_id", "text", "lang")
    // one unscoreable document (single token → zero bigrams)
    val shorty = Seq((-1L, "solo", "xx")).toDF("doc_id", "text", "lang")
    (0 until 3).foreach { b =>
      val batch = base.filter(col("doc_id") % 3 === b)
      sink(if (b == 1) batch.unionAll(shorty) else batch, b.toLong)
    }
    def ids(t: String) = SnapshotStore.read(spark, t)
      .select("doc_id").as[Long].collect().toSet
    val allIds = d.select("doc_id").as[Long].collect().toSet
    val expectAdmit = batchScores.filter(_._2 <= thr).keySet
    assert(ids("ppl_corpus") == expectAdmit,
      "stream admissions must equal the batch KN filter")
    assert(ids("ppl_dlq") == (allIds -- expectAdmit) + -1L,
      "the high-perplexity tail plus the unscoreable doc dead-letter")
    // the dead letter carries the score for auditing; unscoreable NULL
    val dl = SnapshotStore.read(spark, "ppl_dlq")
      .select("doc_id", "kn_surprise").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(dl(-1L).isEmpty, "zero-bigram doc must carry a NULL score")
    dl.filter(_._1 >= 0).foreach { case (id, s) =>
      assert(s.contains(batchScores(id)), s"dlq score drift for $id") }
    // the ADMITTED half too: stream ≡ batch score doc-by-doc (the I54
    // flag-for-flag discipline applied to the gate's numeric evidence
    // — r16 verdict #6: both tables carry the exact batch score, so
    // the parity claim covers every document, not just the tail)
    SnapshotStore.read(spark, "ppl_corpus")
      .select("doc_id", "kn_surprise").as[(Long, Double)].collect()
      .foreach { case (id, s) =>
        assert(s == batchScores(id), s"corpus score drift for $id") }
    // replay of batch 0: batchId-idempotent on both tables
    val v0 = (SnapshotStore.versions("ppl_corpus").size,
      SnapshotStore.versions("ppl_dlq").size)
    sink(base.filter(col("doc_id") % 3 === 0), 0L)
    assert(ids("ppl_corpus") == expectAdmit && v0 ==
      (SnapshotStore.versions("ppl_corpus").size,
        SnapshotStore.versions("ppl_dlq").size),
      "replay must change nothing")
  }

  test("I58 streaming CLIP gate: stream admissions and scores == the batch H44 face doc-by-doc; replay idempotent") {
    import spark.implicits._
    import graft.store.SnapshotStore
    val batch = graft.multimodal.Multimodal.mmClipScore(spark, sfDir)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(batch.values.exists(_._3 == 1) && batch.values.exists(_._3 == 0))
    val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val sink = Streaming.clipGateSink("clip_corpus", "clip_dlq") _
    (0 until 3).foreach(b => sink(d.filter(col("doc_id") % 3 === b), b.toLong))
    def scores(t: String) = SnapshotStore.read(spark, t)
      .select("doc_id", "clip_score").as[(Long, Double)].collect().toMap
    val corpus = scores("clip_corpus")
    val dead = scores("clip_dlq")
    assert(corpus.keySet.intersect(dead.keySet).isEmpty)
    assert(corpus.keySet ++ dead.keySet == batch.keySet)
    assert(corpus.keySet == batch.filter(_._2._3 == 1).keySet,
      "stream admissions must equal the batch gate")
    (corpus ++ dead).foreach { case (id, s) =>
      assert(s == batch(id)._2, s"score drift for $id: $s vs ${batch(id)._2}") }
    // replay: batchId-idempotent on both tables
    val v0 = (SnapshotStore.versions("clip_corpus").size,
      SnapshotStore.versions("clip_dlq").size)
    sink(d.filter(col("doc_id") % 3 === 0), 0L)
    assert(scores("clip_corpus") == corpus && v0 ==
      (SnapshotStore.versions("clip_corpus").size,
        SnapshotStore.versions("clip_dlq").size))
  }

  test("I60 streaming ANN admission: stream evidence == the batch face row for row across micro-batches; constructed near-dups reject; replay idempotent") {
    import spark.implicits._
    import graft.store.SnapshotStore
    import graft.sim.{SimQueries, SimStreaming, Similarity}
    val emb = graft.Tables.embeddings(spark, sfDir)
    // the frozen index: the non-query corpus slice, banded once (the
    // same frame the persisted bucket table holds)
    val indexVecs = emb.filter(col("vec_id") >= SimQueries.NumQueries)
    val indexBuckets = Similarity.lshBucketsOf(indexVecs,
      "vec_id", "embedding", SimQueries.Tables64)
      .localCheckpoint(eager = true)
    // batch truth: the driver face's own kernel over the full slice
    val batch = Similarity.annAdmitAgainst(
      emb.filter(col("vec_id") < SimQueries.NumQueries),
      "vec_id", "embedding", indexBuckets, indexVecs,
      SimQueries.AdmitTau, SimQueries.Tables64)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1.0 else r.getDouble(2)), r.getInt(3))).toMap
    // stream the SAME incoming rows in two micro-batches
    val sink = SimStreaming.annAdmitSink(indexBuckets, indexVecs,
      "ann_corpus") _
    val incoming = emb.filter(col("vec_id") < SimQueries.NumQueries)
      .select("vec_id", "embedding")
    sink(incoming.filter(col("vec_id") % 2 === 0), 0L)
    sink(incoming.filter(col("vec_id") % 2 === 1), 1L)
    def stored = SnapshotStore.read(spark, "ann_corpus").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1.0 else r.getDouble(2)), r.getInt(3))).toMap
    assert(stored == batch,
      "stream admission evidence must equal the batch face row for row")
    // the REJECT class on a constructed vector: a clone of an indexed
    // vector must be flagged with near-1 evidence (the admit class is
    // already exercised by the real corpus rows above)
    val probe = indexVecs.orderBy("vec_id").limit(1)
      .select(col("embedding")).as[Seq[Float]].head
    val b2 = Seq((100000L, probe)).toDF("vec_id", "embedding")
    sink(b2, 2L)
    val s2 = stored
    assert(s2(100000L)._3 == 0 && s2(100000L)._2 >= SimQueries.AdmitTau,
      s"a cloned indexed vector must be rejected with near-1 evidence: ${s2(100000L)}")
    // replay: the batchId commit no-ops
    val nv = SnapshotStore.versions("ann_corpus").size
    sink(incoming.filter(col("vec_id") % 2 === 0), 0L)
    assert(stored == s2 && SnapshotStore.versions("ann_corpus").size == nv)
  }

  test("I61 streaming classifier gate: stream keep/reject == the batch G59 verdicts doc by doc, evidence attached, replay idempotent") {
    import spark.implicits._
    import graft.store.SnapshotStore
    val batch = graft.text.TextQueries.textClassifier(spark, sfDir)
      .select("doc_id", "score", "keep").as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.values.exists(_._2 == 1) && batch.values.exists(_._2 == 0),
      "the fixture must exercise both verdict classes")
    val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val sink = Streaming.classifierGateSink("qc_corpus", "qc_dlq") _
    (0 until 3).foreach(b => sink(d.filter(col("doc_id") % 3 === b), b.toLong))
    def rows(t: String) = SnapshotStore.read(spark, t)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val corpus = rows("qc_corpus"); val dead = rows("qc_dlq")
    assert(corpus.keySet.intersect(dead.keySet).isEmpty)
    assert(corpus.keySet ++ dead.keySet == batch.keySet,
      "row-class completeness: admitted + dead-lettered = corpus")
    assert(corpus.keySet == batch.filter(_._2._2 == 1).keySet,
      "stream admissions must equal the batch classifier verdicts")
    (corpus ++ dead).foreach { case (id, s) =>
      assert(s == batch(id)._1, s"score drift for $id") }
    // replay: batchId-idempotent on both tables
    val v0 = (SnapshotStore.versions("qc_corpus").size,
      SnapshotStore.versions("qc_dlq").size)
    sink(d.filter(col("doc_id") % 3 === 0), 0L)
    assert(rows("qc_corpus") == corpus && v0 ==
      (SnapshotStore.versions("qc_corpus").size,
        SnapshotStore.versions("qc_dlq").size))
  }

  test("I57 streaming join-MV: the view equals join(committed facts, dim) after every batch, replay no-ops through the store, dim overwrite rebuilds full") {
    import spark.implicits._
    import graft.store.{IncrementalView, SnapshotStore}
    SnapshotStore.commitOverwrite("jmv_dim",
      Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("k", "dv"))
    val sink = Streaming.joinMvSink("jmv_fact", "jmv_dim", "jmv_mv", Seq("k")) _
    def mv() = IncrementalView.read(spark, "jmv_mv")
      .as[(Long, Long, String)].collect().toSet
    def full() = SnapshotStore.read(spark, "jmv_fact")
      .join(SnapshotStore.read(spark, "jmv_dim"), Seq("k"))
      .as[(Long, Long, String)].collect().toSet
    sink(Seq((1L, 10L), (2L, 20L)).toDF("k", "fv"), 0L)
    assert(mv() == full() && mv() == Set((1L, 10L, "d1"), (2L, 20L, "d2")))
    sink(Seq((3L, 30L), (1L, 11L)).toDF("k", "fv"), 1L)
    assert(mv() == full() && mv()((3L, 30L, "d3")) && mv()((1L, 11L, "d1")))
    // replay: the store's batchId idempotence is the ONLY guard the
    // sink relies on — versions of fact and mv must both stand still
    val vs = (SnapshotStore.versions("jmv_fact").size,
      SnapshotStore.versions("jmv_mv").size)
    sink(Seq((3L, 30L), (1L, 11L)).toDF("k", "fv"), 1L)
    assert(mv() == full() && vs ==
      (SnapshotStore.versions("jmv_fact").size,
        SnapshotStore.versions("jmv_mv").size), "replay must change nothing")
    // dim update mid-stream: overwrite breaks append-only; the next
    // batch's refresh rebuilds full and the MV reflects the NEW dim
    SnapshotStore.commitOverwrite("jmv_dim",
      Seq((1L, "D1"), (2L, "D2"), (3L, "D3"), (4L, "D4")).toDF("k", "dv"))
    sink(Seq((4L, 40L)).toDF("k", "fv"), 2L)
    assert(mv() == full() && mv()((4L, 40L, "D4")) &&
      mv().forall(_._3.startsWith("D")),
      "after a dim rewrite every MV row must carry the new dim values")
  }

  test("I38 a NULL validity predicate routes to the dead-letter table, never vanishes") {
    import spark.implicits._
    import graft.store.SnapshotStore
    // value IS NULL makes `value > 1.0` evaluate to NULL — the row
    // class filter(p)/filter(!p) both drop; the sink must dead-letter it
    val df = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, null), (3L, 0.5))
      .toDF("event_id", "value")
    val valid = col("value") > 1.0
    Streaming.deadLetterSink("dlqn_ok", "dlqn_bad", valid)(df, 0L)
    def ids(t: String) = SnapshotStore.read(spark, t)
      .select("event_id").as[Long].collect().toSet
    assert(ids("dlqn_ok") == Set(1L), s"accepted: ${ids("dlqn_ok")}")
    assert(ids("dlqn_bad") == Set(2L, 3L),
      s"the NULL-predicate row must land in the dead-letter table: ${ids("dlqn_bad")}")
  }

  test("I13 streaming transitions match the batch window operator, across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.transitionsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("trans_out").outputMode("append").start()
    try {
      // batch 1: user 1 view->click (and an equal-ts pair ordered by id)
      mem.addData(
        Streaming.TypedEv(1L, ts(0), 1L, "view"),
        Streaming.TypedEv(1L, ts(1), 2L, "click"),
        Streaming.TypedEv(2L, ts(0), 3L, "view"),
        Streaming.TypedEv(2L, ts(0), 4L, "click"))
      q.processAllAvailable()
      // batch 2: continuation must chain off state (click->purchase)
      mem.addData(Streaming.TypedEv(1L, ts(5), 5L, "purchase"))
      q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .groupBy("from_type", "to_type").count()
        .as[(String, String, Long)].collect().toSet
      val batchDf = Seq(
        (1L, 1L, "view", ts(0), 0.0), (2L, 1L, "click", ts(1), 0.0),
        (3L, 2L, "view", ts(0), 0.0), (4L, 2L, "click", ts(0), 0.0),
        (5L, 1L, "purchase", ts(5), 0.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val batch = EventOps.transitionMatrix(batchDf, "user_id", "ts", "event_id", "event_type")
        .select("from_type", "to_type", "n_transitions")
        .as[(String, String, Long)].collect().toSet
      assert(streamed == batch && streamed == Set(
        ("view", "click", 2L), ("click", "purchase", 1L)))
    } finally q.stop()
  }

  test("I13 late cross-batch event is dropped, not emitted as a false transition") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.transitionsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("trans_late_out").outputMode("append").start()
    try {
      mem.addData(
        Streaming.TypedEv(1L, ts(0), 1L, "view"),
        Streaming.TypedEv(1L, ts(10), 2L, "click"))
      q.processAllAvailable()
      // a late event with ts BELOW the stored last (click@10) arrives in
      // a later batch: an O(1)-state tracker cannot re-linearize it, so
      // the pinned semantics is DROP — emitting click->late_view would
      // fabricate a transition the batch total order does not contain
      mem.addData(Streaming.TypedEv(1L, ts(5), 3L, "late_view"))
      q.processAllAvailable()
      // state is untouched by the dropped straggler: the next in-order
      // event still chains off click@10
      mem.addData(Streaming.TypedEv(1L, ts(20), 4L, "purchase"))
      q.processAllAvailable()
      val streamed = spark.table("trans_late_out")
        .as[Streaming.Transition].collect().map(t => (t.from_type, t.to_type)).toSet
      assert(streamed == Set(("view", "click"), ("click", "purchase")),
        s"unexpected transitions: $streamed")
    } finally q.stop()
  }

  test("I50 streaming seasonality cells + finishing shares match the batch heatmap, across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type")
    val q = Streaming.seasonalityCells(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("season_out").outputMode("append").start()
    try {
      // ts(0) = 2023-11-14T22:13:20Z (a Tuesday): hour-22 click×2
      // split ACROSS batches (the (day,type,hod) cell must merge in
      // state) + view×1; next day hour 0: click×1; next day hour 23:
      // view×1
      val data = Seq((ts(0), "click"), (ts(2), "view"),
        (ts(30), "click"), (ts(125), "click"), (ts(1500), "view"))
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush")); q.processAllAvailable()
      mem.addData((ts(200000), "flush")); q.processAllAvailable()
      def grid(df: org.apache.spark.sql.DataFrame) =
        StreamQueries.seasonalityFromCells(df)
          .select("event_type", "dow", "hod", "n", "share")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
            r.getLong(3), r.getDouble(4))).toSet
      val streamed = grid(spark.table("season_out")
        .filter(col("event_type") =!= "flush"))
      val batch = grid(Streaming.seasonalityCells(asEvents(data.toDF())))
      assert(batch.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
      // the split cell merged: Tuesday (dow 3) hour-22 click counts 2
      // of 3 clicks total — share 2/3
      assert(streamed.contains(("click", 3, 22, 2L, 0.66667)), s"$streamed")
    } finally q.stop()
  }

  test("I49 streaming lateness matches the batch running-max window on in-order arrival, across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.latenessStreaming(mem.toDS())
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      // event_ids arrive IN ORDER across batches; timestamps regress
      // (that regression IS the lateness being measured). user 1's
      // running max must carry from batch 1 into batch 2.
      val data = Seq(
        Streaming.TypedEv(1L, ts(0), 1L, "view"),
        Streaming.TypedEv(1L, ts(10), 2L, "click"),
        Streaming.TypedEv(2L, ts(0), 10L, "view"),
        Streaming.TypedEv(1L, ts(5), 3L, "purchase"),
        Streaming.TypedEv(2L, ts(20), 12L, "click"))
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("late_out")
        .as[Streaming.LatenessEv].collect()
        .map(e => (e.user_id, e.event_id, e.lateness)).toSet
      // batch face: the evLateness running-max window over the same rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val batchLate = data.toDF()
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("s"))
        .withColumn("lateness", max(col("s")).over(w) - col("s"))
      val batch = batchLate.select("user_id", "event_id", "lateness")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.contains((1L, 3L, 300L)),
        s"streamed $streamed vs batch $batch")
      // the shared finishing profile agrees on both faces
      val sp = StreamQueries.latenessProfile(spark.table("late_out"))
        .collect().map(_.toSeq).toSet
      val bp = StreamQueries.latenessProfile(batchLate)
        .collect().map(_.toSeq).toSet
      assert(sp == bp, s"profile mismatch: $sp vs $bp")
    } finally q.stop()
  }

  test("I49 late cross-batch event_id is dropped; state still chains in order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.latenessStreaming(mem.toDS())
      .writeStream.format("memory").queryName("late_drop_out").outputMode("append").start()
    try {
      mem.addData(
        Streaming.TypedEv(1L, ts(0), 1L, "view"),
        Streaming.TypedEv(1L, ts(10), 3L, "click"))
      q.processAllAvailable()
      // event_id 2 arrives AFTER id 3 was processed in a prior batch:
      // O(1) state cannot re-linearize it — dropped, state untouched
      mem.addData(Streaming.TypedEv(1L, ts(4), 2L, "late_view"))
      q.processAllAvailable()
      mem.addData(Streaming.TypedEv(1L, ts(6), 4L, "purchase"))
      q.processAllAvailable()
      val streamed = spark.table("late_drop_out")
        .as[Streaming.LatenessEv].collect()
        .map(e => (e.event_id, e.lateness)).toSet
      assert(streamed == Set((1L, 0L), (3L, 0L), (4L, 240L)),
        s"unexpected lateness rows: $streamed")
    } finally q.stop()
  }

  test("I48 streaming gaps match the batch lag window in order; a late straggler is dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.gapsStreaming(mem.toDS())
      .writeStream.format("memory").queryName("gaps_out").outputMode("append").start()
    try {
      // user 1: six in-order events at constant 60 s cadence (a bot),
      // SPLIT across batches so the last-event state must carry over
      val inOrder = (1 to 6).map(i =>
        Streaming.TypedEv(1L, ts(i), i.toLong, "click"))
      mem.addData(inOrder.take(3): _*)
      q.processAllAvailable()
      mem.addData(inOrder.drop(3): _*)
      q.processAllAvailable()
      // a straggler BELOW the stored (ts, id) key: dropped, state intact
      mem.addData(Streaming.TypedEv(1L, ts(4), 99L, "late"))
      q.processAllAvailable()
      mem.addData(Streaming.TypedEv(1L, ts(7), 7L, "click"))
      q.processAllAvailable()
      val streamed = spark.table("gaps_out").as[Streaming.GapEv]
        .collect().map(g => (g.event_id, g.gap)).toSet
      assert(streamed == (2 to 7).map(i => (i.toLong, 60L)).toSet,
        s"unexpected gaps: $streamed")
      // the shared finish flags the constant cadence as a bot
      val prof = StreamQueries.botSignalsFromGaps(
        spark.table("gaps_out").select(col("user_id"), col("gap"))).collect()
      assert(prof.length == 1 && prof.head.getAs[Int]("bot_flag") == 1 &&
        prof.head.getAs[Long]("n_gaps") == 6L, s"profile: ${prof.toSeq}")
      // batch face over the same surviving rows agrees
      val batchGaps = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        (inOrder :+ Streaming.TypedEv(1L, ts(7), 7L, "click")).toDF()
          .select(col("user_id"), col("event_id"),
            col("ts").cast("long").as("s"), col("ts"))
          .withColumn("gap", col("s") - lag(col("s"), 1).over(w))
          .filter(col("gap").isNotNull)
      }
      val bp = StreamQueries.botSignalsFromGaps(batchGaps).collect()
      assert(bp.map(_.toSeq).toSet == prof.map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("I14 streaming daily counts + finishing rank match the batch daily top-k") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val q = Streaming.dailyCounts(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("daily_out").outputMode("append").start()
    try {
      // day 1: click×2, view×1; day 2 (minute 1500 > 1440): view×1 —
      // split across two batches so counts must merge in state
      val data = Seq((ts(0), "click", 1.0), (ts(2), "view", 1.0),
        (ts(30), "click", 1.0), (ts(1500), "view", 1.0))
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((ts(200000), "flush", 0.0)); q.processAllAvailable()
      val streamed = Streaming.dailyTopk(
          spark.table("daily_out").filter(col("event_type") =!= "flush"))
        .select("day", "event_type", "n_events", "rnk")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
      val batch = Streaming.dailyTopk(Streaming.dailyCounts(asEvents(data.toDF())))
        .select("day", "event_type", "n_events", "rnk")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I22 streaming hourly HLL sketches merge across batches and match the batch estimates") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "user_id", "event_type")
    val q = Streaming.hourlyDistinctSketch(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("hll_out").outputMode("append").start()
    try {
      // hour 0: users 1,2,3 click (user 2 twice — dedup inside the
      // sketch); hour 1: users 1,9 view — split so the hour-0 sketch
      // must MERGE through the state store across micro-batches
      val data = Seq((ts(0), 1L, "click"), (ts(2), 2L, "click"),
        (ts(10), 2L, "click"), (ts(30), 3L, "click"),
        (ts(70), 1L, "view"), (ts(80), 9L, "view"))
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), 0L, "flush")); q.processAllAvailable()
      mem.addData((ts(200000), 0L, "flush")); q.processAllAvailable()
      val streamed = Streaming.distinctFromSketches(
          spark.table("hll_out").filter(col("event_type") =!= "flush"))
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = Streaming.distinctFromSketches(
          Streaming.hourlyDistinctSketch(asEvents(data.toDF())))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
      // small cardinalities sit in the sketch's exact (sparse) range
      assert(streamed.map(t => (t._2, t._3)) == Set(("click", 3L), ("view", 2L)),
        s"exact-at-small-cardinality estimates: $streamed")
    } finally q.stop()
  }

  test("I28 streaming hourly theta sketches merge across batches; overlap from closed windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "user_id", "event_type")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val q = Streaming.hourlyThetaSketch(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("theta_out").outputMode("append").start()
    try {
      // hour 0: users 1,2,3 (2 twice); hour 1: users 2,3,9 — split so
      // the hour-0 sketch must MERGE through the state store; overlap
      // between the closed windows is {2,3} = 2
      val data = Seq((ts(0), 1L, "click"), (ts(2), 2L, "click"),
        (ts(10), 2L, "click"), (ts(30), 3L, "click"),
        (ts(70), 2L, "view"), (ts(80), 3L, "view"), (ts(90), 9L, "view"))
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), 0L, "x")); q.processAllAvailable()
      mem.addData((ts(200000), 0L, "x")); q.processAllAvailable()
      import org.apache.spark.sql.functions.call_function
      // the two data hours start within minutes 0-90 of the base; the
      // flush events land ~70 days later and are filtered out
      def ests(sk: org.apache.spark.sql.DataFrame) =
        sk.filter(col("hour") < ts(120))
          .select(col("hour"),
            call_function("graft_theta_estimate", col("sk")).as("est"))
          .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
      val streamed = ests(spark.table("theta_out"))
      val batch = ests(Streaming.hourlyThetaSketch(asEvents(data.toDF())))
      assert(streamed == batch && batch.values.toSet == Set(3.0),
        s"streamed $streamed vs batch $batch")
      // overlap of the two closed windows from sketch bytes alone
      val sks = spark.table("theta_out")
        .filter(col("hour") < ts(120))
        .orderBy("hour").collect().map(_.getAs[Array[Byte]]("sk"))
      val inter = spark.range(1).select(call_function("graft_theta_intersect",
          lit(sks(0)), lit(sks(1)))).first().getDouble(0)
      assert(inter == 2.0, s"closed-window overlap must be exactly 2: $inter")
    } finally q.stop()
  }

  test("I24 streaming hourly Misra-Gries candidates merge across batches and match batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "user_id", "event_type")
    // k=4 ≥ the 3 distinct users per (hour, type): no decrement can
    // fire, so the summary is EXACT counts and streamed == batch is an
    // equality check even though MG is merge-order dependent in general
    val q = Streaming.hourlyTopKCandidates(asEvents(mem.toDF()), 4)
      .writeStream.format("memory").queryName("mg_out").outputMode("append").start()
    try {
      // user 1's clicks span the micro-batches: the batch-2 increment
      // must MERGE into batch-1's counter through the state store
      val data = Seq((ts(0), 1L, "click"), (ts(2), 2L, "click"),
        (ts(10), 1L, "click"), (ts(30), 3L, "click"),
        (ts(70), 1L, "view"), (ts(80), 9L, "view"))
      mem.addData(data.take(2): _*)
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), 0L, "flush")); q.processAllAvailable()
      mem.addData((ts(200000), 0L, "flush")); q.processAllAvailable()
      val streamed = spark.table("mg_out")
        .filter(col("event_type") =!= "flush")
        .as[(Timestamp, String, Map[String, Long])].collect().toSet
      val batch = Streaming.hourlyTopKCandidates(asEvents(data.toDF()), 4)
        .as[(Timestamp, String, Map[String, Long])].collect().toSet
      assert(batch.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
      assert(streamed.map(t => (t._2, t._3)) ==
        Set(("click", Map("1" -> 2L, "2" -> 1L, "3" -> 1L)),
          ("view", Map("1" -> 1L, "9" -> 1L))),
        s"exact counters below k: $streamed")
    } finally q.stop()
  }

  test("I11 streaming hourly counts + z-score finishing match the batch anomaly operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(asEvents(mem.toDF()),
        windowDur = "1 hour")
      .writeStream.format("memory").queryName("hr_out").outputMode("append").start()
    try {
      // click: 1/hour for 5 hours, then a 6-event spike in hour 6
      val calm = (0 until 5).map(h => (ts(h * 60), "click", 1.0))
      val spike = (0 until 6).map(i => (ts(5 * 60 + i), "click", 1.0))
      val data = calm ++ spike
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((ts(200000), "flush", 0.0)); q.processAllAvailable()
      val hourly = spark.table("hr_out").filter(col("event_type") =!= "flush")
        .select(col("window_start").as("hour"), col("event_type"),
          col("n_events").as("n"))
      val streamed = EventOps.anomaliesFromHourly(hourly, 2.0)
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventOps.hourlyAnomalies(asEvents(data.toDF()), 2.0)
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch.nonEmpty, "spike must register as an anomaly")
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I15 stream-static enrichment join matches the batch join, no state store") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val q = Streaming.enrichWithStatic(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 10.0), (2L, ts(1), 20.0), (7L, ts(2), 30.0))
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .select("user_id", "tier", "value").as[(Long, String, Double)].collect().toSet
      val batch = Streaming.enrichWithStatic(
        Seq((1L, ts(0), 10.0), (2L, ts(1), 20.0), (7L, ts(2), 30.0))
          .toDF("user_id", "ts", "value"), dim, Seq("user_id"))
        .select("user_id", "tier", "value").as[(Long, String, Double)].collect().toSet
      // inner join: user 7 (no dim row) drops on both paths
      assert(streamed == batch && streamed == Set((1L, "gold", 10.0), (2L, "basic", 20.0)))
      // stateless: no state store rows involved in a stream-static join
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty))
    } finally q.stop()
  }

  test("I5 stream-stream attribution join matches the batch range join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, Double)]
    val buys = MemoryStream[(Long, Timestamp, Long, Double)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "value")
    val q = Streaming.attributionJoin(
      shape(clicks.toDF()).withWatermark("ts", "10 minutes"),
      shape(buys.toDF()).withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      val clickData = Seq((1L, ts(0), 7L, 0.0), (2L, ts(10), 8L, 0.0))
      val buyData = Seq(
        (10L, ts(2), 7L, 9.99),   // within 5 min of click 1, same user
        (11L, ts(9), 7L, 5.00),   // outside 5-min window of click 1
        (12L, ts(11), 9L, 1.00))  // different user
      clicks.addData(clickData: _*); buys.addData(buyData: _*)
      q.processAllAvailable()
      clicks.addData((99L, ts(10000), 99L, 0.0)); buys.addData((98L, ts(10000), 98L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .filter(col("user_id") < 90)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = Streaming.attributionJoin(shape(clickData.toDF()), shape(buyData.toDF()))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch == Set((7L, 1L, 10L)))
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I18 stream-stream OUTER attribution join emits unconverted clicks after watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long, Double)]
    val buys = MemoryStream[(Long, Timestamp, Long, Double)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "value")
    val q = Streaming.attributionJoinTyped(
      shape(clicks.toDF()).withWatermark("ts", "10 minutes"),
      shape(buys.toDF()).withWatermark("ts", "10 minutes"),
      windowSec = 300, joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_out").outputMode("append").start()
    try {
      val clickData = Seq((1L, ts(0), 7L, 0.0), (2L, ts(10), 8L, 0.0))
      val buyData = Seq((10L, ts(2), 7L, 9.99)) // converts click 1; click 2 never converts
      clicks.addData(clickData: _*); buys.addData(buyData: _*)
      q.processAllAvailable()
      // watermark must pass click 2's window before its null row emits
      clicks.addData((99L, ts(10000), 99L, 0.0)); buys.addData((98L, ts(10000), 98L, 0.0))
      q.processAllAvailable()
      clicks.addData((97L, ts(20000), 97L, 0.0)); buys.addData((96L, ts(20000), 96L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_outer_out")
        .filter(col("user_id") < 90)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val batch = Streaming.attributionJoinTyped(
          shape(clickData.toDF()), shape(buyData.toDF()), 300, "left_outer")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(batch == Set((7L, 1L, 10L), (8L, 2L, -1L)))
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I7 streaming as-of join matches the batch union+running-last operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.AsofIn]
    val q = Streaming.asOfStreaming(mem.toDS())
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      val data = Seq(
        Streaming.AsofIn(7L, ts(0), 0, 1L, 0.0),   // click
        Streaming.AsofIn(7L, ts(5), 0, 2L, 0.0),   // click
        Streaming.AsofIn(7L, ts(5), 0, 6L, 0.0),   // same-ts click: max id 6 wins
        Streaming.AsofIn(7L, ts(8), 1, 3L, 9.5),   // purchase -> click 6
        Streaming.AsofIn(7L, ts(5), 1, 4L, 1.5),   // same-instant purchase -> click 6
        Streaming.AsofIn(8L, ts(3), 1, 5L, 2.0))   // no clicks -> null match
      // deliver out of order across two batches: the late click (id 2)
      // arrives after purchase 3 but before the watermark passes
      mem.addData(data.filterNot(_.id == 2L): _*)
      q.processAllAvailable()
      mem.addData(data.filter(_.id == 2L): _*)
      q.processAllAvailable()
      mem.addData(Streaming.AsofIn(99L, ts(10000), 0, 99L, 0.0)); q.processAllAvailable()
      mem.addData(Streaming.AsofIn(99L, ts(20000), 0, 98L, 0.0)); q.processAllAvailable()
      val streamed = spark.table("asof_out").filter(col("user_id") < 90)
        .select("user_id", "left_id", "value", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val ev = data.toDS().toDF("user_id", "ts", "kind", "event_id", "value")
      val batch = graft.streaming.EventOps.asOfJoin(
          ev.filter(col("kind") === 1), ev.filter(col("kind") === 0),
          "user_id", "ts", "event_id", "value")
        .select("user_id", "left_id", "value", "right_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(batch == Set((7L, 3L, 9.5, 6L), (7L, 4L, 1.5, 6L), (8L, 5L, 2.0, -1L)))
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I1 windowedCounts runs unchanged over a kafka-shaped rate source") {
    // Source-agnostic transforms: the SAME windowedCounts that is
    // batch-oracled (ev_windowed) and MemoryStream-parity-tested above
    // runs over a live rate source with only the reader swapped.
    val q = Streaming.windowedCounts(Streaming.rateEvents(spark, rowsPerSecond = 1000))
      .writeStream.format("memory").queryName("rate_out").outputMode("complete").start()
    try {
      var tries = 0
      while (spark.table("rate_out").isEmpty && tries < 120) {
        Thread.sleep(250); q.processAllAvailable(); tries += 1
      }
      val out = spark.table("rate_out")
      assert(!out.isEmpty, "rate-source stream produced no windows")
      // identical output schema to the batch path over the events table
      val batchSchema = Streaming.windowedCounts(
        graft.Tables.events(spark, sfDir)).schema
      assert(out.schema == batchSchema,
        s"${out.schema} vs batch $batchSchema")
      val types = out.select("event_type").distinct()
        .collect().map(_.getString(0)).toSet
      assert(types.nonEmpty && types.subsetOf(Set("type_0", "type_1", "type_2")))
    } finally q.stop()
  }

  test("I3 props parse keeps only high-k events") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "click", """{"k": 69}"""),
      (2L, 11L, "view", """{"k": 12}"""),
      (3L, 12L, "click", """not json"""),
    ).toDF("event_id", "user_id", "event_type", "props")
    val out = Streaming.parseProps(df, minK = 50).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getInt(3) == 69)
  }

  test("I20 streaming session types + lift finishing match the batch co-occurrence") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("user_id", "ts", "event_type")
    val q = Streaming.sessionTypesStreaming(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("sess_types").outputMode("append").start()
    try {
      // u1: one session {click,view}, then after a >30-min gap a
      // second session {click}; u2: one session {view,buy} split
      // across two micro-batches (must merge in session state)
      mem.addData((1L, ts(0), "click"), (1L, ts(5), "view"),
        (2L, ts(0), "view"))
      q.processAllAvailable()
      mem.addData((2L, ts(10), "buy"), (1L, ts(60), "click"))
      q.processAllAvailable()
      mem.addData((9L, ts(10000), "flush")); q.processAllAvailable()
      mem.addData((9L, ts(20000), "flush")); q.processAllAvailable()
      val emitted = spark.table("sess_types")
        .filter(col("event_type") =!= "flush" && col("user_id") =!= 9L)
      val streamed = StreamQueries.cooccurFromSessions(emitted)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      val batchData = Seq((1L, ts(0), "click"), (1L, ts(5), "view"),
        (2L, ts(0), "view"), (2L, ts(10), "buy"), (1L, ts(60), "click"))
      val batch = StreamQueries.cooccurFromSessions(
        Streaming.sessionAssign(asEvents(batchData.toDF()))
          .select(col("user_id"), col("session_idx").as("session_id"),
            col("event_type")).distinct())
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      // 3 sessions; click+view co-occur once (lift 3/(2·2)), view+buy
      // once (lift 3/(2·1))
      assert(streamed == batch && streamed == Set(
        ("click", "view", 1L, 2L, 2L, 0.75),
        ("buy", "view", 1L, 1L, 2L, 1.5)), s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I19 streaming session summaries + shared roll-up match the batch session stats") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("user_id", "ts", "event_type", "value")
    val q = Streaming.sessionSummariesStreaming(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("sess_sum").outputMode("append").start()
    try {
      // u1: a 2-event session then, after a >30-min gap, a 1-event
      // session; u2: one session extended ACROSS micro-batches (its
      // open window must grow in state, and the end bound must come
      // out gap-subtracted)
      val data = Seq((1L, ts(0), "click", 1.0), (1L, ts(5), "view", 1.0),
        (2L, ts(0), "view", 1.0), (2L, ts(10), "buy", 1.0),
        (1L, ts(60), "click", 1.0))
      mem.addData(data.take(3): _*)
      q.processAllAvailable()
      mem.addData(data.drop(3): _*)
      q.processAllAvailable()
      mem.addData((9L, ts(10000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((9L, ts(20000), "flush", 0.0)); q.processAllAvailable()
      val emitted = spark.table("sess_sum").filter(col("user_id") =!= 9L)
      val streamed = StreamQueries.sessionStatsFromSessions(emitted)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = StreamQueries.sessionStatsFromSessions(
          Streaming.sessionsBatch(asEvents(data.toDF())))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      // u1: sessions of 2 (300 s) and 1 (0 s) events → avg 150 s;
      // u2: one 3-event... no — one 2-event session spanning 600 s
      assert(streamed == batch && streamed == Set(
        (1L, 2L, 3L, 2L, 150.0), (2L, 1L, 2L, 2L, 600.0)),
        s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I12 streaming dedupe suppresses cross-batch replays; key set matches batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp)]
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("event_id", "user_id", "event_type", "ts")
    val q = Streaming.dedupeStreaming(asEvents(mem.toDF()))
      .writeStream.format("memory").queryName("dedupe_out").outputMode("append").start()
    try {
      // batch 1: one in-batch dup pair + a distinct key
      mem.addData((1L, 1L, "click", ts(0)), (2L, 1L, "click", ts(0)),
        (3L, 2L, "view", ts(1)))
      q.processAllAvailable()
      // batch 2: replay of (1, click, ts0) under a NEW event_id within
      // the watermark → suppressed by state; plus one genuinely new key
      mem.addData((4L, 1L, "click", ts(0)), (5L, 1L, "view", ts(2)))
      q.processAllAvailable()
      val streamed = spark.table("dedupe_out")
        .select("user_id", "event_type", "ts")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
      assert(spark.table("dedupe_out").count() == 3,
        "each identity key must emit exactly once")
      val batchKeys = Seq((1L, 1L, "click", ts(0)), (2L, 1L, "click", ts(0)),
          (3L, 2L, "view", ts(1)), (4L, 1L, "click", ts(0)), (5L, 1L, "view", ts(2)))
        .toDF("event_id", "user_id", "event_type", "ts")
        .groupBy("user_id", "event_type", "ts").count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
      assert(streamed == batchKeys, s"streamed $streamed vs batch $batchKeys")
    } finally q.stop()
  }

  test("I11 live anomaly flags against a historical stats dim match batch scoring") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val asEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    // history: click 1/hour for 6 hours with one 4-count hour → a
    // non-degenerate per-type baseline (mean ~1.5, sd > 0)
    val history = (0 until 5).map(h => (ts(h * 60), "click", 1.0)) ++
      (0 until 4).map(i => (ts(5 * 60 + i), "click", 1.0))
    val stats = EventOps.hourlyStats(
      asEvents(history.toDF())
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))).cache()
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = Streaming.anomalyFlagsStreaming(asEvents(mem.toDF()), stats, 2.0)
      .writeStream.format("memory").queryName("live_anom").outputMode("append").start()
    try {
      // live day: one calm hour (count 1, |z| < 2) and one 9-event
      // spike hour; flush events advance the watermark past both
      // (minute mod 60 stays below 46 — the epoch base is 13m20s into
      // an hour, so the wall-clock hour flips between mod-46 and -47)
      val live = Seq((ts(10000), "click", 1.0)) ++
        (0 until 9).map(i => (ts(10080 + i), "click", 1.0))
      mem.addData(live: _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", 0.0)); q.processAllAvailable()
      mem.addData((ts(200000), "flush", 0.0)); q.processAllAvailable()
      val streamed = spark.table("live_anom")
        .filter(col("event_type") =!= "flush")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventOps.scoreAgainstStats(
        asEvents(live.toDF())
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n")),
        stats, 2.0)
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch.nonEmpty, "the spike hour must flag against the baseline")
      assert(batch.map(_._3) == Set(9L), s"only the spike hour flags: $batch")
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I17 streaming SCD2 closed versions match the batch intervals across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val q = Streaming.scd2Streaming(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()
    try {
      mem.addData(
        Streaming.TypedEv(1L, ts(0), 1L, "bronze"),
        Streaming.TypedEv(1L, ts(10), 2L, "silver"),
        Streaming.TypedEv(2L, ts(5), 3L, "bronze"))
      q.processAllAvailable()
      // batch 2: u1 upgrades again (closes silver, opened cross-batch);
      // u2's late event below their open version is dropped
      mem.addData(
        Streaming.TypedEv(1L, ts(20), 4L, "gold"),
        Streaming.TypedEv(2L, ts(1), 5L, "late"))
      q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .select("user_id", "event_id", "valid_from", "valid_to", "version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
      val batchDf = Seq(
        (1L, 1L, "bronze", ts(0), 0.0), (2L, 1L, "silver", ts(10), 0.0),
        (3L, 2L, "bronze", ts(5), 0.0), (4L, 1L, "gold", ts(20), 0.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val batch = EventOps.scd2(batchDf, "user_id", "ts", "event_id")
        .filter(col("valid_to").isNotNull)
        .select(col("user_id"), col("event_id"), col("valid_from"),
          col("valid_to"), col("version"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
      assert(streamed == batch && streamed == Set(
        (1L, 1L, ts(0), ts(10), 1), (1L, 2L, ts(10), ts(20), 2)),
        s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I8 streaming funnel state machine + finishing count match the batch funnel") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streaming.TypedEv]
    val steps = Seq("view", "click", "purchase", "refund")
    val q = Streaming.funnelStreaming(mem.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_hits").outputMode("append").start()
    try {
      // batch 1: u1 view→click (and u4 at EQUAL ts — same-ts qualifies,
      // as in the batch t >= anchor rule); u2 click only (precedes any
      // view, must never count); u3 view
      mem.addData(
        Streaming.TypedEv(1L, ts(0), 1L, "view"),
        Streaming.TypedEv(1L, ts(1), 2L, "click"),
        Streaming.TypedEv(2L, ts(0), 3L, "click"),
        Streaming.TypedEv(3L, ts(2), 4L, "view"),
        Streaming.TypedEv(4L, ts(3), 5L, "view"),
        Streaming.TypedEv(4L, ts(3), 6L, "click"))
      q.processAllAvailable()
      // batch 2: u1 purchases (chains off batch-1 anchors held in
      // state); u3 clicks; u2's view arrives AFTER their click — step 1
      // fires now but the old click can't retroactively qualify
      mem.addData(
        Streaming.TypedEv(1L, ts(5), 7L, "purchase"),
        Streaming.TypedEv(3L, ts(4), 8L, "click"),
        Streaming.TypedEv(2L, ts(6), 9L, "view"))
      q.processAllAvailable()
      val streamed = Streaming.funnelFromHits(
          spark.table("funnel_hits"), steps)
        .as[(Int, String, Long)].collect().toSet
      val batchDf = Seq(
        (1L, 1L, "view", ts(0), 0.0), (2L, 1L, "click", ts(1), 0.0),
        (3L, 2L, "click", ts(0), 0.0), (4L, 3L, "view", ts(2), 0.0),
        (5L, 4L, "view", ts(3), 0.0), (6L, 4L, "click", ts(3), 0.0),
        (7L, 1L, "purchase", ts(5), 0.0), (8L, 3L, "click", ts(4), 0.0),
        (9L, 2L, "view", ts(6), 0.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val batch = EventOps.funnel(batchDf, steps)
        .as[(Int, String, Long)].collect().toSet
      assert(streamed == batch && streamed == Set(
        (1, "view", 4L), (2, "click", 3L), (3, "purchase", 1L),
        (4, "refund", 0L)), s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("I29 transformWithState lifetime features match the batch window face across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streaming.LfEv]
    val q = Streaming.lifetimeFeaturesStreaming(mem.toDS())
      .writeStream.format("memory").queryName("lf_out").outputMode("append").start()
    try {
      // batch 1: user 1 twice (purchase then click), user 2 once
      mem.addData(
        Streaming.LfEv(1L, 1L, ts(0), 10.0, "purchase"),
        Streaming.LfEv(2L, 1L, ts(5), 3.0, "click"),
        Streaming.LfEv(3L, 2L, ts(1), 7.5, "view"))
      q.processAllAvailable()
      // batch 2: history must carry across micro-batches via state
      mem.addData(
        Streaming.LfEv(4L, 1L, ts(10), 2.25, "purchase"),
        Streaming.LfEv(5L, 2L, ts(8), 1.0, "purchase"))
      q.processAllAvailable()
      val streamed = spark.table("lf_out")
        .select("event_id", "user_id", "n_prior", "n_prior_purchases", "prior_value_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val batchDf = Seq(
        (1L, 1L, ts(0), 10.0, "purchase"), (2L, 1L, ts(5), 3.0, "click"),
        (3L, 2L, ts(1), 7.5, "view"), (4L, 1L, ts(10), 2.25, "purchase"),
        (5L, 2L, ts(8), 1.0, "purchase"))
        .toDF("event_id", "user_id", "ts", "value", "event_type")
      val batch = EventOps.lifetimeFeatures(batchDf)
        .select("event_id", "user_id", "n_prior", "n_prior_purchases", "prior_value_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch && streamed == Set(
        (1L, 1L, 0L, 0L, 0.0), (2L, 1L, 1L, 1L, 10.0), (3L, 2L, 0L, 0L, 0.0),
        (4L, 1L, 2L, 1L, 13.0), (5L, 2L, 1L, 0L, 7.5)),
        s"streamed $streamed vs batch $batch")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("I40 streaming CUSUM equals the scaled-integer recursion across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // hourly series with a level shift at hour 6; reference = the
    // pre-shift rate 2/1 (num=2, den=1) so the shift accumulates
    val counts = Seq(2L, 1L, 3L, 2L, 2L, 2L, 5L, 6L, 5L, 6L)
    val rows = counts.zipWithIndex.map { case (n, h) =>
      Streaming.CuIn("x", new Timestamp(h * 3600000L), n)
    }
    val mem = MemoryStream[Streaming.CuIn]
    val q = Streaming.cusumStreaming(mem.toDS(), refNum = 2L, refDen = 1L,
        alarmMeans = 3L)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      // two micro-batches: state must carry the running S across them
      mem.addData(rows.take(6): _*); q.processAllAvailable()
      mem.addData(rows.drop(6): _*); q.processAllAvailable()
      val got = spark.table("cusum_out")
        .select("hour", "n", "s_scaled", "alarm")
        .as[(Timestamp, Long, Long, Int)].collect().sortBy(_._1.getTime)
        .map(r => (r._3, r._4)).toSeq
      var s = 0L
      val expect = counts.map { n =>
        s = math.max(0L, s + n - 2L)
        (s, if (s > 3L * 2L) 1 else 0)
      }
      assert(got == expect, s"streamed $got vs recursion $expect")
      // the shift is detected: alarms only after the level change
      assert(got.takeWhile(_._2 == 0).size >= 6 && got.exists(_._2 == 1))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("I32 transformWithState throttle matches the batch cap across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streaming.ThEv]
    val q = Streaming.throttleStreaming(mem.toDS(), maxPerWindow = 2)
      .writeStream.format("memory").queryName("th_out").outputMode("append").start()
    try {
      // user 1: three events in one hour (third must be rejected),
      // then one in the NEXT hour (counter resets with the key)
      mem.addData(
        Streaming.ThEv(1L, 1L, ts(0)), Streaming.ThEv(2L, 1L, ts(5)),
        Streaming.ThEv(3L, 2L, ts(2)))
      q.processAllAvailable()
      // batch 2: the (user 1, hour 0) counter must carry via state
      mem.addData(
        Streaming.ThEv(4L, 1L, ts(10)), Streaming.ThEv(5L, 1L, ts(70)))
      q.processAllAvailable()
      val streamed = spark.table("th_out")
        .select("event_id", "user_id", "seq", "admitted")
        .as[(Long, Long, Long, Int)].collect().toSet
      val batch = Streaming.throttleBatch(
          Seq((1L, 1L, ts(0)), (2L, 1L, ts(5)), (3L, 2L, ts(2)),
            (4L, 1L, ts(10)), (5L, 1L, ts(70)))
            .toDF("event_id", "user_id", "ts"), maxPerWindow = 2)
        .select("event_id", "user_id", "seq", "admitted")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(streamed == batch && streamed == Set(
        (1L, 1L, 1L, 1), (2L, 1L, 2L, 1), (3L, 2L, 1L, 1),
        (4L, 1L, 3L, 0), (5L, 1L, 1L, 1)),
        s"streamed $streamed vs batch $batch")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("I33 event-time timers close quiet sessions; gap events close inline; parity with batch gap-split") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val gapMs = 10 * 60000L // 10 min
    val mem = MemoryStream[Streaming.SsEv]
    val q = Streaming.sessionTimeoutStreaming(mem.toDS(), gapMs)
      .writeStream.format("memory").queryName("sess_timer_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 at min 0 and 5 (one session); user 2 at min 2
      mem.addData(Streaming.SsEv(1L, ts(0)), Streaming.SsEv(1L, ts(5)),
        Streaming.SsEv(2L, ts(2)))
      q.processAllAvailable()
      // batch 2: user 1 again at min 40 — beyond the gap, so the FIRST
      // session closes INLINE (closed_by = gap) regardless of watermark
      mem.addData(Streaming.SsEv(1L, ts(40)))
      q.processAllAvailable()
      // the first session closes INLINE with the gap marker (the timer
      // path may ALSO have closed other quiet keys already — a
      // processAllAvailable drains the extra watermark-advance batch)
      val afterGap = spark.table("sess_timer_out").as[Streaming.ClosedSession].collect()
      assert(afterGap.map(c => (c.user_id, c.session_start, c.session_end, c.n_events, c.closed_by)).toSet
        .contains((1L, ts(0), ts(5), 2L, "gap")))
      // batches 3-4: watermark flushes (user 99) push event time past
      // every live session's last + gap → TIMERS close users 2 and 1
      mem.addData(Streaming.SsEv(99L, ts(120))); q.processAllAvailable()
      mem.addData(Streaming.SsEv(99L, ts(121))); q.processAllAvailable()
      mem.addData(Streaming.SsEv(99L, ts(200))); q.processAllAvailable()
      mem.addData(Streaming.SsEv(99L, ts(201))); q.processAllAvailable()
      val closed = spark.table("sess_timer_out").as[Streaming.ClosedSession].collect()
        .filter(_.user_id != 99L)
      assert(closed.map(c => (c.user_id, c.session_start, c.session_end, c.n_events)).toSet ==
        Set((1L, ts(0), ts(5), 2L), (2L, ts(2), ts(2), 1L), (1L, ts(40), ts(40), 1L)))
      assert(closed.filter(_.closed_by == "timeout").map(_.user_id).toSet == Set(1L, 2L))
      // batch-face parity: gap-split sessionization over the same events
      val batchDf = Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(2)), (1L, ts(40)))
        .toDF("user_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val batch = batchDf
        .withColumn("brk", when(col("ts").cast("long") * 1000 -
          lag(col("ts").cast("long") * 1000, 1).over(w) > gapMs, 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(w))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(closed.map(c => (c.user_id, c.session_start, c.session_end, c.n_events)).toSet == batch)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
