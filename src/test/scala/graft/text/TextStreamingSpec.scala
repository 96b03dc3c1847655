package graft.text

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The r13 G-family streaming faces: corpus-stat cells (G6) and the
  * language mix (G3) over a document ingest stream, pinned
  * stream=batch including a cell split across micro-batches — the
  * I13/I14 incremental-half / batch-finish discipline applied to the
  * text family. */
class TextStreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  // (ts, source, lang, text): the hour-0 (web,en) cell gets docs from
  // BOTH micro-batches (state must merge); hour-1 holds one (web,en)
  // doc so the finishing pass folds two windows of one cell key
  private lazy val docs = Seq(
    (ts(1), "web", "en", "the quick brown fox jumps"),
    (ts(5), "web", "en", "a dog and a cat and a bird"),
    (ts(7), "book", "de", "der hund und die katze und der vogel"),
    (ts(40), "web", "en", "it was the best of times it was the worst"),
    (ts(70), "web", "en", "short text"),
    (ts(75), "book", "de", "und der die das ist nicht gut"),
  )

  test("G6 streaming corpus cells match the batch run of the same function, across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String, String)]
    val asDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "source", "lang", "text")
    val q = TextStreaming.corpusCells(asDocs(mem.toDF()))
      .writeStream.format("memory").queryName("corpus_cells")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)    // hour-0 (web,en) partial
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)    // rest incl. the cell's 2 more docs
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", "xx", "x")); q.processAllAvailable()
      mem.addData((ts(200000), "flush", "xx", "x")); q.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.select("window_start", "source", "lang", "n_docs",
            "total_tokens", "min_chars", "max_chars")
          .collect().map(r => (r.getTimestamp(0), r.getString(1),
            r.getString(2), r.getLong(3), r.getLong(4), r.getInt(5),
            r.getInt(6))).toSet
      val streamed = spark.table("corpus_cells")
        .filter(col("source") =!= "flush")
      val batch = TextStreaming.corpusCells(asDocs(docs.toDF()))
      assert(cells(streamed).nonEmpty && cells(streamed) == cells(batch),
        s"streamed ${cells(streamed)} vs batch ${cells(batch)}")
      // the split cell merged: hour-0 (web,en) counts 3 docs
      assert(cells(streamed).exists(c =>
        c._2 == "web" && c._3 == "en" && c._4 == 3L),
        s"cross-batch cell must merge to 3 docs: ${cells(streamed)}")
      // the histogram sketches merged identically too: the finishing
      // roll-up (incl. the interpolated median) agrees stream vs batch
      def finish(df: org.apache.spark.sql.DataFrame) =
        TextStreaming.corpusStatsFromCells(df)
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5),
            r.getInt(6), r.getDouble(7))).toSet
      assert(finish(streamed) == finish(
        TextStreaming.corpusCells(asDocs(docs.toDF()))),
        "finishing pass must agree stream vs batch")
    } finally q.stop()
  }

  test("G3 streaming language mix matches the batch run, and the vote matches textLangid") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String, String)]
    val asDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "source", "lang", "text")
    val q = TextStreaming.langMixCells(asDocs(mem.toDF()))
      .writeStream.format("memory").queryName("lang_mix")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", "xx", "zzz")); q.processAllAvailable()
      mem.addData((ts(200000), "flush", "xx", "zzz")); q.processAllAvailable()
      def mix(df: org.apache.spark.sql.DataFrame) =
        df.select("window_start", "lang_pred", "n_docs").collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // drop the flush rows by their window (far future)
      val cut = ts(50000)
      val streamed = spark.table("lang_mix").filter(col("window_start") < cut)
      val batch = TextStreaming.langMixCells(asDocs(docs.toDF()))
      assert(mix(streamed).nonEmpty && mix(streamed) == mix(batch),
        s"streamed ${mix(streamed)} vs batch ${mix(batch)}")
      // the de docs carry der/und/die/das stopwords — the vote must
      // label at least one window cell "de" (the drift signal is real)
      assert(mix(streamed).exists(_._2 == "de"), s"${mix(streamed)}")
    } finally q.stop()
  }
}
