package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G-family STREAMING faces (r13, the §7 round-14 candidate pulled
  * forward): corpus statistics as a production ingest pipeline emits
  * them — per ingest-time window, incrementally, with bounded state —
  * following the I13/I14 incremental-half / batch-finish split used
  * throughout `graft.streaming`.
  *
  * The document transforms themselves (tokenize, length, language
  * vote) are stateless per-row expressions, so they ride a stream
  * unchanged; what changes at streaming time is the AGGREGATION
  * contract. The batch G6 face computes an EXACT median via
  * `percentile`, whose state is the full per-group value buffer — an
  * unbounded stream cannot hold that. The streaming face carries K5's
  * deterministic equi-width histogram sketch instead (bins×8 bytes per
  * open cell, vector-add merge), from which the finishing pass
  * interpolates the median with error ≤ one bin width. Because the
  * sketch is a pure function of the value multiset (no sampling), the
  * SAME function run over the same rows as a batch frame produces
  * IDENTICAL cells — the parity TextStreamingSpec pins, including a
  * cell split across micro-batches.
  */
object TextStreaming {

  /** Doc-length histogram shape for the streaming cells: [0, 8192) in
    * 64 bins of exact width 128 — covers the synthetic corpus's text
    * lengths with no edge clamping in play, and (x−0)/128 is an exact
    * double operation. */
  val LenLo = 0.0
  val LenHi = 8192.0
  val LenBins = 64

  /** G6 streaming face, incremental half: per-(ingest-window, source,
    * lang) corpus cells — doc count, token sum, char min/max, and the
    * K5 length sketch. State per open cell is O(1) counters plus the
    * fixed 512-byte histogram; the watermark closes and emits cells in
    * append mode. `docs` needs (ts, source, lang, text). */
  def corpusCells(docs: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    val toks = TextQueries.tokens(col("text"))
    docs.withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("source"), col("lang"),
        size(toks).as("n"), length(col("text")).as("len"))
      .groupBy(window(col("ts"), windowDur).as("w"),
        col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        min(col("len")).as("min_chars"),
        max(col("len")).as("max_chars"),
        graft.functions.VectorFunctions
          .qhist(spark, col("len"), LenLo, LenHi, LenBins).as("len_hist"))
      .select(col("w.start").as("window_start"), col("source"),
        col("lang"), col("n_docs"), col("total_tokens"),
        col("min_chars"), col("max_chars"), col("len_hist"))
  }

  /** G6 finishing: roll emitted cells up to per-(source, lang) corpus
    * stats — counters sum, min/max fold, histograms merge by vector
    * add (≤ bins rows per group after the explode), and the median
    * interpolates inside the crossing bin exactly as
    * text_quantile_sketch does. Runs on the streaming sink table OR on
    * batch cells — the shared-finishing discipline. */
  def corpusStatsFromCells(cells: DataFrame): DataFrame = {
    val sums = cells.groupBy("source", "lang")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))
    // the bins branch re-aliases its keys at the source: both
    // finishing branches read the SAME cells frame, and a join whose
    // sides share attribute ids trips the analyzer's conflicting-
    // reference resolution on streaming memory-sink views
    val bins = cells.select(col("source").as("b_source"),
        col("lang").as("b_lang"),
        posexplode(col("len_hist")).as(Seq("bin", "cnt")))
      .filter(col("cnt") > 0)
      .groupBy("b_source", "b_lang", "bin").agg(sum(col("cnt")).as("cnt"))
    val cumW = Window.partitionBy("b_source", "b_lang").orderBy("bin")
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(cumW))
      // group total via a window over the SAME partitioning — no
      // self-join, no extra shuffle
      .withColumn("nv",
        sum(col("cnt")).over(Window.partitionBy("b_source", "b_lang")))
    val t = lit(0.5) * col("nv")
    val med = cum
      .filter(col("cum") >= t)
      .withColumn("r", row_number().over(cumW))
      .filter(col("r") === 1)
      .select(col("b_source"), col("b_lang"),
        round(lit(LenLo) + lit((LenHi - LenLo) / LenBins) *
          (col("bin") + (t - (col("cum") - col("cnt"))) / col("cnt")), 4)
          .as("median_chars_est"))
    sums.join(med, col("source") === col("b_source") &&
        col("lang") === col("b_lang"))
      .drop("b_source", "b_lang")
      .withColumn("avg_tokens",
        round(col("total_tokens").cast("double") / col("n_docs"), 4))
      .select("source", "lang", "n_docs", "total_tokens", "avg_tokens",
        "min_chars", "max_chars", "median_chars_est")
  }

  /** G3 streaming face: language mix per ingest window — the langid
    * vote is a stateless per-row expression (TextQueries.langPredCol),
    * so the stream adds only one counter per (window, predicted lang)
    * of state. The drift monitor shape: a shifting mix between windows
    * IS the ingest-language drift signal. */
  def langMixCells(docs: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withWatermark("ts", watermarkDelay)
      .select(col("ts"), TextQueries.langPredCol(col("text")).as("lang_pred"))
      .groupBy(window(col("ts"), windowDur).as("w"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("w.start").as("window_start"), col("lang_pred"),
        col("n_docs"))
}
