package graft.text

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM training-data pipelines (SURVEY §2
  * G1-G4): token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything is pure Catalyst column expressions over codegen'd
  * built-ins (split / regexp_extract_all / higher-order array functions
  * / md5) — no UDFs, so the hot path stays inside whole-stage codegen
  * and scales linearly with input splits: per-document work only, no
  * shuffle at all (the narrowest possible plan for a 100 TB corpus
  * scan). DuckDB oracle SQL is generated from the same constants
  * (stopword profiles, regexes) the operators use.
  */
object TextQueries {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** BPE-ish token classes: letter runs, digit runs, single non-space
    * symbols — the shape a byte-pair pretokenizer splits on. */
  val tokenClassRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Stopword profiles for the language-ID heuristic. Order matters:
    * ties resolve to the FIRST language reaching the max score. */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "es"),
    "it" -> Seq("il", "lo", "di", "e", "un", "per"),
  )

  private val enStops = stopwordProfiles.head._2

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** G1: token counts (whitespace + regex token classes) + char len. */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    d.select(
      col("doc_id"),
      size(toks).as("n_tokens_ws"),
      size(regexp_extract_all(col("text"), lit(tokenClassRegex), lit(0))).as("n_tokens_re"),
      length(col("text")).as("len_chars"))
  }

  /** G2: quality signals: length, avg token length, punctuation ratio,
    * stopword ratio, duplicate-token ratio, and a keep flag — the
    * standard pre-training corpus filters (Gopher/C4-style rules). */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    val n = size(toks).cast("double")
    val len = length(col("text")).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val stops = countIn(toks, enStops).cast("double")
    val dupRatio = round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 4)
    val keep = size(toks).between(5, 1000) && dupRatio < 0.8
    d.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(len / n, 4).as("avg_token_len"),
      round(punct / len, 4).as("punct_ratio"),
      round(stops / n, 4).as("stopword_ratio"),
      dupRatio.as("dup_token_ratio"),
      keep.cast("int").as("keep"))
  }

  // ----- G59: hashed linear quality classifier (FineWeb-Edu shape) --

  /** G59 feature space: the hashing trick's bucket count. Small here
    * so collisions genuinely occur at test SF (the property the
    * hashing trick is defined by); production uses 2²⁰+. */
  val QcBuckets = 1024
  /** G59 weight range: frozen per-bucket weights in [−1000, 1000]. */
  val QcWgtRange = 1000

  private def qcBucket(feat: Column): Column =
    conv(substring(md5(feat), 1, 8), 16, 10).cast("long") % QcBuckets
  private def qcWeight(bucket: Column): Column =
    conv(substring(md5(concat(lit("qw|"), bucket.cast("string"))), 1, 8),
      16, 10).cast("long") % (2 * QcWgtRange + 1) - QcWgtRange

  /** G59: MODEL-BASED quality classification via the hashing trick —
    * the FineWeb-Edu / fastText deployment shape: a frozen LINEAR
    * classifier over hashed unigram+bigram features scores every
    * document in one distributed pass. This is the third rung of the
    * quality ladder — G2's heuristics, G19/G55's language models,
    * and THIS: a trained classifier applied at corpus scale (how
    * FineWeb-Edu, DCLM and every production quality pipeline
    * actually filter). The model here is deterministic md5-derived
    * weights (the frozen-matrix idiom — a real model would broadcast
    * its weight table; hashing means the table is O(buckets), never
    * O(vocab)); the SHAPE is the production one: explode features →
    * hash to bucket → weight lookup as arithmetic → one map-side-
    * combinable per-doc sum. Zero joins, one shuffle on doc_id
    * (shared by the bigram window and the final agg). */
  def textClassifier(spark: SparkSession, dir: String): DataFrame =
    classifierScored(Tables.documents(spark, dir))

  /** The G59 kernel over an explicit (doc_id, text, …) frame — the
    * seam the I61 streaming gate scores micro-batches through, so
    * stream ≡ batch by construction (the knScoreAgainst
    * discipline). */
  def classifierScored(d: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val ex = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "t")))
    val uni = ex.select(col("doc_id"), col("t").as("feat"))
    val bi = ex
      .select(col("doc_id"), col("t"), lead(col("t"), 1).over(w).as("next"))
      .filter(col("next").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("next")).as("feat"))
    val scored = uni.unionAll(bi)
      .select(col("doc_id"), qcWeight(qcBucket(col("feat"))).as("wgt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("wgt")).as("score"))
    // left join back: a featureless doc must surface as a row with
    // score 0, not vanish (the A11/H49 completeness discipline)
    d.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0L)).as("score"),
        round(col("score").cast("double") / col("n_feats"), 4).as("avg_wgt"),
        (coalesce(col("score"), lit(0L)) >= 0).cast("int").as("keep"))
  }

  /** The G3 language vote as a reusable STATELESS column — the same
    * expression serves the batch query and the r13 streaming face
    * (graft.text.TextStreaming.langMixCells): ties go to the first
    * profile in declaration order; zero hits → "und". */
  def langPredCol(text: Column): Column = {
    val toks = tokens(text)
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> countIn(toks, words)
    }
    val m = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(m === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === m, lit(lang))
    }
  }

  /** G3: language ID by stopword-profile voting; ties go to the first
    * profile in declaration order; zero hits → "und". */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> countIn(toks, words)
    }
    val m = greatest(scores.map(_._2): _*)
    val pred = langPredCol(col("text"))
    val cols = col("doc_id") +:
      scores.map { case (lang, s) => s.as(s"s_$lang") } :+
      m.as("score_max") :+ pred.as("lang_pred")
    d.select(cols: _*)
  }

  /** G16: language-ID confusion matrix — predicted vs labeled lang with
    * per-cell counts (the eval query any classifier in the pipeline
    * gets; the synthetic corpus' lang labels are uncorrelated with the
    * text, so the matrix shape — not accuracy — is the point). One
    * join on doc_id + one tiny aggregation. */
  def textLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = textLangid(spark, dir).select(col("doc_id"), col("lang_pred"))
    Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(pred, "doc_id")
      .groupBy(col("lang").as("lang_actual"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** G4: document fingerprints: whole-doc md5, min-token-hash, and a
    * min 3-gram-shingle hash (the rolling-window fingerprint used for
    * near-dup blocking). Min over md5 hex strings is lexicographic —
    * identical in every engine. Exploded-row aggregation (codegen'd,
    * map-side combined) rather than interpreted array lambdas. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan, ONE shuffle (r2 took three scans + two joins): tokens
    // explode to rows carrying the 32-char doc hash (never the full
    // text); the 3-gram shingle at position i is rebuilt with two
    // window leads over (doc_id, pos) — the window's own shuffle is
    // the only exchange, and the per-doc aggregation reuses its
    // partitioning. All hashing is codegen'd md5 on plain rows (no
    // interpreted array lambdas — the measured HOF pitfall). Docs with
    // fewer than 3 tokens have no shingle rows; their min shingle hash
    // falls back to md5(text), matching the oracle's CASE.
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val l1 = lead(col("t"), 1).over(w)
    val l2 = lead(col("t"), 2).over(w)
    d.select(col("doc_id"), md5(col("text")).as("md5_full"),
        posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), col("md5_full"), md5(col("t")).as("th"),
        when(l2.isNotNull, md5(concat_ws(" ", col("t"), l1, l2))).as("sh"))
      .groupBy("doc_id")
      .agg(max(col("md5_full")).as("md5_full"),
        min(col("th")).as("min_token_hash"),
        coalesce(min(col("sh")), max(col("md5_full"))).as("min_shingle_hash"))
  }

  /** G5: deterministic train/val/test split by md5 hash range — the
    * standard way to partition a training corpus so membership is
    * stable across runs, machines and engines (no RNG state, no
    * shuffling): bucket = first 4 md5 hex digits of (salt ++ doc_id)
    * as an integer in [0, 65536); <90% train, <95% val, else test. */
  /** Hash-split boundaries over the 16-bit bucket space: <90% train,
    * <95% val, else test — shared by split/contamination and the
    * incremental-dedup historical/incoming partition. */
  val TrainBucketMax = 58982
  val ValBucketMax = 62259

  /** The G5 split's 16-bit hash bucket for an id column — THE shared
    * spelling (r16 review: four inlined copies had grown across
    * text/dedup/multimodal; a formula change updated in one place
    * would silently desynchronize the train/incoming boundary the
    * incremental-dedup and image-admission faces depend on). */
  def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("split|"), id.cast("string"))), 1, 4), 16, 10)
      .cast("int")

  /** True iff the G5 split assigns `id` to the TRAIN (historical)
    * side — the incremental faces' partition predicate. */
  def isTrainSplit(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    splitBucket(id) < TrainBucketMax

  def textSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val bucket = splitBucket(col("doc_id"))
    d.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < TrainBucketMax, "train").when(bucket < ValBucketMax, "val")
        .otherwise("test").as("split"))
  }

  /** G6: corpus statistics per (source, lang): documents, token sums,
    * length distribution (exact median via percentile) — the
    * reporting surface a data pipeline emits per ingest batch. */
  def textCorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val n = size(tokens(col("text")))
    d.select(col("source"), col("lang"), n.as("n"), length(col("text")).as("len"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        round(avg(col("n")), 4).as("avg_tokens"),
        min(col("len")).as("min_chars"),
        max(col("len")).as("max_chars"),
        round(expr("percentile(len, 0.5)"), 1).as("median_chars"))
  }

  /** G7: corpus-wide top-k bigrams (deterministic tie-break) — the
    * n-gram frequency table quality/contamination analyses start from.
    * Exploded-row + window-lead formulation (the G4 pattern): the r4
    * measured rewrite from transform/slice array lambdas, which run
    * INTERPRETED (§3 rule) and were 4× slower at sf0.1. Two shuffles
    * (window by doc, count by ngram), both map-side-combinable; top-k
    * collapses to TakeOrderedAndProject. */
  def textNgrams(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val next = lead(col("t"), 1).over(w)
    d.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("t"), next.as("next"))
      .filter(col("next").isNotNull)
      .select(concat_ws(" ", col("t"), col("next")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(20)
  }

  /** G8: top-3 TF-IDF terms per document — the classic term-weighting
    * surface (contamination checks, keyword extraction). Output keeps
    * the integer evidence (tf, df) and the RANK rather than the float
    * score: ordering agrees across engines (exact ties share identical
    * (tf, df) and break on the term), while a printed float could
    * differ in the last ulp of ln(). Two shuffles: (doc,term) counts,
    * then per-term doc frequency joined back. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // nDocs as an IN-PLAN broadcast scalar (one row) instead of a
    // driver-side d.count(): the r2 version launched an extra job per
    // invocation before the real plan even started.
    val nDocs = broadcast(d.agg(count(lit(1)).cast("double").as("n_docs")))
    val toks = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy((col("tf") * log(col("n_docs") / col("df"))).desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(nDocs)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "rnk")
  }

  /** G24 retrieval-scoring constants. k1/b are the standard Robertson
    * parameterization; the query is a FIXED in-vocabulary term set so
    * the scored surface is deterministic. Written as exact double
    * literals (1.2, 0.75 are not representable — both engines parse
    * the same literal to the same double, which is what matters). */
  val Bm25QueryTerms: Seq[String] = Seq("hash", "scan", "merge")
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 20

  /** G24: BM25 retrieval scoring — the quality/relevance scorer a
    * training-data pipeline runs to mine query-relevant documents
    * (and the standard lexical baseline next to the F-section dense
    * retrieval). score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b
    * + b·dl/avgdl)) with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * Plan shape at 100 TB: the tokens explode once; tf rows are
    * FILTERED to the query terms before any shuffle (the only
    * per-term aggregation that moves is |q|·N_matching rows, not the
    * corpus vocabulary), df comes from that same tiny frame, and
    * N/avgdl ride one broadcast scalar row — so the whole query costs
    * one corpus scan + one small shuffle + a top-k rank. */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val stats = broadcast(d.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(tokens(col("text"))).cast("double")).as("avgdl")))
    val tf = d
      .select(col("doc_id"), size(tokens(col("text"))).as("dl"),
        explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(Bm25QueryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (Bm25K1 + 1.0) /
      (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) +
        lit(Bm25B) * col("dl") / col("avgdl")))
    // top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    // partial top-k merged on one reducer — NOT a global row_number
    // window, which would single-partition-sort every matching doc);
    // the rank is then numbered over the K surviving rows only
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(stats)
      .groupBy("doc_id")
      .agg(sum(idf * tfNorm).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id")).limit(Bm25TopK)
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col("doc_id"), col("n_terms_hit"),
        round(col("score"), 4).as("bm25"))
  }

  /** K24: persisted inverted text index + indexed BM25 lookup — the
    * write-once/query-many face of [[textBm25]]. The build phase pays
    * ONE corpus scan and one shuffle by term to materialize the
    * classic IR triple: postings (term, doc_id, tf, dl) BUCKETED BY
    * TERM, a per-term document-frequency dictionary, and a 1-row
    * corpus-stats table. The query phase never touches the corpus:
    * the `term IN (...)` filter bucket-prunes the postings scan
    * (SelectedBucketsCount < total — asserted in StoreSpec), the
    * dictionary rows for the query terms broadcast, and scoring +
    * top-k run over only the matching postings. At 100 TB this is the
    * difference between re-tokenizing the corpus per query (what
    * [[textBm25]] must do) and an index lookup proportional to the
    * query terms' posting lists — while producing the IDENTICAL
    * ranked result, which is exactly what the shared oracle checks. */
  def textBm25Indexed(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    val key = GraftStore.dirKey(dir)
    val postingsT = GraftStore.ensureBucketed(spark, s"bm25_postings_$key", 8, Seq("term")) {
      Tables.documents(spark, dir)
        .select(col("doc_id"), size(tokens(col("text"))).as("dl"),
          explode(tokens(col("text"))).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    }
    val dictT = GraftStore.ensurePlain(spark, s"bm25_dict_$key") {
      spark.table(postingsT).groupBy("term")
        .agg(count(lit(1)).cast("double").as("df"))
    }
    val statsT = GraftStore.ensurePlain(spark, s"bm25_stats_$key") {
      spark.table(postingsT).select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).cast("double").as("n_docs"),
          avg(col("dl").cast("double")).as("avgdl"))
    }
    val post = spark.table(postingsT).filter(col("term").isin(Bm25QueryTerms: _*))
    val dict = spark.table(dictT).filter(col("term").isin(Bm25QueryTerms: _*))
    val stats = broadcast(spark.table(statsT))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf") * (Bm25K1 + 1.0) /
      (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) +
        lit(Bm25B) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    post.join(broadcast(dict), "term")
      .crossJoin(stats)
      .groupBy("doc_id")
      .agg(sum(idf * tfNorm).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id")).limit(Bm25TopK)
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col("doc_id"), col("n_terms_hit"),
        round(col("score"), 4).as("bm25"))
  }

  /** PII patterns applied in declaration order (order matters: a
    * phone-like SSN must hit the earlier, more specific rule). Both the
    * Spark chain and the oracle SQL are generated from this list. The
    * regexes stay in the Java∩RE2 common dialect (classes, \d, \b,
    * bounded reps) so Spark and DuckDB agree byte for byte. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      "[SSN]"),
    ("phone", "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b",                "[PHONE]"),
    ("ipv4",  "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** G9: PII redaction — sequential regexp_replace chain plus a
    * per-rule match count (the audit trail a redaction pass must
    * emit). Pure codegen'd per-row work: no shuffle, scales as a
    * straight corpus scan. */
  def textRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val redacted = piiPatterns.foldLeft(col("text")) {
      case (c, (_, re, token)) => regexp_replace(c, re, token)
    }
    val counts = piiPatterns.map { case (name, re, _) =>
      size(regexp_extract_all(col("text"), lit(re), lit(0))).as(s"n_$name")
    }
    d.select((col("doc_id") +: counts :+ redacted.as("redacted")): _*)
  }

  val ChunkChars = 200
  val ChunkStride = 150

  /** G10: fixed-window overlapping chunking (window 200 chars, stride
    * 150) — the context-window preprocessing step. One explode per
    * document, no shuffle; chunk count is ceil(len/stride) so the
    * output is linear in corpus size. */
  def textChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val len = length(col("text"))
    val starts = when(len > 0, sequence(lit(0), len - 1, lit(ChunkStride)))
      .otherwise(array())
    d.select(col("doc_id"), col("text"), explode(starts).as("chunk_start"))
      .select(col("doc_id"),
        (col("chunk_start") / ChunkStride).cast("int").as("chunk_idx"),
        col("chunk_start"),
        substring(col("text"), col("chunk_start") + 1, lit(ChunkChars)).as("chunk"))
  }

  /** Non-overlapping window for cross-doc chunk dedup (an overlapping
    * stride would trivially self-duplicate within a document). */
  val DedupChunkChars = 200

  /** G14: cross-document duplicated-chunk detection — the boilerplate
    * finder (licence headers, navigation text, templated passages) that
    * document-level dedup misses. Chunks hash with md5 and aggregate by
    * hash: one explode + one map-side-combined shuffle on the chunk
    * hash, O(corpus chars) at any scale; only hashes seen in >= 2
    * distinct documents survive. */
  def textDedupChunks(spark: SparkSession, dir: String): DataFrame =
    dedupChunks(Tables.documents(spark, dir))

  def dedupChunks(d: DataFrame): DataFrame = {
    val len = length(col("text"))
    val starts = when(len > 0, sequence(lit(0), len - 1, lit(DedupChunkChars)))
      .otherwise(array())
    d.select(col("doc_id"), explode(starts).as("s"),
        col("text"))
      .select(col("doc_id"),
        md5(substring(col("text"), col("s") + 1, lit(DedupChunkChars))).as("chunk_md5"),
        length(substring(col("text"), col("s") + 1, lit(DedupChunkChars))).as("chunk_len"))
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        min(col("chunk_len")).as("chunk_len"))
      .filter(col("n_docs") >= 2)
  }

  /** G15: token-entropy quality signal — Shannon entropy of each
    * document's token distribution (low entropy = repetitive/templated
    * text, a standard pretraining quality filter alongside G2's
    * ratios). Explode + two same-keyed aggregations, one shuffle on
    * doc_id. The per-token terms use log2 (libm, can differ by an ulp
    * across engines), so the result is rounded to 4 decimals — the sum
    * over ≤ vocabulary-size terms keeps the drift orders of magnitude
    * below the rounding step. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val counts = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    counts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_types"), sum(col("n")).as("n_toks"),
        sum(col("n").cast("double") * log2(col("n").cast("double"))).as("snlogn"))
      .select(col("doc_id"), col("n_types"), col("n_toks"),
        // H = log2(T) − (Σ n·log2 n)/T  (algebraically −Σ p·log2 p,
        // but with ONE division so both engines run the same ops)
        round(log2(col("n_toks").cast("double"))
          - col("snlogn") / col("n_toks"), 4).as("entropy"))
  }

  /** CDC parameters: boundary gram width and the modulus (1/Mod of
    * positions cut ⇒ expected chunk length ≈ Mod chars). */
  val CdcGram = 8
  val CdcMod = 64

  /** G17: content-defined chunking — chunk boundaries where the
    * rolling 8-gram hash ≡ 0 (mod 64), so boundaries depend on CONTENT
    * not offsets: insert a byte early in a document and fixed windows
    * (G10/G14) all shift, but CDC chunks after the edit realign — the
    * chunking real dedup/delta systems (rsync, FastCDC) use. Emits
    * per-document chunk statistics.
    *
    * r10 plan: boundary detection is ONE codegen'd pass per document
    * (graft_cdc_boundaries → array<int> of starts, the r6 per-char
    * explode + per-doc window-sort reassembly collapsed into a static
    * kernel; 21 MB shuffled at sf0.1 → zero, and at 100 TB the
    * per-char rows were the dominant cost of the whole query). Chunk
    * extents read the SAME array with element_at — no window, no join
    * back, no shuffle before the final map-side-combined per-doc
    * aggregate. */
  def textCdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(length(col("text")) > 0)
    val withB = d.select(col("doc_id"), col("text"),
      graft.functions.VectorFunctions
        .cdcBoundaries(spark, col("text"), CdcGram, CdcMod).as("bs"))
    // posexplode yields the 0-based index i; the NEXT boundary is
    // try_element_at(bs, i + 2) (1-based; the try_ form returns null
    // past the tail where ANSI element_at throws)
    withB
      .select(col("doc_id"), col("text"), col("bs"),
        posexplode(col("bs")).as(Seq("i", "start")))
      .withColumn("next_start", try_element_at(col("bs"), col("i") + 2))
      .withColumn("chunk_len",
        coalesce(col("next_start"), length(col("text")) + 1) - col("start"))
      .withColumn("chunk_md5", md5(col("text").substr(col("start"), col("chunk_len"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        round(avg(col("chunk_len")), 4).as("avg_chunk_len"),
        max(col("chunk_len")).as("max_chunk_len"),
        countDistinct(col("chunk_md5")).as("n_distinct_chunks"))
  }

  val PackBudget = 512 // tokens per packed sequence

  /** G11: contiguous sequence packing — documents in doc_id order are
    * packed into fixed token budgets by a running sum, PER SOURCE
    * shard: the window partitions by source, so packing parallelizes
    * across shards instead of forcing one global sequential scan (the
    * per-shard split any 100 TB packing run uses). Bin assignment is
    * floor(exclusive-cumsum / budget) — a doc larger than the budget
    * still lands in exactly one bin. */
  def textPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val n = size(tokens(col("text")))
    d.select(col("source"), col("doc_id"), n.as("n_tok"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / PackBudget).cast("int"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens_packed"))
  }

  val SampleBucketMax = 6554 // of 65536 ≈ 10% per stratum

  /** G12: deterministic stratified sampling — hash-range filter salted
    * with the stratum (lang), so each stratum is sampled independently
    * and membership is stable across runs/engines (same mechanism as
    * the G5 split, no RNG). Pure filter: no shuffle. */
  def textSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val bucket = conv(substring(md5(concat_ws("|", lit("sample"), col("lang"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("int")
    d.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < SampleBucketMax)
  }

  /** G19: bigram-LM surprise scoring — MODEL-BASED quality scoring
    * (the step beyond G2's heuristic ratios): a bigram language model
    * is "trained" as exact counts over the TRAIN split (G5), and every
    * document is scored by its average negative log-likelihood under
    * add-one smoothing — low surprise ≈ in-distribution text, high
    * surprise ≈ noise/outliers, the novelty/quality dial a pretraining
    * pipeline thresholds on. Shapes: one exploded-window bigram pass,
    * two keyed count aggregations on the train side, two broadcast-or-
    * shuffle joins keyed on the bigram/prefix, vocab as an in-plan
    * broadcast scalar. Cross-engine floats: counts and vocab are exact
    * ints, each term is the identical log2((c+1)/(c_pre+V)) double,
    * and the per-doc mean is the one order-sensitive sum — round(4). */
  /** (doc_id, t, t2) bigram rows — the one extraction G19 and G20 both
    * consume (exploded tokens + a lead window over (doc_id, pos)); a
    * single definition keeps the two queries from silently drifting. */
  private def docBigrams(d: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    d.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
  }

  def textLmScore(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = docBigrams(Tables.documents(spark, dir))
    val train = bigrams.filter(isTrainSplit(col("doc_id"))).localCheckpoint(eager = true)
    val bg = train.groupBy("t", "t2").agg(count(lit(1)).as("c_bg"))
    val pre = train.groupBy("t").agg(count(lit(1)).as("c_pre"))
    val vocab = broadcast(
      train.select(col("t")).unionAll(train.select(col("t2").as("t")))
        .distinct().agg(count(lit(1)).as("vocab")))
    val term = -log2((col("c_bg") + 1).cast("double")
      / (col("c_pre") + col("vocab")))
    bigrams
      .join(bg, Seq("t", "t2"), "left")
      .join(pre, Seq("t"), "left")
      .crossJoin(vocab)
      .select(col("doc_id"),
        coalesce(col("c_bg"), lit(0L)).as("c_bg"),
        coalesce(col("c_pre"), lit(0L)).as("c_pre"), col("vocab"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("c_bg") === 0).cast("long")).as("n_unseen"),
        round(avg(term), 4).as("surprise"))
  }

  /** The trained KN count frames — built once (G54/G55 train on the
    * G5 split) and reusable as a STATIC side input (the I56 stream
    * gate scores micro-batches against a fixed model, the production
    * CCNet shape: the LM is pre-trained, the stream is scored). */
  final case class KnModel(bg: DataFrame, pre: DataFrame,
      n1f: DataFrame, n1b: DataFrame, scal: DataFrame)

  def knModelOf(trainDocs: DataFrame): KnModel = {
    val train = docBigrams(trainDocs).localCheckpoint(eager = true)
    val bg = train.groupBy("t", "t2").agg(count(lit(1)).as("c_bg"))
      .localCheckpoint(eager = true)
    // EVERY model frame is checkpointed (r16 review): a KnModel is a
    // static side input scored against once per micro-batch — a lazy
    // pre/vocab would re-aggregate the full train corpus on every
    // batch action, making the stream gate O(train) per batch
    val pre = train.groupBy("t").agg(count(lit(1)).as("c_pre"))
      .localCheckpoint(eager = true)
    // continuation counts: each bg row is one distinct (t1,t2) TYPE,
    // so count(*) per side IS the N1+ fertility of KN
    val n1f = bg.groupBy("t").agg(count(lit(1)).as("n1f"))
      .localCheckpoint(eager = true)
    val n1b = bg.groupBy("t2").agg(count(lit(1)).as("n1b"))
      .localCheckpoint(eager = true)
    // bigram-type total and vocab as broadcast 1-row scalars
    val scal = broadcast(bg.agg(count(lit(1)).as("n_types")).crossJoin(
      train.select(col("t")).unionAll(train.select(col("t2").as("t")))
        .distinct().agg(count(lit(1)).as("vocab")))
      .localCheckpoint(eager = true))
    KnModel(bg, pre, n1f, n1b, scal)
  }

  /** Score `docs` (doc_id, text, …) under a FIXED KN model — per-doc
    * arithmetic only, so batch and per-micro-batch invocations are
    * value-identical by construction. */
  def knScoreAgainst(docs: DataFrame, m: KnModel): DataFrame = {
    val pcont = (coalesce(col("n1b"), lit(0L)) + 1).cast("double") /
      (col("n_types") + col("vocab"))
    val p = when(col("c_pre").isNotNull,
      (greatest(coalesce(col("c_bg"), lit(0L)).cast("double") - 0.75, lit(0.0))
        + lit(0.75) * col("n1f") * pcont) / col("c_pre"))
      .otherwise(pcont)
    docBigrams(docs)
      .join(m.bg, Seq("t", "t2"), "left")
      .join(m.pre, Seq("t"), "left")
      .join(m.n1f, Seq("t"), "left")
      .join(m.n1b, Seq("t2"), "left")
      .crossJoin(m.scal)
      .select(col("doc_id"), col("c_pre"), (-log2(p)).as("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c_pre").isNull.cast("long")).as("n_backoff"),
        round(avg(col("term")), 4).as("kn_surprise"))
  }

  /** The interpolated-Kneser-Ney doc scores G54 and G55 share: one
    * definition so the bucketing face can't drift from the scorer. */
  private def knDocScores(d: DataFrame): DataFrame =
    knScoreAgainst(d, knModelOf(d.filter(isTrainSplit(col("doc_id")))))

  /** G54: interpolated Kneser-Ney bigram scoring — the smoothing the
    * published quality-filter pipelines actually run (CCNet's KenLM is
    * a KN-smoothed n-gram model; G19's add-one is the baseline): a
    * seen bigram is discounted by the absolute D=0.75 and the freed
    * mass is spread by the prefix's continuation FERTILITY (how many
    * distinct words follow t1), with the unigram backoff being the
    * CONTINUATION probability (in how many distinct contexts does t2
    * appear) rather than raw frequency — the "San Francisco" fix:
    * "Francisco" is frequent but only ever follows "San", so KN gives
    * it almost no backoff mass. All model inputs are exact integer
    * type/token counts over the G5 train split; the backoff add-one
    * ((n1b+1)/(T+V)) keeps zero-fertility words scoreable. Shapes:
    * the same one exploded-window bigram pass as G19, four keyed count
    * aggregations on the train side (each shuffles the TYPE table, not
    * the corpus), scalars broadcast; D=0.75 is an exact binary
    * fraction so the only cross-engine float risk is the order-
    * sensitive per-doc mean, rounded like every float face. */
  def textKnScore(spark: SparkSession, dir: String): DataFrame =
    knDocScores(Tables.documents(spark, dir))

  /** G55: CCNet-style perplexity bucketing (Wenzek et al. 2020) — the
    * published corpus-curation move: score every document under the
    * in-domain LM, then split each LANGUAGE into equal head / middle /
    * tail thirds by perplexity rank (head ≈ cleanest, tail gets
    * dropped or down-sampled; the mixture dial LLaMA's data recipe
    * tuned per bucket). Rank within language over the ROUNDED G54
    * surprise with doc_id as the total-order tiebreak — ntile over a
    * total order is engine-portable, raw-double ordering is not. One
    * window over the scored frame; the scorer's shapes are G54's. */
  def textCcnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("kn_surprise"), col("doc_id"))
    knDocScores(d)
      .join(d.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("kn_surprise"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** G20: top-bigram share — the fraction of a document's bigrams
    * covered by its SINGLE most frequent bigram (the Gopher-rules
    * repetition filter: templated/boilerplate text repeats one phrase;
    * G2's duplicate-token ratio can't see phrase-level repeats). Exact
    * integer counts + one division; max-count ties don't matter
    * because only the count reaches the output. */
  def textTopBigram(spark: SparkSession, dir: String): DataFrame = {
    docBigrams(Tables.documents(spark, dir))
      .groupBy("doc_id", "t", "t2").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_bigrams"), col("top_count"),
        round(col("top_count").cast("double") / col("n_bigrams"), 4).as("top_share"))
  }

  /** Gopher-rule stopword list (Rae et al. 2021, appendix A1.1): a doc
    * must contain at least two of these to pass the stopword rule. */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** G24: the published Gopher quality-filter battery as separate
    * per-rule flags (word-count bounds, mean word length 3-10,
    * symbol-to-word ratio, alphabetic-word fraction, stopword
    * presence). Every FLAG is exact integer arithmetic — `nonws
    * between 3n and 10n` instead of `nonws/n between 3 and 10` — so a
    * boundary document can't flip on a float ulp between engines; the
    * rounded ratios ride along for inspection only. Shape: one corpus
    * scan, zero shuffles (pure per-document projection). */
  def textGopher(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(spark, dir))

  def gopherRules(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks).cast("long")
    val nonws = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
    val nSym = size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
    val stops = countIn(toks, GopherStops).cast("long")
    val rWords = n.between(50L, 100000L)
    val rMean = nonws.between(n * 3L, n * 10L)
    val rSym = nSym * 10L <= n
    val rAlpha = nAlpha * 5L >= n * 4L
    val rStops = stops >= 2L
    d.select(
      col("doc_id"),
      n.as("n_words"),
      round(nonws.cast("double") / n, 4).as("mean_word_len"),
      round(nSym.cast("double") / n, 4).as("symbol_ratio"),
      round(nAlpha.cast("double") / n, 4).as("alpha_frac"),
      stops.as("stop_hits"),
      rWords.cast("int").as("r_words"),
      rMean.cast("int").as("r_mean_len"),
      rSym.cast("int").as("r_symbol"),
      rAlpha.cast("int").as("r_alpha"),
      rStops.cast("int").as("r_stops"),
      (rWords && rMean && rSym && rAlpha && rStops).cast("int").as("keep"))
  }

  /** Per-doc token n-grams of width n: exploded positions + (n-1) lead
    * windows; `concat` (NOT concat_ws) so a null tail lead nulls the
    * whole gram — the same rows a length-guard filter would keep. */
  private def docNgramCounts(d: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val leads = (1 until n).map(i => lead(col("t"), i).over(w))
    val parts = (col("t") +: leads).flatMap(c => Seq(c, lit(" "))).dropRight(1)
    d.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), concat(parts: _*).as("g"))
      .filter(col("g").isNotNull)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
  }

  /** G25: within-document repetition metrics (the Gopher repetition
    * rules at token granularity): the token fraction covered by the
    * single most frequent 3-gram (top3_frac ≤ 0.18 rule) and by ALL
    * duplicated 5-grams counting every occurrence (dup5_frac ≤ 0.15
    * rule). n_tokens is recovered exactly from the 3-gram occurrence
    * total (occ3 = n-2) — no second corpus scan. Flags are integer
    * cross-multiplications, fractions ride along rounded. Docs under 5
    * tokens have no 5-grams and drop (inner join; oracle mirrors).
    * Shape: two exploded-window aggregations + one per-doc join. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetition(Tables.documents(spark, dir))

  def repetition(d: DataFrame): DataFrame = {
    val a3 = docNgramCounts(d, 3).groupBy("doc_id")
      .agg(sum(col("c")).as("occ3"),
        coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L)).as("dup3"),
        max(col("c")).as("max3"))
    val a5 = docNgramCounts(d, 5).groupBy("doc_id")
      .agg(coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L)).as("dup5"))
    val n = (col("occ3") + 2L).as("n_tokens")
    a3.join(a5, Seq("doc_id"))
      .select(col("doc_id"), n, col("max3").as("top3_count"),
        round(col("max3") * 3.0 / (col("occ3") + 2L), 4).as("top3_frac"),
        round(col("dup5") * 5.0 / (col("occ3") + 2L), 4).as("dup5_frac"),
        (col("max3") * 300L <= (col("occ3") + 2L) * 18L).cast("int").as("r_top3"),
        (col("dup5") * 500L <= (col("occ3") + 2L) * 15L).cast("int").as("r_dup5"))
  }

  /** Head of the rank-frequency profile G27 reports. */
  val ZipfTopK = 50

  /** G27: corpus rank-frequency (Zipf) profile — the vocabulary
    * diagnostic tokenizer and corpus-mixture work starts from: the
    * top-[[ZipfTopK]] tokens with rank, frequency, corpus share,
    * cumulative head share, and the freq·rank product (near-constant
    * under Zipf's law — the eyeball test for natural vs synthetic
    * vocabularies). Shape: one token-count aggregation; the head is
    * taken with orderBy+limit (TakeOrdered reduce — no global sort
    * shuffle, the G7 discipline), so the rank/cum-share windows run
    * over ≤ topK rows; the corpus total rides as an in-plan broadcast
    * scalar. Shares are exact-integer sums under one division. */
  def textZipf(spark: SparkSession, dir: String): DataFrame =
    zipfProfile(Tables.documents(spark, dir), ZipfTopK)

  def zipfProfile(d: DataFrame, topK: Int): DataFrame = {
    val counts = d
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
    val total = broadcast(counts.agg(sum(col("freq")).as("total")))
    val head = counts.orderBy(col("freq").desc, col("t")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("t"))
    head.crossJoin(total)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_freq", sum(col("freq")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("rank"), col("t").as("token"), col("freq"),
        (col("freq") * col("rank")).as("fr_product"),
        round(col("freq").cast("double") / col("total"), 6).as("share"),
        round(col("cum_freq").cast("double") / col("total"), 6).as("cum_share"))
  }

  /** G28: encoding / mojibake audit — the byte-level QA pass a crawl
    * corpus runs before tokenization: decode the raw bytes as UTF-8
    * with the REPLACE policy (Java's String(bytes, UTF_8): each
    * malformed sequence becomes one U+FFFD) and profile the result —
    * replacement count (= broken sequences), non-ASCII char count,
    * and a clean flag. A doc with replacements was decoded with the
    * wrong charset somewhere upstream; a doc with a high non-ASCII
    * share in a declared-ASCII source is mislabeled. Zero shuffle —
    * pure codegen'd projections over the byte column.
    *
    * The driver query synthesizes the byte stream per asset the
    * mm-family way (the corpus itself is clean ASCII, so the audit on
    * raw `text` would be vacuously zero): an ASCII leg, a VALID
    * 2-byte UTF-8 leg (é — non-ASCII but clean), an INVALID
    * truncated-sequence leg (0xC3 '(' — a replacement + the
    * swallowed ASCII byte), plus a lone 0xFF every 7th asset. Every
    * count is then a doc_id formula the DuckDB oracle states without
    * needing a UTF-8 decoder of its own. */
  def textEncodingAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val base = substring(col("text"), 1, 40)
    val legHex = when(col("doc_id") % 3 === 1, lit("c3a9"))      // é
      .when(col("doc_id") % 3 === 2, lit("c328"))                // invalid
      .otherwise(lit(""))
    val tailHex = when(col("doc_id") % 7 === 0, lit("ff")).otherwise(lit(""))
    val bin = unhex(concat(lower(hex(base)), legHex, tailHex))
    // binary\u2192string reinterprets bytes unvalidated; Spark 4's
    // make_valid_utf8 then applies the Unicode maximal-subpart
    // REPLACE policy (one U+FFFD per malformed subsequence) and
    // is_valid_utf8 is the audit's clean signal on the RAW bytes
    val raw = bin.cast("string")
    val s = make_valid_utf8(raw)
    val nRepl = (length(s) - length(regexp_replace(s, "\ufffd", ""))).cast("int")
    val nNonAscii =
      (length(s) - length(regexp_replace(s, "[^\\x00-\\x7F]", ""))
        - nRepl).cast("int")
    d.select(col("doc_id"),
        length(s).as("n_chars_decoded"),
        nRepl.as("n_replacement"),
        nNonAscii.as("n_nonascii"),
        is_valid_utf8(raw).cast("int").as("valid_utf8"),
        (nRepl === 0 && nNonAscii === 0).cast("int").as("is_clean"))
  }

  /** G29: Gopher line/sentence-structure battery (Rae et al. A1.1,
    * the rules the doc-level battery in [[gopherRules]] cannot state):
    * share of lines starting with a bullet (drop if >90%), share of
    * lines ending with an ellipsis (drop if >30%), and a minimum
    * sentence count (lines ending in terminal punctuation, ≥3). The
    * corpus has no newlines or punctuation (re-probed every round),
    * so the structure is synthesized per doc the mm-family way —
    * 4..8 lines whose bullet/terminator marks follow a doc_id+line
    * formula — and the battery then genuinely PARSES the structured
    * text (split on newline, explode, per-line prefix/suffix tests,
    * one doc_id aggregation) while the oracle re-states only the
    * generation formula over unnest(range(...)). Flags are integer
    * cross-multiplications; the single shuffle is the per-doc count
    * aggregation. */
  def textGopherLines(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val body = substring(col("text"), 1, 20)
    val nLines = (lit(4) + col("doc_id") % 5).cast("int")
    // static 8-leg unroll keeps the builder a pure codegen concat
    def line(i: Int): Column = {
      val mark = when((col("doc_id") + i) % 3 === 0, lit("- ")).otherwise(lit(""))
      val term = when((col("doc_id") + i) % 4 === 0, lit("..."))
        .when((col("doc_id") + i) % 4 === 1, lit(".")).otherwise(lit(""))
      val sep = if (i == 0) lit("") else lit("\n")
      when(lit(i) < nLines, concat(sep, mark, body, term)).otherwise(lit(""))
    }
    val structured = concat((0 until 8).map(line): _*)
    val isBullet = startswith(col("line"), lit("- ")).cast("int")
    val isEllipsis = endswith(col("line"), lit("...")).cast("int")
    val isSentence =
      (endswith(col("line"), lit(".")) && !endswith(col("line"), lit("...")))
        .cast("int")
    d.select(col("doc_id"), explode(split(structured, "\n")).as("line"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(isBullet).as("n_bullet"),
        sum(isEllipsis).as("n_ellipsis"),
        sum(isSentence).as("n_sentences"))
      .select(col("doc_id"), col("n_lines"), col("n_bullet"),
        col("n_ellipsis"), col("n_sentences"),
        (col("n_bullet") * 10 <= col("n_lines") * 9).cast("int").as("r_bullet"),
        (col("n_ellipsis") * 10 <= col("n_lines") * 3).cast("int").as("r_ellipsis"),
        (col("n_sentences") >= 3).cast("int").as("r_sentences"),
        (col("n_bullet") * 10 <= col("n_lines") * 9 &&
          col("n_ellipsis") * 10 <= col("n_lines") * 3 &&
          col("n_sentences") >= 3).cast("int").as("keep"))
  }

  /** The C4 blocklist is a POLICY input (Raffel et al. ship a large
    * external list); the mechanics are what this battery implements,
    * with a sentinel token the fixture injects deterministically. */
  val C4Blocklist = Seq("graftbadword")

  /** G56: the C4 heuristic cleanup battery (Raffel et al. 2020 §2.2)
    * — the OTHER canonical published filter set next to G24's Gopher
    * rules, operating at LINE grain where Gopher's main battery is
    * document-grain: keep only lines that end in terminal punctuation
    * AND carry ≥ 5 words; drop whole pages containing "lorem ipsum"
    * (placeholder boilerplate), "{" (leaked code), any blocklist term
    * (policy), or fewer than 3 sentences. Fixture pages are rebuilt
    * deterministically from each doc (the G29/G52 convention: 4-8
    * lines; every 4th line short; terminal '.'/'!' by residue; lorem
    * on doc%7, a brace suffix on doc%5, a blocklist token on doc%11 —
    * each injected where it also KILLS that line's terminal flag, so
    * the flags interact the way real pages do). The Spark side runs
    * the REAL string machinery — build page, split lines, count
    * words, scan tokens — while the oracle recomputes every flag from
    * the generating arithmetic. One explode + one doc-keyed agg,
    * pure codegen expressions below it. */
  def textC4Filters(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    val long5 = concat_ws(" ", slice(toks, 1, 5))
    val short2 = concat_ws(" ", slice(toks, 1, 2))
    val nLines = (lit(4) + col("doc_id") % 5).cast("int")
    def line(i: Int): Column = {
      val body = when(col("doc_id") % 7 === 0 && lit(i) === 2,
        lit("lorem ipsum dolor sit amet"))
        .when((col("doc_id") + i) % 4 === 2, short2)
        .otherwise(long5)
      val term = when((col("doc_id") + i) % 3 === 0, lit("."))
        .when((col("doc_id") + i) % 3 === 1, lit("!"))
        .otherwise(lit(""))
      val blocked = when(col("doc_id") % 11 === 0 && lit(i) === 3,
        lit(" graftbadword")).otherwise(lit(""))
      val brace = when(col("doc_id") % 5 === 0 && lit(i) === 1, lit(" {"))
        .otherwise(lit(""))
      val sep = if (i == 0) lit("") else lit("\n")
      when(lit(i) < nLines, concat(sep, body, term, blocked, brace))
        .otherwise(lit(""))
    }
    val page = concat((0 until 8).map(line): _*)
    val words = size(split(col("line"), " "))
    val terminal = endswith(col("line"), lit(".")) ||
      endswith(col("line"), lit("!"))
    // page-level flags are computed ONCE per doc in the pre-explode
    // projection (r16 review: inside the agg they rescanned the full
    // page string per line row and shuffled the page per line)
    val agg = d.select(col("doc_id"), page.as("page"))
      .select(col("doc_id"),
        col("page").contains("lorem ipsum").cast("int").as("pl"),
        col("page").contains("{").cast("int").as("pb"),
        explode(split(col("page"), "\n")).as("line"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum((words >= 5 && terminal).cast("long")).as("n_kept"),
        sum(terminal.cast("long")).as("n_sentences"),
        max(col("pl")).as("has_lorem"),
        max(col("pb")).as("has_brace"),
        max((countIn(split(col("line"), " "), C4Blocklist) > 0)
          .cast("int")).as("has_blocked"))
    agg.select(col("doc_id"), col("n_lines"), col("n_kept"),
      col("n_sentences"), col("has_lorem"), col("has_brace"),
      col("has_blocked"),
      round(col("n_kept").cast("double") / col("n_lines"), 4).as("kept_ratio"),
      (col("has_lorem") === 0 && col("has_brace") === 0 &&
        col("has_blocked") === 0 && col("n_sentences") >= 3)
        .cast("int").as("keep"))
  }

  /** Target docs per source for mixture balancing (in expectation). */
  val MixtureCap = 120

  /** G18: source-balanced mixture sampling — the head-capping pass a
    * web-scale training mixture runs before temperature weighting:
    * every SOURCE is downsampled to ~cap docs in expectation via a
    * salted hash-range filter. The per-source keep threshold is EXACT
    * INTEGER arithmetic — least(2³², (2³²·cap) div n_s) — so
    * membership is deterministic, engine-portable, and stable as the
    * corpus grows (no RNG, no float thresholds that could flip on an
    * ulp). The bucket space is 32-bit: a 16-bit space floors the
    * threshold to 0 once a source exceeds 65536·cap docs (dropping it
    * entirely instead of capping it — exactly the web-crawl-sized
    * source the op exists for); 32 bits holds the ±1-bucket bias
    * negligible up to ~2³²·cap docs per source. Shape: one count
    * aggregation + a broadcast threshold join + a pure filter — the
    * corpus is scanned once and never shuffled. */
  /** G34: no source may claim more than this share of the allocated
    * token budget (spelled identically in the oracle). */
  val MixtureBudgetCapShare = 0.15

  /** G34: capped token-budget mixture allocation — the data-mixing
    * math a training run does BEFORE sampling: per-source corpus
    * token counts, a hard cap ("no single crawl may exceed 15% of
    * the budget"), the per-source sampling RATE that implements the
    * cap, and each source's share of the allocated budget. G18
    * samples documents to a target mixture; this is the planning
    * face that decides the mixture from corpus statistics. All
    * arithmetic is exact integers until the two final divisions
    * (identical doubles in both engines), so round(4) is pure
    * formatting. One keyed aggregation + two broadcast scalars —
    * aggregate-scale throughout. */
  def textMixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val perSource = d.select(col("source"), size(tokens(col("text"))).as("n"))
      .groupBy("source").agg(sum(col("n")).as("tokens"))
    val total = broadcast(perSource.agg(sum(col("tokens")).as("total_tokens")))
    val alloc = perSource.crossJoin(total)
      .withColumn("cap_tokens",
        floor(col("total_tokens") * lit(MixtureBudgetCapShare)).cast("long"))
      .withColumn("alloc_tokens", least(col("tokens"), col("cap_tokens")))
    val totalAlloc = broadcast(alloc.agg(sum(col("alloc_tokens")).as("total_alloc")))
    alloc.crossJoin(totalAlloc)
      .select(col("source"), col("tokens"), col("cap_tokens"),
        col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") / col("tokens"), 4).as("sample_rate"),
        round(col("alloc_tokens").cast("double") / col("total_alloc"), 4).as("mixture_share"))
  }

  def textMixture(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val space = 4294967296L // 2^32
    val thr = d.groupBy("source").agg(count(lit(1)).as("n_s"))
      .select(col("source"), col("n_s"),
        least(lit(space), expr(s"${space * MixtureCap} div n_s")).as("thr"))
    val bucket = conv(substring(md5(concat_ws("|", lit("mix"), col("source"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    d.select(col("doc_id"), col("source"), bucket.as("bucket"))
      .join(broadcast(thr), Seq("source"))
      .filter(col("bucket") < col("thr"))
      .select("source", "doc_id", "bucket", "n_s", "thr")
  }

  val ContamN = 5 // shingle width for contamination detection

  /** G13: benchmark-contamination check — for every TEST-split document
    * (G5 split), the fraction of its distinct 5-gram shingles that
    * appear anywhere in the TRAIN split. The scan shape is the same
    * exploded-window shingling as G4; the only corpus-scale structure
    * is one shuffle join keyed on the shingle hash (at 100 TB the
    * train side would first collapse through a bloom/HLL prefilter,
    * but the join-on-hash IS the exact-answer shape). Docs with fewer
    * than 5 tokens have no shingles and produce no row. */
  def textContamination(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val bucket = splitBucket(col("doc_id"))
    val split = when(bucket < TrainBucketMax, "train").when(bucket < ValBucketMax, "val")
      .otherwise("test")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val leads = (1 until ContamN).map(i => lead(col("t"), i).over(w))
    val sh = d.select(col("doc_id"), split.as("split"),
        posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), col("split"),
        when(leads.last.isNotNull,
          md5(concat_ws(" ", (col("t") +: leads): _*))).as("sh"))
      .filter(col("sh").isNotNull)
      .distinct()
    val train = sh.filter(col("split") === "train")
      .select(col("sh")).distinct().withColumn("hit", lit(1))
    sh.filter(col("split") === "test").select("doc_id", "sh")
      .join(train, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
      .withColumn("ratio",
        round(col("n_hit").cast("double") / col("n_shingles"), 4))
  }

  // K5 quantile-sketch parameters: char-length histogram over [0, 1024)
  // in 64 bins (w = 16 chars — the quantile error bound), estimated at
  // the standard corpus percentiles.
  val QLo = 0.0
  val QHi = 1024.0
  val QBins = 64
  val Qs = Seq(0.5, 0.9, 0.99)
  private val QW = (QHi - QLo) / QBins

  /** K5 driver query: per-language length quantiles from the mergeable
    * histogram sketch (graft_qhist, QuantileHistAgg). ONE map-side-
    * combined aggregation scans the corpus and carries bins×8 bytes per
    * (partition, language); everything after the sketch — cumulative
    * counts, crossing-bin search, interpolation — is relational algebra
    * over ≤ bins rows per language, exactly mirrored by the DuckDB
    * oracle (deterministic by construction: the sketch is a pure
    * function of the value multiset, unlike sampling sketches). */
  def textQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
    val hist = d.groupBy(col("lang"))
      .agg(graft.functions.VectorFunctions
        .qhist(spark, length(col("text")), QLo, QHi, QBins).as("hist"))
    val bins = hist.select(col("lang"),
        posexplode(col("hist")).as(Seq("bin", "cnt")))
      .filter(col("cnt") > 0)
    val n = bins.groupBy("lang").agg(sum(col("cnt")).as("n"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("bin")
    val cum = bins.withColumn("cum", sum(col("cnt")).over(cumW))
    val qs = Qs.toDF("q")
    val t = col("q") * col("n") // target rank, double — same math as oracle
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "q").orderBy("bin")
    cum.join(n, "lang").crossJoin(broadcast(qs))
      .filter(col("cum") >= t)
      .withColumn("r", row_number().over(rankW))
      .filter(col("r") === 1)
      .select(col("lang"), col("q"),
        round(lit(QLo) + lit(QW) *
          (col("bin") + (t - (col("cum") - col("cnt"))) / col("cnt")), 6).as("est"),
        col("n"))
  }

  /** G22 winnowing parameters: token-3-gram hashes, guarantee window
    * of 4 consecutive grams. */
  val WinnowGram = 3
  val WinnowWindow = 4

  /** G22: winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm) + the cross-doc overlap signal. Each window of
    * `WinnowWindow` consecutive 3-gram hashes keeps its MINIMUM hash
    * (min-value, leftmost-position — deterministic in every engine),
    * so any shared token run of length ≥ gram+window−1 is GUARANTEED
    * to share a fingerprint — the density/recall contract plain
    * min-hashing (G4) doesn't give. Per doc: fingerprint count, how
    * many also occur in ANOTHER doc, and the shared ratio (the
    * plagiarism / near-dup triage score).
    *
    * One scan → lead-window grams (the G4 shape) → one rolling-min
    * window over the SAME (doc_id, pos) partitioning (no extra
    * exchange) → distinct + two keyed aggregations. Docs shorter than
    * one full window winnow to their global min gram; docs with < 3
    * tokens fall back to md5(text). */
  /** G51: repeated-span gram size (Rae et al. trim 8-grams). */
  val SpanGram = 8

  /** G51: within-doc repeated-span coverage — the measurement half of
    * Gopher/MassiveText's repetition REMOVAL rule (drop or trim docs
    * whose duplicate 8-gram spans cover too much text): every token
    * position covered by an 8-gram whose identical gram appeared
    * EARLIER in the same document counts as removable, and the
    * distinct-position union (not a per-gram sum — overlapping
    * repeats must not double-count) over token count is the trim
    * ratio. G25 measures gram-level duplication; this is the
    * span-coverage spelling the removal rule actually thresholds.
    * One window per doc for grams + one per (doc, gram) for first
    * positions + a bounded ×8 position explode — all partitioned by
    * doc, no global stage. */
  def textSpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "t")))
    val gram = concat_ws(" ",
      col("t") +: (1 until SpanGram).map(i => lead(col("t"), i).over(w)): _*)
    val grams = toks.select(col("doc_id"), col("pos"),
        when(lead(col("t"), SpanGram - 1).over(w).isNotNull, md5(gram)).as("h"))
      .filter(col("h").isNotNull)
    val rep = grams
      .withColumn("fp", min(col("pos")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id", "h")))
      .filter(col("pos") > col("fp"))
    val covered = rep.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanGram - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
    d.select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        round(coalesce(col("n_covered"), lit(0L)).cast("double")
          / col("n_tokens"), 4).as("dup_span_ratio"))
  }

  def textWinnow(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val l1 = lead(col("t"), 1).over(w)
    val l2 = lead(col("t"), 2).over(w)
    val grams = d.select(col("doc_id"), md5(col("text")).as("md5_full"),
        posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), col("md5_full"), col("pos"),
        when(l2.isNotNull, md5(concat_ws(" ", col("t"), l1, l2))).as("gh"))
      .filter(col("gh").isNotNull)
    val roll = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        WinnowWindow - 1)
    val cnt = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val fps = grams
      .withColumn("fp", min(col("gh")).over(roll))
      .withColumn("ng", count(lit(1)).over(cnt))
      // valid window starts; a doc with fewer grams than the window
      // keeps only position 0 (frame truncates at partition end)
      .filter(col("pos") <= greatest(col("ng") - WinnowWindow, lit(0)))
      .select(col("doc_id"), col("fp")).distinct()
      .unionAll(d.select(col("doc_id"), md5(col("text")).as("fp"))
        .join(grams.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
    val dfp = fps.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
    fps.join(dfp, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"),
        count(when(col("nd") > 1, 1)).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared").cast("double") / col("n_fp"), 4))
  }

  /** G21 boilerplate document-frequency threshold, in tenths: a token
    * is boilerplate within its source when it appears in ≥ 8/10 of the
    * source's docs. Integer-ratio comparison (df·10 ≥ n_docs·8) keeps
    * membership exact in every engine. */
  val BoilerDfTenths = 8

  /** G21: per-source boilerplate detection — tokens appearing in
    * nearly every document of a source are template/boilerplate
    * vocabulary (nav text, headers, license banners in a real crawl),
    * and a document's boilerplate SHARE is the cleaning signal (high
    * share → little unique content). One distinct (source, token,
    * doc) pass → per-source doc-frequency; the boilerplate vocab is
    * bounded by vocabulary size per source, so the share join
    * BROADCASTS it — the corpus is scanned twice and shuffled never
    * (token rows aggregate map-side per doc). */
  def textBoilerplate(spark: SparkSession, dir: String): DataFrame =
    boilerplate(Tables.documents(spark, dir))

  def boilerplate(d: DataFrame): DataFrame = {
    val tok = d.select(col("doc_id"), col("source"),
      explode(tokens(col("text"))).as("tok"))
    val dfreq = tok.distinct()
      .groupBy("source", "tok").agg(count(lit(1)).as("df"))
    val nd = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val boiler = dfreq.join(nd, "source")
      .filter(col("df") * 10 >= col("n_docs") * BoilerDfTenths)
      .select(col("source"), col("tok"), lit(1).as("_b"))
    tok.join(broadcast(boiler), Seq("source", "tok"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("_b")).as("n_boiler_tokens"))
      .withColumn("boiler_share",
        round(col("n_boiler_tokens").cast("double") / col("n_tokens"), 4))
  }

  /** G23 segment geometry: a "line" is a non-overlapping run of 5
    * tokens (the corpus has no newlines; fixed token segments are the
    * deterministic stand-in for layout lines), and a segment is
    * boilerplate when it recurs verbatim in ≥ 2 distinct docs of the
    * SAME source — the within-source templated-passage cut (nav rows,
    * footers, licence lines in a real crawl). */
  val LineSegTokens = 5
  val LineMinDocs = 2

  /** G23: boilerplate LINE removal — the training-data cleaning step
    * between G14 (detect shared chunks) and E1 (drop whole duplicate
    * docs): drop only the recurring segments and keep the rest of the
    * document. One explode (linear in corpus tokens), one map-side-
    * combined count shuffle on (source, segment hash), then the
    * boilerplate set — bounded by the templated-segment vocabulary of
    * each source, not the corpus — broadcasts back onto the segment
    * stream and one doc_id regroup reassembles the cleaned text in
    * segment order. Emits the cleaned doc's md5/length plus removal
    * counts so downstream stages can audit what was cut. */
  def textLineDedup(spark: SparkSession, dir: String): DataFrame =
    lineDedup(Tables.documents(spark, dir))

  def lineDedup(d: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val starts = when(size(t) > 0, sequence(lit(0), size(t) - 1, lit(LineSegTokens)))
      .otherwise(array())
    // materialized once: BOTH the frequency pass and the reassembly
    // regroup read the exploded segment frame — unbuffered, the
    // tokenize+slice+md5 subtree would run twice
    val segs = d.select(col("doc_id"), col("source"), t.as("t"),
        explode(starts).as("s"))
      .select(col("doc_id"), col("source"),
        (col("s") / LineSegTokens).cast("int").as("seg_id"),
        array_join(slice(col("t"), col("s") + 1, lit(LineSegTokens)), " ").as("seg"))
      .withColumn("h", md5(col("seg")))
      .localCheckpoint(eager = true)
    val boiler = segs.groupBy("source", "h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= LineMinDocs)
      .select(col("source"), col("h"), lit(1).as("_b"))
    segs.join(broadcast(boiler), Seq("source", "h"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_segs"),
        count(col("_b")).as("n_removed"),
        // kept segments reassemble in seg_id order; collect_list drops
        // the nulled (removed) entries and array_sort orders by the
        // struct's leading seg_id field
        array_join(transform(
          array_sort(collect_list(when(col("_b").isNull,
            struct(col("seg_id"), col("seg"))))),
          x => x.getField("seg")), " ").as("cleaned"))
      .select(col("doc_id"), col("source"), col("n_segs"), col("n_removed"),
        md5(col("cleaned")).as("cleaned_md5"),
        length(col("cleaned")).as("cleaned_len"))
  }

  val WsampleK = 5

  /** G30: weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield-Lund-Thorup): each doc gets priority q = w / u where
    * w = n_chars and u ∈ (0, 1] derives from a salted 32-bit hash of
    * the doc id; the top-k priorities per source ARE a weighted
    * sample (long docs proportionally likelier, every doc possible).
    * The cross-engine trick: q = w·2^32 / (h+1) uses only IEEE
    * multiply/divide — correctly rounded, so Spark and the oracle
    * compute bit-identical doubles and the ranking can't drift the
    * way a pow(u, 1/w) / exp-jitter spelling can (transcendental
    * functions differ across libm implementations). Shapes: one
    * narrow scan + one per-source window — no global sort; at 100 TB
    * the window shuffles one (source)-keyed pass and each partition
    * streams. A deterministic, seedable corpus downsampler. */
  def textWsample(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(concat_ws("|", lit("wsample"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
    val q = col("n_chars").cast("double") * lit(4294967296.0) /
      (h + lit(1L)).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"), q.as("q"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= WsampleK)
  }

  /** G35: readability battery — Flesch reading ease and
    * Flesch-Kincaid grade per document, the classic complexity
    * signals a pretraining mixer uses next to the G2 quality score
    * (too-hard and too-easy tails both get downweighted). Words are
    * \\S+ runs, sentences are [.!?]+ runs (floor 1 so a fragment
    * without terminal punctuation still scores), syllables are the
    * standard vowel-group approximation ([aeiouy]+ runs, lowercased).
    * All three counts are exact integers from regexp_count — the
    * Flesch formulas are the only float step, fixed expressions over
    * integer ratios, rounded 3dp. Per-doc projection: no shuffle,
    * embarrassingly parallel at any corpus size. */
  /** G48: temperature-scaled source sampling weights — the
    * multilingual/multi-source mixing rule every pretraining run
    * tunes (p_i^α / Σ p_j^α, here α = 1/2): low-resource sources
    * upsample (w_alpha > p_raw), dominant ones downsample. Exact
    * integer counts; the α-power is ONE IEEE sqrt per source, and
    * the normalizer sums those sqrts in SOURCE-NAME ORDER on both
    * engines (Spark: aggregate over a sorted struct array; DuckDB:
    * list_sum over an ORDER BY list — the F9/cosSql fixed-order
    * float-sum discipline), so the division is bit-identical. */
  def textMixWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val z = d.agg(
      expr("aggregate(transform(array_sort(collect_list(struct(source, n_docs))), " +
        "x -> sqrt(cast(x.n_docs as double))), cast(0 as double), (a, x) -> a + x)")
        .as("z"),
      sum("n_docs").as("n_total"))
    d.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_total"), 5).as("p_raw"),
        round(sqrt(col("n_docs").cast("double")) / col("z"), 5).as("w_alpha"))
  }

  /** G47: min corpus count for a token to enter the JSD vocabulary
    * (rare tokens add noise without signal). */
  val JsdMinDf = 20L

  /** G47: pairwise Jensen-Shannon divergence between source unigram
    * distributions — "which sources are distributionally the same
    * feed" (near-zero JSD between two sources usually means one
    * scraped the other; high JSD flags a mixture-balance problem
    * G18 should know about). Distributions over the shared
    * min-df vocabulary with Laplace smoothing so every term is in
    * both supports; JSD = ½KL(p‖m)+½KL(q‖m) summed term-wise (the
    * text_entropy log-sum + round-4 precedent), one row per ordered
    * source pair a<b. Vocabulary-scale joins only — token text never
    * rides past the first aggregation. */
  def textSourceJsd(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n_all"))
      .filter(col("n_all") >= JsdMinDf).select("tok")
    val ts = tok.join(vocab, "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val tot = ts.groupBy("source").agg(sum("n").as("t_s"))
    // dense (source × vocab) grid so absent terms carry the smoothed
    // floor in BOTH distributions
    val grid = tot.crossJoin(vocab)
    val dense = grid.join(ts, Seq("source", "tok"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("source"), col("tok"),
        ((coalesce(col("n"), lit(0L)) + 1).cast("double")
          / (col("t_s") + col("v"))).as("p"))
    val a = dense.select(col("source").as("source_a"), col("tok"),
      col("p").as("pa"))
    val b = dense.select(col("source").as("source_b"), col("tok"),
      col("p").as("pb"))
    a.join(b, "tok").filter(col("source_a") < col("source_b"))
      .withColumn("_m", (col("pa") + col("pb")) / 2)
      .withColumn("_t",
        col("pa") * log(col("pa") / col("_m")) / 2
          + col("pb") * log(col("pb") / col("_m")) / 2)
      .groupBy("source_a", "source_b")
      .agg(round(sum(col("_t")), 4).as("jsd"))
  }

  /** G49: bucket count for hashed DSIR n-gram features — small enough
    * that the bucket model is a broadcast-scale frame everywhere, large
    * enough that hash collisions stay a smoothing, not a signal. */
  val DsirBuckets = 512
  /** G49: the target-distribution slice (DSIR scores raw docs by how
    * target-like their hashed n-gram profile is). */
  val DsirTargetLang = "en"

  /** G49: DSIR importance-resampling weights — hashed-n-gram importance
    * scoring per Xie et al. 2023 ("Data Selection for Language Models
    * via Importance Resampling"): fit bag-of-hashed-ngram models over a
    * TARGET slice (here the `en` documents, standing in for the curated
    * target corpus) and the RAW corpus, then weight every document by
    * log p_target(doc) − log p_raw(doc) under those models. The weight
    * is the resampling key for target-aware data selection — the
    * principled upgrade to G2's handcrafted quality score.
    *
    * Reference behavior anchor: the reference pipeline ingests its
    * corpus unfiltered (Big-Data---Knowledge-graph-construction-with-LLM
    * `LOCAL/data_ingestion_batch.py` concatenates every CSV row); at
    * 100 TB a target-distribution filter is the first thing a training
    * pipeline adds, and DSIR is the published, hash-bounded way to do it.
    *
    * Scale shape: features are unigrams + bigrams hashed into
    * [[DsirBuckets]] buckets, so BOTH models collapse to ≤512-row
    * frames regardless of corpus size — the model join is a broadcast
    * by construction and token text never rides past the first
    * aggregation. Two token-scale shuffles (the bigram window by doc,
    * the (doc, bucket) count), both map-side-combinable. The per-doc
    * log-ratio sum is a float fold, so it runs in FIXED bucket order on
    * both engines (the text_mix_weights sorted-struct-array idiom);
    * counts and totals stay exact integers until the two ln() calls. */
  def textDsir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val ex = docs.select(col("doc_id"), col("lang"),
      posexplode(tokens(col("text"))).as(Seq("pos", "t")))
    val uni = ex.select(col("doc_id"), col("lang"), col("t").as("f"))
    val bi = ex
      .select(col("doc_id"), col("lang"), col("t"),
        lead(col("t"), 1).over(w).as("next"))
      .filter(col("next").isNotNull)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", col("t"), col("next")).as("f"))
    val fb = uni.union(bi).select(col("doc_id"), col("lang"),
      pmod(conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long"),
        lit(DsirBuckets.toLong)).as("b"))
    val docB = fb.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    // one pass builds BOTH models: raw count + target count per bucket
    val model = fb.groupBy("b").agg(count(lit(1)).as("n_r"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("n_t"))
    val tot = model.agg(sum("n_r").as("nr"), sum("n_t").as("nt"))
    val lr = model.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("n_t") + 1).cast("double") / (col("nt") + DsirBuckets))
          - log((col("n_r") + 1).cast("double")
            / (col("nr") + DsirBuckets))).as("lr_b"))
    docB.join(broadcast(lr), "b")
      .select(col("doc_id"), col("b"), col("c"),
        (col("c") * col("lr_b")).as("term"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_feats"),
        round(expr("aggregate(transform(array_sort(" +
          "collect_list(struct(b, term))), x -> x.term), " +
          "cast(0 as double), (a, x) -> a + x)"), 4).as("w"))
      .orderBy("doc_id")
  }

  /** G45: distinctive terms kept per source, and the min corpus df. */
  val SourceTermsK = 5
  val SourceTermsMinDf = 20L

  /** G45: per-source distinctive terms by LIFT — "what makes this
    * source different": lift(t, s) = share of t in s over its corpus
    * share, top-[[SourceTermsK]] per source among tokens with corpus
    * count ≥ [[SourceTermsMinDf]] (rare tokens produce unstable
    * lifts). The at-a-glance slice characterization a mixer reads
    * next to G6's corpus stats. Exact integer counts; the lift is a
    * ratio of two integer ratios spelled as ONE cross-multiplied
    * division (n_ts·T)/(n_t·T_s) — no intermediate float; rank
    * window partitioned by source. */
  def textSourceTerms(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val ts = tok.groupBy("source", "tok").agg(count(lit(1)).as("n_ts"))
    val t = tok.groupBy("tok").agg(count(lit(1)).as("n_t"))
      .filter(col("n_t") >= SourceTermsMinDf)
    val srcTot = tok.groupBy("source").agg(count(lit(1)).as("t_s"))
    val tot = tok.agg(count(lit(1)).as("t_all"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("lift").desc, col("tok"))
    ts.join(t, "tok").join(srcTot, "source").crossJoin(broadcast(tot))
      .withColumn("lift",
        round((col("n_ts") * col("t_all")).cast("double")
          / (col("n_t") * col("t_s")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= SourceTermsK)
      .select(col("source"), col("rnk"), col("tok"), col("n_ts"),
        col("n_t"), col("lift"))
  }

  /** G39: in-vocabulary size for the OOV-rate signal. */
  val OovVocabK = 1000

  /** G39: out-of-vocabulary rate per document against the corpus'
    * own top-[[OovVocabK]] token vocabulary — the tokenizer-fit /
    * domain-shift signal a data mixer reads before adding a new
    * source (high OOV against the core vocabulary = the slice will
    * fragment into byte-level tokens). Vocabulary = top-K tokens by
    * (count desc, token asc) — deterministic tie-break; ranked by
    * the distributed rankedDesc-style aggregation (a TakeOrdered
    * global top-K, bounded K rows) and broadcast back into the
    * per-doc membership join. */
  def textOov(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tok = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = broadcast(tok.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(OovVocabK)
      .select(col("tok"), lit(1).as("in_vocab")))
    tok.join(vocab, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"))
  }

  /** G37: hapax / vocabulary-growth profile per (source, lang) slice
    * — Heaps-law diagnostics for corpus curation: vocabulary size,
    * hapax legomena share (types seen once — the classic "is this
    * slice creative text or boilerplate" dial: templated slices have
    * almost no hapaxes, natural text ~40-60%), and dis legomena. One
    * (slice, token) aggregation then a slice roll-up; token text
    * never leaves the first shuffle (counts only). */
  def textHapax(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tok = d.select(col("source"), col("lang"),
      explode(tokens(col("text"))).as("tok"))
    val tf = tok.groupBy("source", "lang", "tok").agg(count(lit(1)).as("n"))
    tf.groupBy("source", "lang").agg(
      count(lit(1)).as("vocab"),
      sum("n").as("n_tokens"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"),
      sum(when(col("n") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col("source"), col("lang"), col("vocab"), col("n_tokens"),
        col("hapax"), col("dis"),
        round(col("hapax").cast("double") / col("vocab"), 4).as("hapax_share"),
        round(col("vocab").cast("double") / col("n_tokens"), 4)
          .as("type_token_ratio"))
  }

  /** Positivity bias for the readability scores' integer half-up
    * rounding (score range guaranteed within ±10⁶, far past any real
    * Flesch value) — a positive dividend makes truncating (Spark div,
    * DuckDB //) and flooring division identical. */
  val ReadabilityBias = 1000000000L

  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = regexp_count(col("text"), lit("\\S+"))
    val s = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    val y = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    d.select(col("doc_id"),
      w.as("n_words"), s.as("n_sentences"), y.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("words_per_sentence",
        round(col("n_words").cast("double") / col("n_sentences"), 4))
      .withColumn("syllables_per_word",
        round(col("n_syllables").cast("double") / col("n_words"), 4))
      // exact-integer scores end to end: a float spelling of the
      // Flesch formulas lands last-ulp-different between engines
      // exactly at round()'s .0005 boundary (doc 42: 32.5725 rounds
      // up via Spark's decimal HALF_UP, down via DuckDB's binary
      // nearest-double). So the half-up rounding to milli-units is
      // spelled in INTEGER arithmetic — (2n + d + 2d·bias) div 2d −
      // bias, bias keeping the dividend positive so truncating and
      // flooring division agree — and the only float op left is one
      // division by the constant 1000.0, bit-identical everywhere.
      // numerators pre-scaled so n/d IS the score in milli-units
      .withColumn("_fln",
        lit(206835L) * col("n_sentences") * col("n_words")
          - lit(1015L) * col("n_words") * col("n_words")
          - lit(84600L) * col("n_syllables") * col("n_sentences"))
      .withColumn("_fkn",
        lit(390L) * col("n_words") * col("n_words")
          + lit(11800L) * col("n_syllables") * col("n_sentences")
          - lit(15590L) * col("n_sentences") * col("n_words"))
      .withColumn("_d", col("n_sentences").cast("long") * col("n_words"))
      .withColumn("flesch", expr(
        s"((2 * _fln + _d + 2 * _d * ${ReadabilityBias}L) div (2 * _d) - ${ReadabilityBias}L)")
        .cast("double") / 1000.0)
      .withColumn("fk_grade", expr(
        s"((2 * _fkn + _d + 2 * _d * ${ReadabilityBias}L) div (2 * _d) - ${ReadabilityBias}L)")
        .cast("double") / 1000.0)
      .drop("_fln", "_fkn", "_d")
  }

  /** G52: HTML → text extraction — the step between a crawl's HTTP
    * payload and every text operator in this family (the WET
    * extraction trafilatura/jusText perform, reduced to its
    * load-bearing core): script/style BLOCKS drop with their content
    * (they are code, and a tag-stripper that runs first leaks their
    * strings into the corpus — the classic trap, exercised by the
    * fixture's `"<p>not text</p>"` JS literal), comments drop, tags
    * become whitespace, the five load-bearing entities decode with
    * `&amp;` LAST (so `&amp;lt;` round-trips to the literal `&lt;` the
    * author wrote), and whitespace collapses. Pure per-row regex
    * chain — codegen'd, zero shuffle at any scale. RE2-compatible
    * patterns (no backreferences), so the oracle runs the identical
    * chain. */
  def htmlToText(c: Column): Column = {
    val noBlock = regexp_replace(c,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noBlock, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val e1 = regexp_replace(noTags, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&nbsp;", " ")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** G52 driver query: synthesize a full HTML page per document (title
    * + style + script-with-markup-in-a-string + h1 + entity-escaped
    * body + comment), extract it back, and prove the round trip:
    * `roundtrip_ok` is 1 exactly when extraction recovers title, h1,
    * and the UNESCAPED body with collapsed whitespace — any ordering
    * bug in the strip chain (tags before scripts, `&amp;` decoded
    * early) flips it to 0 corpus-wide. The oracle rebuilds the page
    * and runs the same chain in DuckDB. */
  def textHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val html = concat(
      lit("<html><head><title>doc "), col("doc_id"), lit("</title>"),
      lit("<style>p{margin:0}</style>"),
      lit("<script>var x = \"<p>not text</p>\";</script></head>"),
      lit("<body><h1>doc "), col("doc_id"), lit("</h1><p>"),
      esc, lit("</p><!-- hidden & ignored --></body></html>"))
    val extracted = htmlToText(html)
    val expected = concat(lit("doc "), col("doc_id"), lit(" doc "),
      col("doc_id"), lit(" "),
      trim(regexp_replace(col("text"), "\\s+", " ")))
    d.select(col("doc_id"),
      length(html).as("n_chars_html"),
      length(extracted).as("n_chars_text"),
      md5(extracted).as("text_md5"),
      (extracted === expected).cast("int").as("roundtrip_ok"))
  }

  /** G53: Luhn-checksum PII audit — the verification rung above G9's
    * pattern redaction: a 16-digit run is only a CARD NUMBER risk when
    * its Luhn checksum holds (ISO/IEC 7812), so the audit extracts
    * digit-run candidates and validates each with the exact integer
    * checksum (double every second digit from the right, fold >9 to
    * digit sum, total ≡ 0 mod 10) instead of flagging every long
    * number. Fixture: each document carries one injected candidate
    * whose 15 payload digits are md5-derived — even doc_ids get the
    * CORRECT check digit, odd doc_ids a corrupted one — so validity
    * is half/half by construction and the oracle regenerates both
    * sides from the same formula. The validation runs on the digits
    * PARSED BACK out of the text (position-wise substring, a static
    * 16-term integer sum — pure codegen, zero shuffle). */
  def textLuhn(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    def luhnTerm(dd: Column, i: Int): Column =
      if (i % 2 == 1) when(dd * 2 > 9, dd * 2 - 9).otherwise(dd * 2) else dd
    // r15 hoist (the B22 Generate-barrier discipline): the fixture
    // digest computes ONCE per row in a projection the Generate below
    // shields from CollapseProject — the spelled-out form re-evaluated
    // md5 inside all 30 digit-slice references
    val hoisted = d.select(col("doc_id"), col("text"),
      md5(concat(lit("luhn|"), col("doc_id"))).as("_h"))
    val d15 = (0 until 15).map(i =>
      conv(substring(col("_h"), i + 1, 1), 16, 10).cast("int") % 10)
    val sum15 = d15.zipWithIndex.map { case (dd, idx) =>
      luhnTerm(dd, idx + 1) }.reduce(_ + _)
    val check = (lit(10) - sum15 % 10) % 10
    val last = when(col("doc_id") % 2 === 0, check)
      .otherwise((check + lit(1)) % 10)
    val cand16 = concat((d15.map(_.cast("string")) :+ last.cast("string")): _*)
    val text2 = concat(col("text"), lit(" card "), cand16)
    // the operator: parse the candidate back out and validate it. The
    // full-text regex scan is the dominant per-row cost, and the 16
    // checksum terms each referenced it — 17 scans per document.
    // explode(array(x)) is a 1:1 Generate: a projection barrier that
    // forces the scan to run ONCE and hands the 16-char result to the
    // checksum as a plain attribute. Values bit-identical, oracle
    // untouched (sf0.1: 2.83 → see bench).
    val parsed = hoisted.select(col("doc_id"),
      explode(array(regexp_extract(text2, "([0-9]{16})", 1))).as("candidate"))
    val total = (1 to 16).map(i =>
      luhnTerm(substring(col("candidate"), i, 1).cast("int"), i)).reduce(_ + _)
    parsed.select(col("doc_id"), col("candidate"),
      (total % 10 === 0).cast("int").as("luhn_valid"))
  }

  /** G57: tokenizer FERTILITY audit — pieces per word and bytes per
    * piece, PER LANGUAGE, under the (memoized) G55 byte-level BPE
    * model. Fertility (tokens emitted per word) is the number a
    * production tokenizer choice is judged on: it is the sequence-
    * length — and therefore compute — multiplier of every downstream
    * training run, and it degrades per-language first (a Latin-tuned
    * vocab inflates CJK). Shape: the merge fold runs once on the
    * DISTINCT word table (vocab-scale, cached rules); the corpus pass
    * is one explode + one map-side-combined agg; the dictionary join
    * broadcasts. Ratios are exact-integer sums divided once, round-4
    * (the repo float convention). */
  def textBpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = Bpe.cachedMergesBytes(docs, "text", 8,
      graft.store.GraftStore.dirKey(dir))
    val dict = Bpe.wordPiecesFrom(Bpe.pretokenizeBytes(docs, "text"), merges)
      .select(col("w"), size(col("pieces")).cast("long").as("n_p"),
        length(encode(col("w"), "UTF-8")).cast("long").as("n_b"))
    val words = docs
      .select(col("lang"), explode(split(trim(col("text")), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
    words.join(dict, "w")
      .groupBy("lang")
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_p")).as("n_pieces"),
        sum(col("n") * col("n_b")).as("n_bytes"))
      .select(col("lang"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 4)
          .as("fertility"),
        round(col("n_bytes").cast("double") / col("n_pieces"), 4)
          .as("bytes_per_piece"))
  }

  /** Build the K24 inverted-index tables and the G31 merge rules
    * outside query timings (text_bpe itself still times the TRAIN op
    * honestly — only the encode face reads the cache). */
  def warmStores(spark: SparkSession, dir: String): Unit = {
    textBm25Indexed(spark, dir)
    Bpe.cachedMerges(Tables.documents(spark, dir), "text", 8,
      graft.store.GraftStore.dirKey(dir))
    // G57 reads the BYTE-level rules from cache; text_bpe_bytes still
    // times the byte TRAIN op honestly (it calls the learner directly)
    Bpe.cachedMergesBytes(Tables.documents(spark, dir), "text", 8,
      graft.store.GraftStore.dirKey(dir))
    // the unigram model rides the same discipline: encode/tokens faces
    // read the cache, only text_unigram/text_unigram_prune time the
    // TRAIN op itself
    Unigram.cachedWeights(Tables.documents(spark, dir), "text",
      graft.store.GraftStore.dirKey(dir))
    ()
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "text_line_dedup"   -> (textLineDedup _),
    "text_boilerplate"  -> (textBoilerplate _),
    "text_winnow"       -> (textWinnow _),
    "text_span_dedup"   -> (textSpanDedup _),
    "text_tfidf"        -> (textTfidf _),
    "text_bm25"         -> (textBm25 _),
    "text_bm25_indexed" -> (textBm25Indexed _),
    "text_wsample"      -> (textWsample _),
    // G31: BPE merge learning — the greedy merge dependency is
    // iterative, so the oracle (r15 verdict #6) is GENERATED per-round
    // MATERIALIZED CTEs (the MIS/coloring idiom): round r's argmax is
    // a 1-row CTE the round-r merge CTEs reference as scalar
    // subqueries; semantics additionally pinned by BpeSpec's
    // reference-implementation parity
    "text_bpe"          -> ((s: SparkSession, dir: String) =>
      Bpe.learnMerges(Tables.documents(s, dir), "text", 8)),
    // G32: encode face — same generated-CTE oracle route (the train
    // corpus IS the encode corpus, so the encoded vocabulary is the
    // final round's word table); rules memoized per corpus (encode
    // must not re-train)
    "text_bpe_encode"   -> ((s: SparkSession, dir: String) =>
      Bpe.topPieces(Tables.documents(s, dir), "text", 8, 30,
        cacheKey = graft.store.GraftStore.dirKey(dir))),
    // G58: the sample-first discipline oracled — rules learned on a
    // 1/3 md5 hash-range doc sample, encode applied corpus-wide (the
    // production contract for the k sequential train rounds)
    "text_bpe_sampled"  -> ((s: SparkSession, dir: String) =>
      Bpe.topPiecesSampled(Tables.documents(s, dir), "text", 8, 30,
        bpeSamplePred)),
    // G33: unigram-LM (SentencePiece) training — Viterbi-EM in
    // fixed-point integer log space; the oracle enumerates every
    // segmentation per word (recursive CTE) and picks by the same
    // (score, reversed-lengths) order the DP's tie-break realizes
    "text_unigram"      -> ((s: SparkSession, dir: String) =>
      Unigram.trainedVocab(Tables.documents(s, dir), "text")),
    // G34: the encode half — every distinct word's Viterbi
    // segmentation under the (memoized) trained model
    "text_unigram_encode" -> ((s: SparkSession, dir: String) =>
      Unigram.encodeVocab(Tables.documents(s, dir), "text",
        graft.store.GraftStore.dirKey(dir))),
    // G60: the unigram sample-first discipline — EM rounds over a 1/3
    // hash-range doc sample, the FULL vocabulary segmented under the
    // sample-trained weights
    "text_unigram_sampled" -> ((s: SparkSession, dir: String) =>
      Unigram.encodeVocabSampled(Tables.documents(s, dir), "text",
        bpeSamplePred)),
    // G35: the corpus pass as a dictionary join — per-doc piece
    // counts under the trained model, Viterbi never re-run
    "text_unigram_tokens" -> ((s: SparkSession, dir: String) =>
      Unigram.pieceCounts(Tables.documents(s, dir), "text",
        graft.store.GraftStore.dirKey(dir))),
    // G36: the SentencePiece PRUNE — shrink to chars + top-K used
    // pieces after EM, refit with one more E-step
    "text_unigram_prune" -> ((s: SparkSession, dir: String) =>
      Unigram.trainedVocabPruned(Tables.documents(s, dir), "text")),
    // G56: byte FALLBACK encode (r17 verdict #3) — a constructed OOV
    // eval set (corpus words + an appended non-ASCII char) segments
    // to <0x..> byte pieces under the same trained model instead of
    // NULLing the word; oracle = the same enumeration with a
    // byte-piece pseudo-vocab restricted to out-of-vocab chars
    "text_unigram_bytes" -> ((s: SparkSession, dir: String) =>
      Unigram.encodeVocabBytes(Tables.documents(s, dir), "text",
        graft.store.GraftStore.dirKey(dir))),
    // G55: BYTE-level BPE (r17 verdict #3) — GPT-2's closed base
    // alphabet: train the same merge kernel over UTF-8 hex-pair
    // symbols; no input is ever OOV
    "text_bpe_bytes"    -> ((s: SparkSession, dir: String) =>
      Bpe.learnMergesFrom(Bpe.pretokenizeBytes(
        Tables.documents(s, dir), "text"), 8)),
    // G57: tokenizer FERTILITY audit per language under the (cached)
    // byte-level model — the sequence-length-inflation metric a
    // tokenizer choice is judged on in production
    "text_bpe_fertility" -> (textBpeFertility _),
    "text_ngrams"       -> (textNgrams _),
    "text_tokens"       -> (textTokens _),
    "text_quality"      -> (textQuality _),
    "text_classifier"   -> (textClassifier _),
    "text_readability"  -> (textReadability _),
    "text_hapax"        -> (textHapax _),
    "text_oov"          -> (textOov _),
    "text_source_terms" -> (textSourceTerms _),
    "text_source_jsd"   -> (textSourceJsd _),
    "text_dsir"         -> (textDsir _),
    "text_langid"       -> (textLangid _),
    "text_lang_confusion" -> (textLangConfusion _),
    "text_fingerprint"  -> (textFingerprint _),
    "text_split"        -> (textSplit _),
    "text_corpus_stats" -> (textCorpusStats _),
    "text_redact"       -> (textRedact _),
    "text_chunks"       -> (textChunks _),
    "text_dedup_chunks" -> (textDedupChunks _),
    "text_cdc_chunks"   -> (textCdcChunks _),
    "text_entropy"      -> (textEntropy _),
    "text_pack"         -> (textPack _),
    "text_sample"       -> (textSample _),
    "text_mixture"      -> (textMixture _),
    "text_mixture_budget" -> (textMixtureBudget _),
    "text_lm_score"     -> (textLmScore _),
    "text_kn_score"     -> (textKnScore _),
    "text_ccnet_buckets" -> (textCcnetBuckets _),
    "text_top_bigram"   -> (textTopBigram _),
    "text_gopher"       -> (textGopher _),
    "text_zipf"         -> (textZipf _),
    "text_encoding_audit" -> (textEncodingAudit _),
    "text_gopher_lines" -> (textGopherLines _),
    "text_c4_filters"   -> (textC4Filters _),
    "text_repetition"   -> (textRepetition _),
    "text_contamination" -> (textContamination _),
    "text_quantile_sketch" -> (textQuantileSketch _),
    "text_mix_weights"  -> (textMixWeights _),
    "text_html_extract" -> (textHtmlExtract _),
    "text_luhn"         -> (textLuhn _),
  )

  // --- generated DuckDB oracles -------------------------------------

  private def inListSql(x: String, words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(s"list_contains([", ", ", s"], $x)")

  private[graft] def countInSql(toksExpr: String, words: Seq[String]): String =
    s"length(list_filter($toksExpr, t -> ${inListSql("t", words)}))"

  private[graft] val toksSql = "string_split_regex(trim(text), ' +')"

  /** The shared KN CTE chain (bigrams → train counts → continuation
    * fertilities → per-bigram term), parameterized on the final
    * SELECT so text_kn_score and text_ccnet_buckets stay one text. */
  private def knScoreOracleSql(tail: String, extraCte: Boolean = false): String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |bgi AS (
       |  SELECT doc_id, unnest(range(1, length(t)))::int AS i, t FROM toks
       |),
       |bgs AS (SELECT doc_id, t[i] AS t1, t[i + 1] AS t2 FROM bgi),
       |tr AS (
       |  SELECT * FROM bgs
       |  WHERE ('0x' || substr(md5('split|' || doc_id), 1, 4))::int < $TrainBucketMax
       |),
       |bg AS (SELECT t1, t2, count(*) AS c_bg FROM tr GROUP BY 1, 2),
       |pre AS (SELECT t1, count(*) AS c_pre FROM tr GROUP BY 1),
       |n1f AS (SELECT t1, count(*) AS n1f FROM bg GROUP BY 1),
       |n1b AS (SELECT t2, count(*) AS n1b FROM bg GROUP BY 1),
       |scal AS (SELECT (SELECT count(*) FROM bg) AS n_types,
       |  (SELECT count(*) FROM
       |    (SELECT t1 AS t FROM tr UNION SELECT t2 FROM tr)) AS vocab),
       |j AS (
       |  SELECT s.doc_id, bg.c_bg, pre.c_pre, n1f.n1f,
       |    (coalesce(n1b.n1b, 0) + 1)::double / (scal.n_types + scal.vocab) AS pc
       |  FROM bgs s
       |  LEFT JOIN bg ON s.t1 = bg.t1 AND s.t2 = bg.t2
       |  LEFT JOIN pre ON s.t1 = pre.t1
       |  LEFT JOIN n1f ON s.t1 = n1f.t1
       |  LEFT JOIN n1b ON s.t2 = n1b.t2
       |  CROSS JOIN scal
       |),
       |t AS (
       |  SELECT doc_id, c_pre,
       |    -log2(CASE WHEN c_pre IS NOT NULL THEN
       |      (greatest(coalesce(c_bg, 0)::double - 0.75::double, 0.0::double)
       |        + 0.75::double * n1f * pc) / c_pre
       |    ELSE pc END) AS term
       |  FROM j
       |)${if (extraCte) "," else ""}
       |$tail""".stripMargin

  /** Shared by text_bm25 (corpus-scan plan) and text_bm25_indexed
    * (posting-list plan): one oracle text, two physical strategies. */
  private lazy val bm25OracleSql: String = {
    val termList = Bm25QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH stats AS (
       |  SELECT count(*)::double AS n_docs,
       |    avg(length($toksSql)::double) AS avgdl
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, length($toksSql) AS dl,
       |    unnest($toksSql) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM toks
       |  WHERE term IN $termList GROUP BY 1, 2, 3
       |), dfreq AS (
       |  SELECT term, count(*)::double AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id, count(*) AS n_terms_hit,
       |    sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |      * (tf.tf * ($Bm25K1 + 1.0)
       |        / (tf.tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * tf.dl / s.avgdl)))
       |    ) AS score
       |  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
       |  GROUP BY 1
       |)
       |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
       |  doc_id, n_terms_hit, round(score, 4) AS bm25
       |FROM scored ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  /** G31/G32 oracle (r15 verdict #6): 8 greedy BPE merge rounds as
    * generated MATERIALIZED CTEs. Each round r: `c_r` pair counts over
    * the previous word table (parallel unnest of the two array slices
    * — DuckDB zips equal-length unnests, mirroring arrays_zip), `b_r`
    * the 1-row argmax (count DESC, pair ASC — the exact Spark
    * tie-break), then the greedy leftmost-first merge: `ex_r` marks
    * adjacent matches (lead over per-word position), `mr_r` buckets
    * consecutive matches into runs and keeps EVEN offsets (overlapping
    * pairs like "aaa" under a+a merge leftmost-first), `w_r` drops the
    * absorbed right symbol (lag of merge_at) and rebuilds the array
    * with list(v ORDER BY pos) — the sort_array(collect_list) mirror.
    * The merge rule is DATA-dependent, so rounds reference `b_r` via
    * scalar subqueries rather than literals. Validated equal to the
    * Spark output at sf0.001 and sf0.01 before registration. */
  private def bpeW0Sql: String =
    """w0 AS MATERIALIZED (
      |  SELECT w, n, regexp_split_to_array(w, '') AS syms FROM (
      |    SELECT w, count(*)::bigint AS n FROM (
      |      SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
      |    ) WHERE length(w) > 0 GROUP BY w
      |  )
      |)""".stripMargin

  private def bpeRoundSql(i: Int): String =
    s"""c$i AS (
       |  SELECT a, b, sum(n)::bigint AS cnt FROM (
       |    SELECT n, unnest(syms[1:len(syms)-1]) AS a, unnest(syms[2:len(syms)]) AS b
       |    FROM w${i - 1} WHERE len(syms) >= 2
       |  ) GROUP BY a, b
       |),
       |b$i AS MATERIALIZED (SELECT a, b, cnt FROM c$i ORDER BY cnt DESC, a, b LIMIT 1),
       |ex$i AS MATERIALIZED (
       |  SELECT w, n, pos, s,
       |    CASE WHEN s = (SELECT a FROM b$i)
       |      AND lead(s) OVER (PARTITION BY w ORDER BY pos) = (SELECT b FROM b$i)
       |    THEN 1 ELSE 0 END AS m
       |  FROM (SELECT w, n, unnest(syms) AS s, unnest(range(len(syms))) AS pos FROM w${i - 1})
       |),
       |mr$i AS MATERIALIZED (
       |  SELECT w, pos,
       |    CASE WHEN (pos - min(pos) OVER (PARTITION BY w, runkey)) % 2 = 0 THEN 1 ELSE 0 END AS merge_at
       |  FROM (
       |    SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS runkey
       |    FROM ex$i WHERE m = 1
       |  )
       |),
       |w$i AS MATERIALIZED (
       |  SELECT w, n, list(v ORDER BY pos) AS syms FROM (
       |    SELECT e.w, e.n, e.pos,
       |      CASE WHEN m.merge_at = 1 THEN (SELECT a || b FROM b$i) ELSE e.s END AS v,
       |      coalesce(lag(m.merge_at) OVER (PARTITION BY e.w ORDER BY e.pos), 0) AS prev_merged
       |    FROM ex$i e LEFT JOIN mr$i m ON e.w = m.w AND e.pos = m.pos
       |  ) WHERE prev_merged = 0
       |  GROUP BY w, n
       |)""".stripMargin

  /** G33/G34 oracle scaffolding: the unigram-LM Viterbi-EM rounds as
    * generated CTEs (the text_bpe route). The E-step's Viterbi is
    * mirrored by EXHAUSTIVE segmentation enumeration per distinct word
    * (a recursive CTE stepping 1..MaxPieceLen chars through the vocab
    * piece table — tetranacci(len) paths per word, tractable because
    * enumeration runs at VOCAB scale, never corpus scale) and a
    * row_number pick per word by (score DESC, reversed-lengths DESC):
    * single-digit piece lengths prepended into a VARCHAR make the
    * string comparison exactly the DP's longer-piece-wins-ties order
    * (see Unigram.viterbiSeg). Scores are the same fixed-point integer
    * logs — each ln rounded separately — so the pick is exact Long
    * arithmetic in both engines. */
  private def unigramVocab0Sql: String = {
    val S = graft.text.Unigram.Scale
    s"""w0 AS MATERIALIZED (
       |  SELECT w, count(*)::bigint AS n FROM (
       |    SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
       |  ) WHERE length(w) > 0 GROUP BY w
       |),
       |sub AS MATERIALIZED (
       |  SELECT piece, sum(n)::bigint AS cnt FROM (
       |    SELECT n, substr(w, st, l) AS piece FROM (
       |      SELECT w, n, l, unnest(range(1, length(w) - l + 2)) AS st
       |      FROM (SELECT w, n, unnest(range(1, ${graft.text.Unigram.MaxPieceLen + 1})) AS l FROM w0) q
       |      WHERE l <= length(w)
       |    )
       |  ) GROUP BY piece
       |),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM sub WHERE length(piece) >= 2
       |    ORDER BY cnt DESC, piece LIMIT ${graft.text.Unigram.MultiBudget}
       |  )
       |),
       |wt0 AS MATERIALIZED (
       |  SELECT piece, CAST(round(ln(cnt + 1) * $S) AS BIGINT)
       |    - (SELECT CAST(round(ln(sum(cnt + 1)) * $S) AS BIGINT) FROM vocab0) AS wgt
       |  FROM vocab0
       |)""".stripMargin
  }

  /** The enumerate (p) + pick (seg) half of a Viterbi-EM round over
    * an explicit `words` table — split out so the G60 sampled face
    * can segment the FULL word table under sample-trained weights. */
  private def unigramSegSqlOver(tag: String, prevWt: String,
      words: String): String = {
    val L = graft.text.Unigram.MaxPieceLen
    s"""p$tag AS (
       |  SELECT w, n, 0 AS pos, '' AS seg, '' AS rlen, 0::bigint AS score FROM $words
       |  UNION ALL
       |  SELECT p.w, p.n, p.pos + l.l AS pos,
       |    CASE WHEN p.seg = '' THEN substr(p.w, p.pos + 1, l.l)
       |         ELSE p.seg || '|' || substr(p.w, p.pos + 1, l.l) END AS seg,
       |    CAST(l.l AS VARCHAR) || p.rlen AS rlen,
       |    p.score + t.wgt AS score
       |  FROM p$tag p, (SELECT unnest(range(1, ${L + 1})) AS l) l, $prevWt t
       |  WHERE p.pos + l.l <= length(p.w)
       |    AND t.piece = substr(p.w, p.pos + 1, l.l)
       |),
       |seg$tag AS MATERIALIZED (
       |  SELECT w, n, seg FROM (
       |    SELECT w, n, seg,
       |      row_number() OVER (PARTITION BY w ORDER BY score DESC, rlen DESC) AS rn
       |    FROM p$tag WHERE pos = length(w)
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  /** One Viterbi-EM round: enumerate (p), pick (seg), recount (c),
    * reweight (wt) — reads `prevWt`, counts over `vocab` (the prune
    * round swaps both; training rounds use wt(i−1) / vocab0). */
  private def unigramRoundSqlOver(tag: String, prevWt: String,
      vocab: String): String = {
    val S = graft.text.Unigram.Scale
    s"""${unigramSegSqlOver(tag, prevWt, "w0")},
       |c$tag AS MATERIALIZED (
       |  SELECT v.piece, coalesce(u.cnt, 0)::bigint AS cnt
       |  FROM $vocab v LEFT JOIN (
       |    SELECT piece, sum(n)::bigint AS cnt FROM (
       |      SELECT n, unnest(string_split(seg, '|')) AS piece FROM seg$tag
       |    ) GROUP BY piece
       |  ) u ON v.piece = u.piece
       |),
       |wt$tag AS MATERIALIZED (
       |  SELECT piece, CAST(round(ln(cnt + 1) * $S) AS BIGINT)
       |    - (SELECT CAST(round(ln(sum(cnt + 1)) * $S) AS BIGINT) FROM c$tag) AS wgt
       |  FROM c$tag
       |)""".stripMargin
  }

  private def unigramRoundSql(i: Int): String =
    unigramRoundSqlOver(i.toString, s"wt${i - 1}", "vocab0")

  private lazy val unigramOracleSql: String = {
    val r = graft.text.Unigram.EmRounds
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    s"""WITH RECURSIVE ${unigramVocab0Sql},
       |$rounds
       |SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rnk
       |FROM c$r""".stripMargin
  }

  private lazy val unigramEncodeOracleSql: String = {
    // the encoder segments under the FINAL trained weights wt_r, i.e.
    // one E-step beyond the last training round — round r+1's seg
    val r = graft.text.Unigram.EmRounds + 1
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    s"""WITH RECURSIVE ${unigramVocab0Sql},
       |$rounds
       |SELECT w, n, seg FROM seg$r""".stripMargin
  }

  /** G60 oracle: the training chain over a SAMPLED w0 (the vocab0
    * replace swaps the doc source), then one seg pass over the FULL
    * word table under the final sampled weights; unsegmentable
    * full-corpus words keep a NULL row via the left join. */
  private lazy val unigramSampledOracleSql: String = {
    val r = graft.text.Unigram.EmRounds
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    val sampledVocab0 = unigramVocab0Sql.replace("FROM documents",
      s"FROM documents WHERE $bpeSamplePredSql")
    s"""WITH RECURSIVE $sampledVocab0,
       |$rounds,
       |wf AS MATERIALIZED (
       |  SELECT w, count(*)::bigint AS n FROM (
       |    SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
       |  ) WHERE length(w) > 0 GROUP BY w
       |),
       |${unigramSegSqlOver("F", s"wt$r", "wf")}
       |SELECT f.w, f.n, s.seg
       |FROM wf f LEFT JOIN (SELECT w, seg FROM segF) s ON s.w = f.w""".stripMargin
  }

  /** G36: the prune round — vocabP keeps chars + top-KeepMulti multi
    * by the FINAL training counts, then one more E-step over the
    * shrunk vocab (same round template, wtP/vocabP swapped in). */
  private lazy val unigramPruneOracleSql: String = {
    val S = graft.text.Unigram.Scale
    val r = graft.text.Unigram.EmRounds
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    s"""WITH RECURSIVE ${unigramVocab0Sql},
       |$rounds,
       |vocabP AS MATERIALIZED (
       |  SELECT piece, cnt FROM c$r WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM c$r WHERE length(piece) >= 2
       |    ORDER BY cnt DESC, piece LIMIT ${graft.text.Unigram.KeepMulti}
       |  )
       |),
       |wtP0 AS MATERIALIZED (
       |  SELECT piece, CAST(round(ln(cnt + 1) * $S) AS BIGINT)
       |    - (SELECT CAST(round(ln(sum(cnt + 1)) * $S) AS BIGINT) FROM vocabP) AS wgt
       |  FROM vocabP
       |),
       |${unigramRoundSqlOver("P", "wtP0", "vocabP")}
       |SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rnk
       |FROM cP""".stripMargin
  }

  private lazy val unigramTokensOracleSql: String = {
    val r = graft.text.Unigram.EmRounds + 1
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    s"""WITH RECURSIVE ${unigramVocab0Sql},
       |$rounds,
       |dict AS (SELECT w, len(string_split(seg, '|'))::bigint AS n_p FROM seg$r),
       |dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w
       |    FROM documents
       |  ) WHERE length(w) > 0
       |),
       |per AS (
       |  SELECT doc_id, count(*)::bigint AS n_words, sum(n_p)::bigint AS n_pieces
       |  FROM dw JOIN dict USING (w) GROUP BY doc_id
       |)
       |SELECT d.doc_id, coalesce(per.n_words, 0)::bigint AS n_words,
       |  coalesce(per.n_pieces, 0)::bigint AS n_pieces
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id""".stripMargin
  }

  /** G55 oracle w0: the byte-level base alphabet — each word's UTF-8
    * bytes as two-char hex symbols (hex(encode(w)) sliced in pairs),
    * mirroring Bpe.byteSyms; the merge rounds are the SAME generated
    * CTEs as the char-level oracle (a symbol is just a string). */
  private def bpeBytesW0Sql: String =
    """w0 AS MATERIALIZED (
      |  SELECT w, n, list_transform(range(1, octet_length(encode(w)) + 1),
      |    i -> substr(hex(encode(w)), (2*i - 1)::int, 2)) AS syms
      |  FROM (
      |    SELECT w, count(*)::bigint AS n FROM (
      |      SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
      |    ) WHERE length(w) > 0 GROUP BY w
      |  )
      |)""".stripMargin

  private lazy val bpeBytesOracleSql: String = {
    val rounds = (1 to BpeK).map(bpeRoundSql).mkString(",\n")
    val out = (1 to BpeK).map(i =>
      s"""SELECT $i AS "rank", a AS "left", b AS "right", cnt AS pair_count FROM b$i""")
      .mkString("\nUNION ALL ")
    s"WITH ${bpeBytesW0Sql},\n$rounds\n$out"
  }

  /** G56 oracle: the unigram enumeration with a byte-fallback
    * pseudo-vocab — the trained piece table wt_r UNIONed with one
    * (char → bytes-rendered seg, ByteWgt·octets) row per OOV char of
    * the eval set, so the recursive walk stays ONE join against one
    * piece table and the fallback is reachable exactly where the
    * Spark DP's null-branch fires (chars absent from the trained
    * map). Eval set mirrors encodeVocabBytes: corpus words + chr(233)
    * ('é', 2 UTF-8 bytes) for even char lengths, chr(8364) ('€', 3
    * bytes) for odd. */
  private lazy val unigramBytesOracleSql: String = {
    val r = graft.text.Unigram.EmRounds
    val L = graft.text.Unigram.MaxPieceLen
    val bw = graft.text.Unigram.ByteWgt
    val rounds = (1 to r).map(unigramRoundSql).mkString(",\n")
    s"""WITH RECURSIVE ${unigramVocab0Sql},
       |$rounds,
       |we AS MATERIALIZED (
       |  SELECT w || CASE WHEN length(w) % 2 = 0 THEN chr(233) ELSE chr(8364) END AS w, n
       |  FROM w0
       |),
       |fb AS MATERIALIZED (
       |  SELECT DISTINCT c AS piece,
       |    ($bw)::bigint * octet_length(encode(c)) AS wgt,
       |    array_to_string(list_transform(range(1, octet_length(encode(c)) + 1),
       |      i -> '<0x' || substr(hex(encode(c)), (2*i - 1)::int, 2) || '>'), '|') AS rseg
       |  FROM (SELECT unnest(regexp_split_to_array(w, '')) AS c FROM we)
       |  WHERE c NOT IN (SELECT piece FROM wt$r)
       |),
       |wtb AS MATERIALIZED (
       |  SELECT piece, wgt, piece AS rseg FROM wt$r
       |  UNION ALL SELECT piece, wgt, rseg FROM fb
       |),
       |pB AS (
       |  SELECT w, n, 0 AS pos, '' AS seg, '' AS rlen, 0::bigint AS score FROM we
       |  UNION ALL
       |  SELECT p.w, p.n, p.pos + l.l AS pos,
       |    CASE WHEN p.seg = '' THEN t.rseg
       |         ELSE p.seg || '|' || t.rseg END AS seg,
       |    CAST(l.l AS VARCHAR) || p.rlen AS rlen,
       |    p.score + t.wgt AS score
       |  FROM pB p, (SELECT unnest(range(1, ${L + 1})) AS l) l, wtb t
       |  WHERE p.pos + l.l <= length(p.w)
       |    AND t.piece = substr(p.w, p.pos + 1, l.l)
       |)
       |SELECT w, n, seg FROM (
       |  SELECT w, n, seg,
       |    row_number() OVER (PARTITION BY w ORDER BY score DESC, rlen DESC) AS rn
       |  FROM pB WHERE pos = length(w)
       |) WHERE rn = 1""".stripMargin
  }

  /** G57 oracle: the byte rounds to w8, then the per-lang weighted
    * piece/byte sums — exact integers divided once, round-4. */
  private lazy val bpeFertilityOracleSql: String = {
    val rounds = (1 to BpeK).map(bpeRoundSql).mkString(",\n")
    s"""WITH ${bpeBytesW0Sql},
       |$rounds,
       |d AS (
       |  SELECT w, len(syms)::bigint AS n_p,
       |    octet_length(encode(w))::bigint AS n_b
       |  FROM w$BpeK
       |),
       |wl AS (
       |  SELECT lang, w, count(*)::bigint AS n FROM (
       |    SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS w
       |    FROM documents
       |  ) WHERE length(w) > 0 GROUP BY lang, w
       |)
       |SELECT lang, sum(n)::bigint AS n_words,
       |  sum(n * n_p)::bigint AS n_pieces,
       |  round(sum(n * n_p)::double / sum(n), 4) AS fertility,
       |  round(sum(n * n_b)::double / sum(n * n_p), 4) AS bytes_per_piece
       |FROM wl JOIN d USING (w) GROUP BY lang""".stripMargin
  }

  private val BpeK = 8

  /** G58: 1-in-[[BpeSampleMod]] md5 hash-range doc sample for
    * tokenizer training (the HnswMod/G5 membership idiom). */
  private val BpeSampleMod = 3
  private def bpeSamplePred: org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("bpesamp|"), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long") % BpeSampleMod === 0
  private val bpeSamplePredSql: String =
    s"('0x' || substr(md5('bpesamp|' || doc_id::varchar), 1, 8))::bigint % $BpeSampleMod = 0"

  /** G58 oracle: apply round i's learned rule (the b$i scalar CTEs) to
    * the FULL-corpus word chain f0→f8 — the same merge arithmetic as
    * [[bpeRoundSql]]'s w-chain without the argmax (rules come from the
    * sampled chain). */
  private def bpeApplyRoundSql(i: Int): String =
    s"""fex$i AS MATERIALIZED (
       |  SELECT w, n, pos, s,
       |    CASE WHEN s = (SELECT a FROM b$i)
       |      AND lead(s) OVER (PARTITION BY w ORDER BY pos) = (SELECT b FROM b$i)
       |    THEN 1 ELSE 0 END AS m
       |  FROM (SELECT w, n, unnest(syms) AS s, unnest(range(len(syms))) AS pos FROM f${i - 1})
       |),
       |fmr$i AS MATERIALIZED (
       |  SELECT w, pos,
       |    CASE WHEN (pos - min(pos) OVER (PARTITION BY w, runkey)) % 2 = 0 THEN 1 ELSE 0 END AS merge_at
       |  FROM (
       |    SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS runkey
       |    FROM fex$i WHERE m = 1
       |  )
       |),
       |f$i AS MATERIALIZED (
       |  SELECT w, n, list(v ORDER BY pos) AS syms FROM (
       |    SELECT e.w, e.n, e.pos,
       |      CASE WHEN m.merge_at = 1 THEN (SELECT a || b FROM b$i) ELSE e.s END AS v,
       |      coalesce(lag(m.merge_at) OVER (PARTITION BY e.w ORDER BY e.pos), 0) AS prev_merged
       |    FROM fex$i e LEFT JOIN fmr$i m ON e.w = m.w AND e.pos = m.pos
       |  ) WHERE prev_merged = 0
       |  GROUP BY w, n
       |)""".stripMargin

  private lazy val bpeSampledOracleSql: String = {
    val trainRounds = (1 to BpeK).map(bpeRoundSql).mkString(",\n")
    val applyRounds = (1 to BpeK).map(bpeApplyRoundSql).mkString(",\n")
    // w0 = the SAMPLED word table (rules learn here); f0 = the full one
    val sampledW0 = bpeW0Sql.replace("FROM documents",
      s"FROM documents WHERE $bpeSamplePredSql")
    val fullF0 = bpeW0Sql.replace("w0 AS MATERIALIZED", "f0 AS MATERIALIZED")
    s"""WITH $sampledW0,
       |$trainRounds,
       |$fullF0,
       |$applyRounds
       |SELECT piece, n_tokens, rnk FROM (
       |  SELECT piece, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, piece) AS rnk
       |  FROM (
       |    SELECT piece, sum(n)::bigint AS n_tokens FROM (
       |      SELECT n, unnest(syms) AS piece FROM f$BpeK
       |    ) GROUP BY piece
       |  )
       |) WHERE rnk <= 30""".stripMargin
  }

  private lazy val bpeOracleSql: String = {
    val rounds = (1 to BpeK).map(bpeRoundSql).mkString(",\n")
    val out = (1 to BpeK).map(i =>
      s"""SELECT $i AS "rank", a AS "left", b AS "right", cnt AS pair_count FROM b$i""")
      .mkString("\nUNION ALL ")
    s"WITH ${bpeW0Sql},\n$rounds\n$out"
  }

  private lazy val bpeEncodeOracleSql: String = {
    val rounds = (1 to BpeK).map(bpeRoundSql).mkString(",\n")
    s"""WITH ${bpeW0Sql},
       |$rounds
       |SELECT piece, n_tokens, rnk FROM (
       |  SELECT piece, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, piece) AS rnk
       |  FROM (
       |    SELECT piece, sum(n)::bigint AS n_tokens FROM (
       |      SELECT n, unnest(syms) AS piece FROM w$BpeK
       |    ) GROUP BY piece
       |  )
       |) WHERE rnk <= 30""".stripMargin
  }

  /** DuckDB mirror of textLangid (shared by text_langid and
    * text_lang_confusion). */
  private lazy val langidSql: String = {
    val scoreCols = stopwordProfiles.map { case (lang, words) =>
      s"${countInSql("toks", words)} AS s_$lang"
    }.mkString(",\n    ")
    val maxExpr = "greatest(" + stopwordProfiles.map(p => s"s_${p._1}").mkString(", ") + ")"
    val caseExpr = "CASE WHEN score_max = 0 THEN 'und' " +
      stopwordProfiles.map(p => s"WHEN s_${p._1} = score_max THEN '${p._1}'").mkString(" ") +
      " END"
    s"""WITH q AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM q
       |), m AS (SELECT *, $maxExpr AS score_max FROM s)
       |SELECT doc_id, ${stopwordProfiles.map(p => s"s_${p._1}").mkString(", ")}, score_max,
       |  $caseExpr AS lang_pred
       |FROM m""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // G31/G32: 8 merge rounds as generated materialized CTEs (above)
    "text_bpe" -> bpeOracleSql,
    "text_bpe_encode" -> bpeEncodeOracleSql,
    // G58: sample-trained rules (b-chain over the sampled w0) applied
    // to the full corpus (f-chain)
    "text_bpe_sampled" -> bpeSampledOracleSql,
    // G59: the hashed linear classifier re-derived feature for
    // feature (unigrams + bigrams, bucket and weight arithmetic)
    "text_classifier" ->
      s"""WITH ex AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |f AS (
         |  SELECT doc_id, unnest(toks) AS feat FROM ex
         |  UNION ALL
         |  SELECT doc_id, unnest(CASE WHEN length(toks) >= 2
         |    THEN list_transform(range(1, length(toks)), i -> array_to_string(toks[i:i+1], ' '))
         |    ELSE [] END) AS feat FROM ex
         |),
         |s AS (
         |  SELECT doc_id, count(*)::bigint AS n_feats,
         |    sum((('0x' || substr(md5('qw|' ||
         |        ((('0x' || substr(md5(feat), 1, 8))::bigint % $QcBuckets))::varchar),
         |        1, 8))::bigint % ${2 * QcWgtRange + 1} - $QcWgtRange))::bigint AS score
         |  FROM f GROUP BY doc_id
         |)
         |SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
         |  coalesce(score, 0) AS score,
         |  round(score::double / n_feats, 4) AS avg_wgt,
         |  (CASE WHEN coalesce(score, 0) >= 0 THEN 1 ELSE 0 END) AS keep
         |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    // G33/G34: Viterbi-EM rounds as generated CTEs; the E-step is
    // mirrored by exhaustive per-word segmentation enumeration picked
    // under the same exact integer (score, reversed-lengths) order
    "text_unigram" -> unigramOracleSql,
    "text_unigram_encode" -> unigramEncodeOracleSql,
    "text_unigram_sampled" -> unigramSampledOracleSql,
    "text_unigram_tokens" -> unigramTokensOracleSql,
    "text_unigram_prune" -> unigramPruneOracleSql,
    // G55/G56 (r17 verdict #3): byte-level BPE over the same merge
    // CTEs with a hex-pair w0; unigram byte fallback as an OOV-char
    // pseudo-vocab union in the enumeration
    "text_bpe_bytes" -> bpeBytesOracleSql,
    "text_unigram_bytes" -> unigramBytesOracleSql,
    // G57: byte rounds to w8, per-lang weighted sums, round-4 ratios
    "text_bpe_fertility" -> bpeFertilityOracleSql,
    // G48: exact counts; sqrt normalizer summed in source-name order
    // (list_sum over ORDER BY — mirrors Spark's sorted-array aggregate)
    "text_mix_weights" ->
      s"""WITH s AS (
         |  SELECT source, count(*)::bigint AS n_docs FROM documents GROUP BY 1
         |), z AS (
         |  SELECT sum(n_docs)::bigint AS n_total,
         |    list_sum(list(sqrt(n_docs::double) ORDER BY source)) AS z
         |  FROM s
         |)
         |SELECT source, n_docs,
         |  round(n_docs::double / (SELECT n_total FROM z), 5) AS p_raw,
         |  round(sqrt(n_docs::double) / (SELECT z FROM z), 5) AS w_alpha
         |FROM s""".stripMargin,

    // mirrors lineDedup: same token segments (generated from
    // LineSegTokens/LineMinDocs), same within-source recurrence cut,
    // same ordered reassembly; coalesce('') covers fully-removed docs
    "text_line_dedup" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, $toksSql AS t FROM documents
         |), s AS (
         |  SELECT doc_id, source, t,
         |    unnest(CASE WHEN length(t) > 0
         |      THEN range(0, length(t), $LineSegTokens) ELSE [] END)::int AS st
         |  FROM base
         |), seg AS (
         |  SELECT doc_id, source, st // $LineSegTokens AS seg_id,
         |    array_to_string(t[st + 1 : st + $LineSegTokens], ' ') AS seg
         |  FROM s
         |), boiler AS (
         |  SELECT source, md5(seg) AS h FROM seg
         |  GROUP BY source, md5(seg)
         |  HAVING count(DISTINCT doc_id) >= $LineMinDocs
         |), j AS (
         |  SELECT g.doc_id, g.source, g.seg_id, g.seg, b.h AS bh
         |  FROM seg g LEFT JOIN boiler b
         |    ON g.source = b.source AND md5(g.seg) = b.h
         |)
         |SELECT doc_id, source, count(*) AS n_segs, count(bh) AS n_removed,
         |  md5(coalesce(string_agg(CASE WHEN bh IS NULL THEN seg END, ' '
         |    ORDER BY seg_id), '')) AS cleaned_md5,
         |  length(coalesce(string_agg(CASE WHEN bh IS NULL THEN seg END, ' '
         |    ORDER BY seg_id), '')) AS cleaned_len
         |FROM j GROUP BY doc_id, source""".stripMargin,

    // mirrors textBoilerplate: same tokens, same integer-ratio df
    // threshold (generated from BoilerDfTenths), same share expression
    "text_boilerplate" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |    unnest(string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')) AS tok
         |  FROM documents
         |), dfreq AS (
         |  SELECT source, tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1, 2
         |), nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |boiler AS (
         |  SELECT d.source, d.tok FROM dfreq d JOIN nd USING (source)
         |  WHERE d.df * 10 >= nd.n_docs * $BoilerDfTenths
         |)
         |SELECT t.doc_id, t.source, count(*) AS n_tokens,
         |  count(b.tok) AS n_boiler_tokens,
         |  round(count(b.tok)::double / count(*), 4) AS boiler_share
         |FROM tok t LEFT JOIN boiler b ON t.source = b.source AND t.tok = b.tok
         |GROUP BY 1, 2""".stripMargin,

    // mirrors textWinnow: same grams, same rolling-min frame (truncated
    // at partition end), same valid-start cut, same fallbacks —
    // generated from WinnowGram/WinnowWindow
    // mirrors textSpanDedup: same token split, 8-gram hashes at the
    // same 0-based positions, first-position window, distinct-position
    // coverage union
    "text_span_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ') AS t
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(${(0 until SpanGram).map(j => s"t[i + $j]").mkString(" || ' ' || ")}) AS h
         |  FROM toks, unnest(range(1, length(t) - ${SpanGram - 2})) AS r(i)
         |  WHERE length(t) >= $SpanGram
         |), rep AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      min(pos) OVER (PARTITION BY doc_id, h) AS fp
         |    FROM g
         |  ) WHERE pos > fp
         |), cov AS (
         |  SELECT DISTINCT doc_id, pos + j AS p
         |  FROM rep, unnest(range(0, $SpanGram)) AS s(j)
         |), nc AS (
         |  SELECT doc_id, count(*)::bigint AS n_covered FROM cov GROUP BY 1
         |), tot AS (
         |  SELECT doc_id, length(t)::int AS n_tokens FROM toks
         |)
         |SELECT t.doc_id, t.n_tokens,
         |  coalesce(nc.n_covered, 0)::bigint AS n_covered,
         |  round(coalesce(nc.n_covered, 0)::double / t.n_tokens, 4)
         |    AS dup_span_ratio
         |FROM tot t LEFT JOIN nc ON t.doc_id = nc.doc_id""".stripMargin,

    "text_winnow" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text,
         |    string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ') AS t
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS gh,
         |    length(t) - ${WinnowGram - 1} AS ng
         |  FROM toks, unnest(range(1, length(t) - ${WinnowGram - 2})) AS r(i)
         |  WHERE length(t) >= $WinnowGram
         |), roll AS (
         |  SELECT doc_id, pos, ng,
         |    min(gh) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND ${WinnowWindow - 1} FOLLOWING) AS fp
         |  FROM g
         |), fps AS (
         |  SELECT DISTINCT doc_id, fp FROM roll
         |  WHERE pos <= greatest(ng - $WinnowWindow, 0)
         |  UNION ALL
         |  SELECT doc_id, md5(text) FROM documents
         |  WHERE length(string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')) < $WinnowGram
         |), dfp AS (
         |  SELECT fp, count(DISTINCT doc_id) AS nd FROM fps GROUP BY 1
         |)
         |SELECT f.doc_id, count(*) AS n_fp,
         |  count(CASE WHEN d.nd > 1 THEN 1 END) AS n_shared,
         |  round(count(CASE WHEN d.nd > 1 THEN 1 END)::double / count(*), 4)
         |    AS shared_ratio
         |FROM fps f JOIN dfp d ON f.fp = d.fp
         |GROUP BY 1""".stripMargin,

    // Mirrors textQuantileSketch step for step from the SAME constants:
    // bin counts (the sketch is SQL-expressible because binning is a
    // pure function of the value), cumulative crossing-bin search, and
    // the identical double interpolation. Every numeric is forced
    // ::double where DuckDB would otherwise pick DECIMAL (whose
    // division semantics diverge from Spark's double math).
    "text_quantile_sketch" -> {
      val qsVals = Qs.map(q => s"(${q}::double)").mkString(", ")
      s"""WITH b AS (
         |  SELECT lang,
         |    least(${QBins - 1}, greatest(0, floor((length(text)::double - ${QLo}::double) / ${QW}::double)))::int AS bin,
         |    count(*) AS cnt
         |  FROM documents GROUP BY 1, 2
         |), n AS (SELECT lang, sum(cnt)::bigint AS n FROM b GROUP BY 1),
         |c AS (SELECT lang, bin, cnt, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM b),
         |qs(q) AS (VALUES $qsVals),
         |hit AS (
         |  SELECT c.lang, q, bin, cnt, cum - cnt AS cumprev, n.n,
         |    row_number() OVER (PARTITION BY c.lang, q ORDER BY bin) AS r
         |  FROM c JOIN n USING (lang) CROSS JOIN qs
         |  WHERE cum >= q * n.n
         |)
         |SELECT lang, q, round(${QLo}::double + ${QW}::double * (bin + (q * n - cumprev) / cnt), 6) AS est, n
         |FROM hit WHERE r = 1""".stripMargin
    },

    "text_tokens" ->
      s"""SELECT doc_id,
         |  length($toksSql) AS n_tokens_ws,
         |  length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens_re,
         |  length(text) AS len_chars
         |FROM documents""".stripMargin,

    // mirrors textReadability: RE2 regex classes agree between engines
    // on \S+ / [.!?]+ / [aeiouy]+ runs; integer counts, fixed float
    // formulas, 3-4dp rounding
    // mirrors textSourceJsd: same min-df vocabulary, same Laplace
    // grid, same term-wise half-KL sum (ln both engines)
    "text_source_jsd" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($toksSql) AS tok FROM documents
         |), vocab AS (
         |  SELECT tok FROM (SELECT tok, count(*) AS n_all FROM tok GROUP BY 1)
         |  WHERE n_all >= $JsdMinDf
         |), ts AS (
         |  SELECT t.source, t.tok, count(*) AS n
         |  FROM tok t JOIN vocab v ON t.tok = v.tok
         |  GROUP BY 1, 2
         |), vsize AS (SELECT count(*) AS v FROM vocab),
         |tot AS (SELECT source, sum(n)::bigint AS t_s FROM ts GROUP BY 1),
         |dense AS (
         |  SELECT g.source, g.tok,
         |    (coalesce(ts.n, 0) + 1)::double / (g.t_s + vs.v) AS p
         |  FROM (SELECT tot.source, tot.t_s, vocab.tok
         |        FROM tot CROSS JOIN vocab) g
         |  LEFT JOIN ts ON ts.source = g.source AND ts.tok = g.tok
         |  CROSS JOIN vsize vs
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  round(sum(
         |    a.p * ln(a.p / ((a.p + b.p) / 2)) / 2
         |      + b.p * ln(b.p / ((a.p + b.p) / 2)) / 2), 4) AS jsd
         |FROM dense a JOIN dense b
         |  ON a.tok = b.tok AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,

    // mirrors textSourceTerms: identical cross-multiplied lift,
    // rank over the ROUNDED lift with the token tie-break
    "text_source_terms" ->
      s"""WITH tok AS (
         |  SELECT source, unnest($toksSql) AS tok FROM documents
         |), ts AS (
         |  SELECT source, tok, count(*) AS n_ts FROM tok GROUP BY 1, 2
         |), t AS (
         |  SELECT tok, count(*) AS n_t FROM tok GROUP BY 1
         |  HAVING count(*) >= $SourceTermsMinDf
         |), st AS (SELECT source, count(*) AS t_s FROM tok GROUP BY 1),
         |al AS (SELECT count(*) AS t_all FROM tok),
         |lifted AS (
         |  SELECT ts.source, ts.tok, ts.n_ts, t.n_t,
         |    round((ts.n_ts * al.t_all)::double / (t.n_t * st.t_s), 4) AS lift
         |  FROM ts JOIN t ON ts.tok = t.tok
         |  JOIN st ON ts.source = st.source
         |  CROSS JOIN al
         |), r AS (
         |  SELECT source, tok, n_ts, n_t, lift,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY lift DESC, tok) AS rnk
         |  FROM lifted
         |)
         |SELECT source, rnk, tok, n_ts, n_t, lift
         |FROM r WHERE rnk <= $SourceTermsK""".stripMargin,

    // mirrors textOov: the same (count desc, token) top-K vocabulary
    // and per-doc membership rates
    "text_oov" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |), vocab AS (
         |  SELECT tok FROM (
         |    SELECT tok, count(*) AS n,
         |      row_number() OVER (ORDER BY count(*) DESC, tok) AS r
         |    FROM tok GROUP BY tok
         |  ) WHERE r <= $OovVocabK
         |)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |  sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::bigint AS n_oov,
         |  round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::double
         |        / count(*), 4) AS oov_rate
         |FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
         |GROUP BY t.doc_id""".stripMargin,

    // mirrors textHapax over the same whitespace tokens
    "text_hapax" ->
      s"""WITH tok AS (
         |  SELECT source, lang, unnest($toksSql) AS tok FROM documents
         |), tf AS (
         |  SELECT source, lang, tok, count(*) AS n FROM tok GROUP BY 1, 2, 3
         |)
         |SELECT source, lang, count(*) AS vocab, sum(n)::bigint AS n_tokens,
         |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::bigint AS hapax,
         |  sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)::bigint AS dis,
         |  round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::double / count(*), 4)
         |    AS hapax_share,
         |  round(count(*)::double / sum(n), 4) AS type_token_ratio
         |FROM tf GROUP BY 1, 2""".stripMargin,

    "text_readability" ->
      s"""WITH c AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '\\S+')) AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(n_words::double / n_sentences, 4) AS words_per_sentence,
        |  round(n_syllables::double / n_words, 4) AS syllables_per_word,
        |  ((2 * (206835 * n_sentences::bigint * n_words
        |         - 1015 * n_words::bigint * n_words
        |         - 84600 * n_syllables::bigint * n_sentences)
        |    + n_sentences::bigint * n_words
        |    + 2 * n_sentences::bigint * n_words * $ReadabilityBias)
        |   // (2 * n_sentences::bigint * n_words)
        |   - $ReadabilityBias)::double / 1000.0 AS flesch,
        |  ((2 * (390 * n_words::bigint * n_words
        |         + 11800 * n_syllables::bigint * n_sentences
        |         - 15590 * n_sentences::bigint * n_words)
        |    + n_sentences::bigint * n_words
        |    + 2 * n_sentences::bigint * n_words * $ReadabilityBias)
        |   // (2 * n_sentences::bigint * n_words)
        |   - $ReadabilityBias)::double / 1000.0 AS fk_grade
        |FROM c WHERE n_words > 0""".stripMargin,

    "text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id, $toksSql AS toks, length(text)::double AS len,
         |    length(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::double AS punct
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, length(toks) AS n_tokens,
         |    round(len / length(toks), 4) AS avg_token_len,
         |    round(punct / len, 4) AS punct_ratio,
         |    round(${countInSql("toks", enStops)}::double / length(toks), 4) AS stopword_ratio,
         |    round(1.0 - length(list_distinct(toks))::double / length(toks), 4) AS dup_token_ratio
         |  FROM q
         |)
         |SELECT *, (n_tokens BETWEEN 5 AND 1000 AND dup_token_ratio < 0.8)::int AS keep
         |FROM r""".stripMargin,

    "text_langid" -> langidSql,

    // nests the langid oracle as a derived table so it cannot drift
    "text_lang_confusion" ->
      s"""WITH p AS ($langidSql)
         |SELECT d.lang AS lang_actual, p.lang_pred, count(*) AS n_docs
         |FROM documents d JOIN p ON d.doc_id = p.doc_id
         |GROUP BY 1, 2""".stripMargin,

    "text_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY 1
         |), scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * ln((SELECT count(*) FROM documents)::double / dfreq.df) DESC,
         |               tf.term) AS rnk
         |  FROM tf JOIN dfreq USING (term)
         |)
         |SELECT doc_id, term, tf, df, rnk FROM scored WHERE rnk <= 3""".stripMargin,

    // K24: the indexed lookup must produce the IDENTICAL ranked list
    // as the corpus-scan spelling — one oracle text, two plans
    "text_bm25_indexed" -> bm25OracleSql,

    // mirrors textWsample: same salted 32-bit hash, same w·2^32/(h+1)
    // priority (multiply/divide only — bit-identical doubles), same
    // per-source (q DESC, doc_id) rank cut
    "text_wsample" ->
      s"""WITH p AS (
         |  SELECT source, doc_id, n_chars,
         |    n_chars::double * 4294967296.0 /
         |      ((('0x' || substr(md5(concat_ws('|', 'wsample', doc_id)), 1, 8))::bigint + 1)::double) AS q
         |  FROM documents
         |)
         |SELECT source, doc_id, n_chars, q,
         |  row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rnk
         |FROM p
         |QUALIFY rnk <= $WsampleK""".stripMargin,

    // mirrors textBm25 term for term: same fixed query set, same idf
    // and tf-normalization double expressions, same (score, doc_id)
    // total order on the top-k cut
    "text_bm25" -> bm25OracleSql,

    // mirrors textDsir: same unigram+bigram features, same md5-prefix
    // bucket hash, the same Laplace-smoothed log-ratio, and the per-doc
    // float fold in the SAME fixed bucket order (list ORDER BY b ↔
    // array_sort(collect_list(struct(b, term))))
    "text_dsir" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |f AS (
         |  SELECT doc_id, lang, unnest(toks) AS f FROM t
         |  UNION ALL
         |  SELECT doc_id, lang, unnest(CASE WHEN length(toks) >= 2
         |    THEN list_transform(range(1, length(toks)), i -> array_to_string(toks[i:i+1], ' '))
         |    ELSE [] END) AS f FROM t
         |), fb AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5(f), 1, 8))::bigint % $DsirBuckets AS b
         |  FROM f
         |), docb AS (
         |  SELECT doc_id, b, count(*)::bigint AS c FROM fb GROUP BY 1, 2
         |), model AS (
         |  SELECT b, count(*)::bigint AS n_r,
         |    sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END)::bigint AS n_t
         |  FROM fb GROUP BY 1
         |), tot AS (
         |  SELECT sum(n_r)::bigint AS nr, sum(n_t)::bigint AS nt FROM model
         |), lr AS (
         |  SELECT b,
         |    ln((n_t + 1)::double / ((SELECT nt FROM tot) + $DsirBuckets))
         |    - ln((n_r + 1)::double / ((SELECT nr FROM tot) + $DsirBuckets)) AS lr_b
         |  FROM model
         |)
         |SELECT d.doc_id, sum(d.c)::bigint AS n_feats,
         |  round(list_sum(list(d.c * lr.lr_b ORDER BY d.b)), 4) AS w
         |FROM docb d JOIN lr ON d.b = lr.b
         |GROUP BY d.doc_id""".stripMargin,

    "text_ngrams" ->
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
         |b AS (
         |  SELECT unnest(CASE WHEN length(toks) >= 2
         |    THEN list_transform(range(1, length(toks)), i -> array_to_string(toks[i:i+1], ' '))
         |    ELSE [] END) AS ngram
         |  FROM t
         |)
         |SELECT ngram, count(*) AS freq FROM b
         |GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 20""".stripMargin,

    // mirrors textZipf: same (freq DESC, token) total order for the
    // head cut, the rank, and the running sum; shares are exact-int
    // sums under one division
    // formula mirror of the synthesized byte stream: base = first 40
    // chars (ASCII corpus → bytes == chars), +1 char for the valid é
    // leg, +2 (FFFD + kept '(') for the truncated-sequence leg, +1
    // FFFD for the lone-0xFF tail every 7th
    "text_encoding_audit" ->
      """SELECT doc_id,
        |  least(40, length(text))
        |    + (CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 0 END)
        |    + (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS n_chars_decoded,
        |  ((CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END))::int AS n_replacement,
        |  (CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)::int AS n_nonascii,
        |  (CASE WHEN doc_id % 3 <> 2 AND doc_id % 7 <> 0
        |    THEN 1 ELSE 0 END)::int AS valid_utf8,
        |  (CASE WHEN doc_id % 3 = 0 AND doc_id % 7 <> 0
        |    THEN 1 ELSE 0 END)::int AS is_clean
        |FROM documents""".stripMargin,

    // generation-formula mirror: the Spark side PARSES the structured
    // text it built; the oracle only re-states the line-mark formula
    // over unnest(range(L)) — bullet at (doc_id+i)%3=0, ellipsis
    // terminator at (doc_id+i)%4=0, period at %4=1, L = 4 + doc_id%5
    "text_gopher_lines" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5)) AS i
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, count(*) AS n_lines,
        |    sum(CASE WHEN (doc_id + i) % 3 = 0 THEN 1 ELSE 0 END)::bigint AS n_bullet,
        |    sum(CASE WHEN (doc_id + i) % 4 = 0 THEN 1 ELSE 0 END)::bigint AS n_ellipsis,
        |    sum(CASE WHEN (doc_id + i) % 4 = 1 THEN 1 ELSE 0 END)::bigint AS n_sentences
        |  FROM g GROUP BY doc_id
        |)
        |SELECT doc_id, n_lines, n_bullet, n_ellipsis, n_sentences,
        |  (CASE WHEN n_bullet * 10 <= n_lines * 9 THEN 1 ELSE 0 END) AS r_bullet,
        |  (CASE WHEN n_ellipsis * 10 <= n_lines * 3 THEN 1 ELSE 0 END) AS r_ellipsis,
        |  (CASE WHEN n_sentences >= 3 THEN 1 ELSE 0 END) AS r_sentences,
        |  (CASE WHEN n_bullet * 10 <= n_lines * 9
        |    AND n_ellipsis * 10 <= n_lines * 3
        |    AND n_sentences >= 3 THEN 1 ELSE 0 END) AS keep
        |FROM c""".stripMargin,

    // G56: every flag re-derived from the generating arithmetic (the
    // gopher_lines convention); the injected lorem/brace/blocklist
    // lines also kill their line's terminal flag, mirrored exactly
    "text_c4_filters" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5)) AS i
        |  FROM documents
        |), l AS (
        |  SELECT doc_id, i,
        |    (CASE WHEN doc_id % 7 = 0 AND i = 2 THEN 5
        |          WHEN (doc_id + i) % 4 = 2 THEN 2 ELSE 5 END)
        |    + (CASE WHEN doc_id % 11 = 0 AND i = 3 THEN 1 ELSE 0 END)
        |    + (CASE WHEN doc_id % 5 = 0 AND i = 1 THEN 1 ELSE 0 END) AS words,
        |    (CASE WHEN (doc_id + i) % 3 IN (0, 1)
        |          AND NOT (doc_id % 5 = 0 AND i = 1)
        |          AND NOT (doc_id % 11 = 0 AND i = 3) THEN 1 ELSE 0 END) AS terminal
        |  FROM g
        |), c AS (
        |  SELECT doc_id, count(*) AS n_lines,
        |    sum(CASE WHEN words >= 5 AND terminal = 1 THEN 1 ELSE 0 END)::bigint AS n_kept,
        |    sum(terminal)::bigint AS n_sentences
        |  FROM l GROUP BY doc_id
        |)
        |SELECT doc_id, n_lines, n_kept, n_sentences,
        |  (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS has_lorem,
        |  (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS has_brace,
        |  (CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS has_blocked,
        |  round(n_kept::double / n_lines, 4) AS kept_ratio,
        |  (CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 <> 0 AND doc_id % 11 <> 0
        |        AND n_sentences >= 3 THEN 1 ELSE 0 END) AS keep
        |FROM c""".stripMargin,

    "text_zipf" ->
      s"""WITH c AS (
         |  SELECT t, count(*) AS freq
         |  FROM (SELECT unnest($toksSql) AS t FROM documents)
         |  GROUP BY 1
         |), tot AS (SELECT sum(freq)::bigint AS total FROM c),
         |r AS (
         |  SELECT t, freq,
         |    row_number() OVER (ORDER BY freq DESC, t) AS rank,
         |    (sum(freq) OVER (ORDER BY freq DESC, t
         |       ROWS UNBOUNDED PRECEDING))::bigint AS cum_freq
         |  FROM c
         |)
         |SELECT rank::int AS rank, t AS token, freq,
         |  (freq * rank)::bigint AS fr_product,
         |  round(freq::double / total, 6) AS share,
         |  round(cum_freq::double / total, 6) AS cum_share
         |FROM r, tot WHERE rank <= $ZipfTopK""".stripMargin,

    // mirrors textGopher: same token split, same regexes, same
    // integer-arithmetic rule flags (generated from GopherStops)
    "text_gopher" ->
      s"""WITH q AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  length(toks) AS n,
         |  length(regexp_replace(text, '\\s+', '', 'g')) AS nonws,
         |  length(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym,
         |  length(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
         |  ${countInSql("toks", GopherStops)} AS stops
         |FROM q)
         |SELECT doc_id, n AS n_words,
         |  round(nonws*1.0/n, 4) AS mean_word_len,
         |  round(n_sym*1.0/n, 4) AS symbol_ratio,
         |  round(n_alpha*1.0/n, 4) AS alpha_frac,
         |  stops AS stop_hits,
         |  CAST(n BETWEEN 50 AND 100000 AS INT) AS r_words,
         |  CAST(nonws BETWEEN 3*n AND 10*n AS INT) AS r_mean_len,
         |  CAST(n_sym*10 <= n AS INT) AS r_symbol,
         |  CAST(n_alpha*5 >= n*4 AS INT) AS r_alpha,
         |  CAST(stops >= 2 AS INT) AS r_stops,
         |  CAST((n BETWEEN 50 AND 100000) AND (nonws BETWEEN 3*n AND 10*n)
         |    AND n_sym*10 <= n AND n_alpha*5 >= n*4 AND stops >= 2 AS INT) AS keep
         |FROM m""".stripMargin,

    // mirrors textRepetition: list-sliced token n-grams (same rows as
    // the lead-window form: i in 1..len-n+1), same integer flags
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g3 AS (
         |  SELECT doc_id, unnest(CASE WHEN length(toks) >= 3
         |    THEN list_transform(range(1, length(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
         |    ELSE [] END) AS g
         |  FROM t),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
         |a3 AS (SELECT doc_id, sum(c) AS occ3,
         |         coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS dup3,
         |         max(c) AS max3 FROM c3 GROUP BY 1),
         |g5 AS (
         |  SELECT doc_id, unnest(CASE WHEN length(toks) >= 5
         |    THEN list_transform(range(1, length(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))
         |    ELSE [] END) AS g
         |  FROM t),
         |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
         |a5 AS (SELECT doc_id,
         |         coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS dup5
         |       FROM c5 GROUP BY 1)
         |SELECT a3.doc_id, (occ3 + 2)::bigint AS n_tokens, max3 AS top3_count,
         |  round(max3 * 3.0 / (occ3 + 2), 4) AS top3_frac,
         |  round(dup5 * 5.0 / (occ3 + 2), 4) AS dup5_frac,
         |  CAST(max3 * 300 <= (occ3 + 2) * 18 AS INT) AS r_top3,
         |  CAST(dup5 * 500 <= (occ3 + 2) * 15 AS INT) AS r_dup5
         |FROM a3 JOIN a5 ON a3.doc_id = a5.doc_id""".stripMargin,

    "text_split" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('split|' || doc_id), 1, 4))::int AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < $TrainBucketMax THEN 'train'
         |       WHEN bucket < $ValBucketMax THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    // G34: same integer token sums, same floor(cap), same two final
    // divisions
    "text_mixture_budget" ->
      s"""WITH per_source AS (
         |  SELECT source, sum(length($toksSql))::bigint AS tokens
         |  FROM documents GROUP BY 1
         |), t AS (SELECT sum(tokens)::bigint AS total_tokens FROM per_source),
         |a AS (
         |  SELECT source, tokens,
         |    floor(total_tokens * ${TextQueries.MixtureBudgetCapShare})::bigint AS cap_tokens,
         |    least(tokens, floor(total_tokens * ${TextQueries.MixtureBudgetCapShare})::bigint) AS alloc_tokens
         |  FROM per_source, t
         |), ta AS (SELECT sum(alloc_tokens)::bigint AS total_alloc FROM a)
         |SELECT source, tokens, cap_tokens, alloc_tokens,
         |  round(alloc_tokens::double / tokens, 4) AS sample_rate,
         |  round(alloc_tokens::double / total_alloc, 4) AS mixture_share
         |FROM a, ta""".stripMargin,

    "text_corpus_stats" ->
      s"""WITH q AS (SELECT source, lang, length($toksSql) AS n, length(text) AS len FROM documents)
         |SELECT source, lang, count(*) AS n_docs,
         |  sum(n)::bigint AS total_tokens,
         |  round(avg(n), 4) AS avg_tokens,
         |  min(len) AS min_chars, max(len) AS max_chars,
         |  round(quantile_cont(len, 0.5), 1) AS median_chars
         |FROM q GROUP BY 1, 2""".stripMargin,

    "text_fingerprint" ->
      s"""WITH q AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |SELECT doc_id, md5(text) AS md5_full,
         |  list_aggregate(list_transform(toks, t -> md5(t)), 'min') AS min_token_hash,
         |  CASE WHEN length(toks) >= 3
         |    THEN list_aggregate(list_transform(range(1, length(toks) - 1),
         |           i -> md5(array_to_string(toks[i:i+2], ' '))), 'min')
         |    ELSE md5(text) END AS min_shingle_hash
         |FROM q""".stripMargin,

    "text_redact" -> {
      // same fold order as the Spark chain; DuckDB needs the 'g' flag
      // (its regexp_replace is first-match-only by default, Spark's is
      // global)
      val chain = piiPatterns.foldLeft("text") {
        case (c, (_, re, token)) => s"regexp_replace($c, '$re', '$token', 'g')"
      }
      val counts = piiPatterns.map { case (name, re, _) =>
        s"length(regexp_extract_all(text, '$re')) AS n_$name"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $counts,
         |  $chain AS redacted
         |FROM documents""".stripMargin
    },

    "text_chunks" ->
      s"""WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
         |s AS (
         |  SELECT doc_id, text,
         |    unnest(CASE WHEN len > 0 THEN range(0, len, $ChunkStride) ELSE [] END) AS start
         |  FROM t
         |)
         |SELECT doc_id, (start // $ChunkStride)::int AS chunk_idx,
         |  start::int AS chunk_start,
         |  substr(text, start::int + 1, $ChunkChars) AS chunk
         |FROM s""".stripMargin,

    "text_dedup_chunks" ->
      s"""WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
         |s AS (
         |  SELECT doc_id, text,
         |    unnest(CASE WHEN len > 0 THEN range(0, len, $DedupChunkChars) ELSE [] END) AS start
         |  FROM t
         |), c AS (
         |  SELECT doc_id,
         |    md5(substr(text, start::int + 1, $DedupChunkChars)) AS chunk_md5,
         |    length(substr(text, start::int + 1, $DedupChunkChars)) AS chunk_len
         |  FROM s
         |)
         |SELECT chunk_md5, count(*) AS n_occurrences,
         |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc_id,
         |  min(chunk_len) AS chunk_len
         |FROM c GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,

    // mirrors textCdcChunks: same gram hash, same boundary rule, lead
    // window for chunk extents
    "text_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents WHERE length(text) > 0),
         |p AS (
         |  SELECT doc_id, text, len,
         |    unnest(range(1, greatest(len - ${CdcGram - 1}, 1) + 1))::int AS i
         |  FROM d
         |), st AS (
         |  SELECT doc_id, text, len, i AS start FROM p
         |  WHERE i = 1
         |     OR ('0x' || substr(md5(substr(text, i, $CdcGram)), 1, 4))::int % $CdcMod = 0
         |), c AS (
         |  SELECT doc_id,
         |    coalesce(lead(start) OVER (PARTITION BY doc_id ORDER BY start), len + 1)
         |      - start AS chunk_len,
         |    md5(substr(text,
         |      start,
         |      coalesce(lead(start) OVER (PARTITION BY doc_id ORDER BY start), len + 1)
         |        - start)) AS chunk_md5
         |  FROM st
         |)
         |SELECT doc_id, count(*) AS n_chunks,
         |  round(avg(chunk_len), 4) AS avg_chunk_len,
         |  max(chunk_len) AS max_chunk_len,
         |  count(DISTINCT chunk_md5) AS n_distinct_chunks
         |FROM c GROUP BY doc_id""".stripMargin,

    "text_entropy" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents
         |), c AS (
         |  SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2
         |)
         |SELECT doc_id, count(*) AS n_types, sum(n)::bigint AS n_toks,
         |  round(log2(sum(n)::double)
         |    - sum(n::double * log2(n::double)) / sum(n)::bigint, 4) AS entropy
         |FROM c GROUP BY doc_id""".stripMargin,

    "text_pack" ->
      s"""WITH q AS (
         |  SELECT source, doc_id, length($toksSql) AS n_tok FROM documents
         |), b AS (
         |  SELECT source, n_tok,
         |    floor(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      / $PackBudget)::int AS bin
         |  FROM q
         |)
         |SELECT source, bin, count(*) AS n_docs, sum(n_tok)::bigint AS tokens_packed
         |FROM b GROUP BY 1, 2""".stripMargin,

    "text_sample" ->
      s"""SELECT doc_id, lang,
         |  ('0x' || substr(md5(concat_ws('|', 'sample', lang, doc_id)), 1, 4))::int AS bucket
         |FROM documents
         |WHERE ('0x' || substr(md5(concat_ws('|', 'sample', lang, doc_id)), 1, 4))::int
         |      < $SampleBucketMax""".stripMargin,

    // mirrors textMixture: same exact-integer per-source threshold
    // least(2^32, (2^32·cap) // n_s) and the same salted 32-bit bucket
    "text_mixture" ->
      s"""WITH c AS (
         |  SELECT source, count(*) AS n_s FROM documents GROUP BY 1
         |), t AS (
         |  SELECT source, n_s,
         |    least(4294967296, ${4294967296L * MixtureCap} // n_s)::bigint AS thr
         |  FROM c
         |)
         |SELECT d.source, d.doc_id,
         |  ('0x' || substr(md5(concat_ws('|', 'mix', d.source, d.doc_id)), 1, 8))::bigint AS bucket,
         |  t.n_s, t.thr
         |FROM documents d JOIN t ON d.source = t.source
         |WHERE ('0x' || substr(md5(concat_ws('|', 'mix', d.source, d.doc_id)), 1, 8))::bigint
         |      < t.thr""".stripMargin,

    // mirrors textTopBigram: list-indexed bigrams == the exploded lead
    // window; exact counts, one division
    "text_top_bigram" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bgi AS (
         |  SELECT doc_id, unnest(range(1, length(t)))::int AS i, t FROM toks
         |),
         |bgs AS (SELECT doc_id, t[i] AS t1, t[i + 1] AS t2 FROM bgi),
         |c AS (SELECT doc_id, t1, t2, count(*) AS c FROM bgs GROUP BY 1, 2, 3)
         |SELECT doc_id, sum(c)::bigint AS n_bigrams, max(c) AS top_count,
         |  round(max(c)::double / sum(c), 4) AS top_share
         |FROM c GROUP BY doc_id""".stripMargin,

    // mirrors textLmScore: same bigram extraction (list indexing ==
    // the exploded lead window), same train-split predicate, exact
    // counts + identical log2 terms, round(4) on the order-sensitive
    // per-doc mean
    "text_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bgi AS (
         |  SELECT doc_id, unnest(range(1, length(t)))::int AS i, t FROM toks
         |),
         |bgs AS (SELECT doc_id, t[i] AS t1, t[i + 1] AS t2 FROM bgi),
         |tr AS (
         |  SELECT * FROM bgs
         |  WHERE ('0x' || substr(md5('split|' || doc_id), 1, 4))::int < $TrainBucketMax
         |),
         |bg AS (SELECT t1, t2, count(*) AS c_bg FROM tr GROUP BY 1, 2),
         |pre AS (SELECT t1, count(*) AS c_pre FROM tr GROUP BY 1),
         |voc AS (SELECT count(*) AS vocab FROM
         |        (SELECT t1 AS t FROM tr UNION SELECT t2 FROM tr)),
         |j AS (
         |  SELECT s.doc_id, coalesce(bg.c_bg, 0) AS c_bg,
         |         coalesce(pre.c_pre, 0) AS c_pre, voc.vocab
         |  FROM bgs s
         |  LEFT JOIN bg ON s.t1 = bg.t1 AND s.t2 = bg.t2
         |  LEFT JOIN pre ON s.t1 = pre.t1
         |  CROSS JOIN voc
         |)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  sum((c_bg = 0)::int)::bigint AS n_unseen,
         |  round(avg(-log2((c_bg + 1)::double / (c_pre + vocab))), 4) AS surprise
         |FROM j GROUP BY doc_id""".stripMargin,

    // mirrors textKnScore: same bigram/train CTEs as text_lm_score,
    // KN terms with every float literal ::double (a bare 0.75 is
    // DECIMAL in DuckDB — decimal arithmetic would diverge from
    // Spark's double path), round(4) on the order-sensitive mean
    "text_kn_score" -> knScoreOracleSql("""SELECT doc_id, count(*) AS n_bigrams,
         |  sum((c_pre IS NULL)::int)::bigint AS n_backoff,
         |  round(avg(term), 4) AS kn_surprise
         |FROM t GROUP BY doc_id""".stripMargin),

    // mirrors textCcnetBuckets: the SAME kn CTE chain, then ntile(3)
    // per language over the (rounded surprise, doc_id) total order
    "text_ccnet_buckets" -> knScoreOracleSql(
      """kn AS (
         |  SELECT doc_id, round(avg(term), 4) AS kn_surprise
         |  FROM t GROUP BY doc_id
         |), sel AS (
         |  SELECT k.doc_id, d.lang, k.kn_surprise,
         |    ntile(3) OVER (PARTITION BY d.lang
         |                   ORDER BY k.kn_surprise, k.doc_id) AS terc
         |  FROM kn k JOIN documents d ON k.doc_id = d.doc_id
         |)
         |SELECT doc_id, lang, kn_surprise,
         |  CASE WHEN terc = 1 THEN 'head'
         |       WHEN terc = 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM sel""".stripMargin, extraCte = true),

    "text_contamination" -> {
      val n = ContamN
      s"""WITH s AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('split|' || doc_id), 1, 4))::int AS bucket,
         |    $toksSql AS toks
         |  FROM documents
         |), lab AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < $TrainBucketMax THEN 'train'
         |         WHEN bucket < $ValBucketMax THEN 'val' ELSE 'test' END AS split,
         |    toks
         |  FROM s
         |), sh AS (
         |  SELECT DISTINCT doc_id, split, sh FROM (
         |    SELECT doc_id, split,
         |      unnest(list_transform(range(1, length(toks) - ${n - 2}),
         |        i -> md5(array_to_string(toks[i:i+${n - 1}], ' ')))) AS sh
         |    FROM lab WHERE length(toks) >= $n
         |  )
         |), tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
         |te AS (SELECT doc_id, sh FROM sh WHERE split = 'test')
         |SELECT te.doc_id, count(*) AS n_shingles, count(tr.sh) AS n_hit,
         |  round(count(tr.sh)::double / count(*), 4) AS ratio
         |FROM te LEFT JOIN tr ON te.sh = tr.sh
         |GROUP BY te.doc_id""".stripMargin
    },

    // G52: rebuild the same page, run the same strip chain (RE2 flags
    // spelled with 'g'/'gs'), compare against the same expected string
    "text_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    '<html><head><title>doc ' || doc_id || '</title>' ||
         |    '<style>p{margin:0}</style>' ||
         |    '<script>var x = "<p>not text</p>";</script></head>' ||
         |    '<body><h1>doc ' || doc_id || '</h1><p>' ||
         |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
         |    '</p><!-- hidden & ignored --></body></html>' AS html
         |  FROM documents
         |), x AS (
         |  SELECT doc_id, text, html,
         |    trim(regexp_replace(
         |      replace(replace(replace(replace(replace(replace(
         |        regexp_replace(
         |          regexp_replace(
         |            regexp_replace(html,
         |              '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
         |            '(?s)<!--.*?-->', ' ', 'g'),
         |          '<[^>]*>', ' ', 'g'),
         |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
         |      '\\s+', ' ', 'g')) AS extracted
         |  FROM h
         |)
         |SELECT doc_id,
         |  length(html) AS n_chars_html,
         |  length(extracted) AS n_chars_text,
         |  md5(extracted) AS text_md5,
         |  (extracted = 'doc ' || doc_id || ' doc ' || doc_id || ' ' ||
         |    trim(regexp_replace(text, '\\s+', ' ', 'g')))::int AS roundtrip_ok
         |FROM x""".stripMargin,

    // G53: regenerate the injected candidate from the same md5 digit
    // formula, re-extract it from the text, and fold the identical
    // 16-term integer Luhn sum
    "text_luhn" -> {
      def dig(idx: Int) =
        s"(('0x' || substr(md5('luhn|' || doc_id), ${idx + 1}, 1))::bigint % 10)"
      def term(d: String, i: Int) =
        if (i % 2 == 1) s"(CASE WHEN $d*2 > 9 THEN $d*2-9 ELSE $d*2 END)" else d
      val sum15 = (0 until 15).map(idx => term(dig(idx), idx + 1)).mkString(" + ")
      val check = s"((10 - ($sum15) % 10) % 10)"
      val last =
        s"(CASE WHEN doc_id % 2 = 0 THEN $check ELSE ($check + 1) % 10 END)"
      val cand16 = ((0 until 15).map(i => s"${dig(i)}::varchar") :+
        s"$last::varchar").mkString(" || ")
      val total = (1 to 16).map(i =>
        term(s"substr(candidate, $i, 1)::int", i)).mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text || ' card ' || ($cand16) AS text2
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, regexp_extract(text2, '([0-9]{16})', 1) AS candidate
         |  FROM t
         |)
         |SELECT doc_id, candidate,
         |  (($total) % 10 = 0)::int AS luhn_valid
         |FROM c""".stripMargin
    },
  )
}
