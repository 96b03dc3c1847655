package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** G9-G12 edge cases on hand-built frames (driver-query coverage at
  * corpus scale lives in the text_redact/chunks/pack/sample oracles). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redaction chain replaces all occurrences in declaration order") {
    val redacted = TextQueries.piiPatterns.foldLeft(col("text")) {
      case (c, (_, re, token)) => regexp_replace(c, re, token)
    }
    val out = Seq(
      "mail a@b.co and c@d.org now",     // two emails
      "ssn 123-45-6789 phone 555-123-4567", // SSN must win over phone-like
      "ip 10.0.0.1 end").toDF("text")
      .select(redacted.as("r")).as[String].collect().toSeq
    assert(out == Seq(
      "mail [EMAIL] and [EMAIL] now",
      "ssn [SSN] phone [PHONE]",
      "ip [IP] end"))
  }

  test("chunking covers the text with the configured overlap, empty text yields none") {
    val doc = "x" * 350 // starts 0,150,300 -> lens 200,200,50
    val df = Seq((1L, doc), (2L, "")).toDF("doc_id", "text")
    val starts = when(length(col("text")) > 0,
      sequence(lit(0), length(col("text")) - 1, lit(TextQueries.ChunkStride)))
      .otherwise(array())
    val out = df.select(col("doc_id"), col("text"), explode(starts).as("s"))
      .select(col("doc_id"), col("s"),
        length(substring(col("text"), col("s") + 1, lit(TextQueries.ChunkChars))).as("l"))
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(out == Seq((1L, 0, 200), (1L, 150, 200), (1L, 300, 50)))
  }

  test("dedupChunks finds only chunks shared across >= 2 documents") {
    val boiler = "b" * TextQueries.DedupChunkChars
    // docs 1 and 2 share the boilerplate chunk at aligned offsets;
    // doc 3 repeats a chunk WITHIN itself only (n_docs = 1 -> dropped)
    val df = Seq(
      (1L, boiler + ("x" * 50)),
      (2L, boiler + ("y" * 50)),
      (3L, ("z" * TextQueries.DedupChunkChars) * 2)).toDF("doc_id", "text")
    val out = TextQueries.dedupChunks(df)
      .select("n_occurrences", "n_docs", "min_doc_id", "chunk_len")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq((2L, 2L, 1L, TextQueries.DedupChunkChars)))
  }

  test("CDC boundaries realign after a prefix edit (the shift-robust property)") {
    // same content with a 3-char prefix insertion: fixed windows all
    // shift, but CDC boundaries in the unchanged tail land on the SAME
    // grams, so most chunk hashes are shared between the two versions
    val base = (1 to 400).map(i => s"w$i").mkString(" ")
    val edited = "zz " + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    def chunks(id: Long): Set[String] = {
      val d = df.filter(col("doc_id") === id)
      val len = length(col("text"))
      val pos = d.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(len - (TextQueries.CdcGram - 1), lit(1)))).as("i"))
      val gh = conv(substring(md5(col("text").substr(col("i"), lit(TextQueries.CdcGram))), 1, 4), 16, 10).cast("int")
      val st = pos.filter(col("i") === 1 || gh % TextQueries.CdcMod === 0)
        .select(col("doc_id"), col("text"), col("i").as("start"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("start")
      st.withColumn("cl", coalesce(lead(col("start"), 1).over(w), length(col("text")) + 1) - col("start"))
        .select(md5(col("text").substr(col("start"), col("cl"))).as("h"))
        .as[String].collect().toSet
    }
    val (c1, c2) = (chunks(1L), chunks(2L))
    val shared = (c1 & c2).size
    assert(c1.size > 10, s"expected ~${2400 / TextQueries.CdcMod}+ chunks, got ${c1.size}")
    // everything after the first post-edit boundary is identical
    assert(shared >= c1.size - 2,
      s"CDC must preserve chunks after an edit: shared $shared of ${c1.size}")
  }

  test("G17 one-char-row CDC rewrite matches the position-explode formulation") {
    // the r7 scale rewrite (chars through the window, ints-only extents,
    // join-back for hashes) must be semantics-identical to the r6
    // position-explode form on real corpus data
    val d = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
    val pos = d.select(col("doc_id"), col("text"),
      explode(sequence(lit(1),
        greatest(length(col("text")) - (TextQueries.CdcGram - 1), lit(1)))).as("i"))
    val gh = conv(substring(md5(col("text").substr(col("i"), lit(TextQueries.CdcGram))), 1, 4), 16, 10).cast("int")
    val st = pos.filter(col("i") === 1 || gh % TextQueries.CdcMod === 0)
      .select(col("doc_id"), col("text"), col("i").as("start"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("start")
    val ref = st
      .withColumn("chunk_len",
        coalesce(lead(col("start"), 1).over(w), length(col("text")) + 1) - col("start"))
      .withColumn("chunk_md5", md5(col("text").substr(col("start"), col("chunk_len"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        round(avg(col("chunk_len")), 4).as("avg_chunk_len"),
        max(col("chunk_len")).as("max_chunk_len"),
        countDistinct(col("chunk_md5")).as("n_distinct_chunks"))
      .collect().map(_.toString).toSet
    val got = TextQueries.textCdcChunks(spark, sfDir)
      .collect().map(_.toString).toSet
    assert(got == ref, s"rewrite diverged: ${(got diff ref).take(3)} vs ${(ref diff got).take(3)}")
  }

  test("G24 BM25 top-k is rank-consistent and bounded by the query size") {
    val rows = TextQueries.textBm25(spark, sfDir)
      .orderBy("rnk")
      .select("rnk", "doc_id", "n_terms_hit", "bm25")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.length == TextQueries.Bm25TopK)
    assert(rows.map(_._1).toSeq == (1 to rows.length), "ranks must be dense")
    assert(rows.map(_._2).distinct.length == rows.length, "doc_ids unique")
    // scores non-increasing down the ranking; hits bounded by |query|
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._4, s"rank ${a._1} score ${a._4} < rank ${b._1} ${b._4}")
    }
    rows.foreach { r =>
      assert(r._3 >= 1 && r._3 <= TextQueries.Bm25QueryTerms.length)
      assert(r._4 > 0.0)
    }
  }

  test("G18 mixture sampling caps each source independently with exact thresholds") {
    val out = TextQueries.textMixture(spark, sfDir)
    val rows = out.select("source", "n_s", "thr")
      .distinct().as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, thr) =>
      val expected = math.min(4294967296L, 4294967296L * TextQueries.MixtureCap / n)
      assert(thr == expected, s"$src: thr $thr != $expected for n=$n")
    }
    // kept counts land near cap·min(1, ...) in expectation; hard bound:
    // no source exceeds its own corpus size and sampling is a subset
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    rows.foreach { case (src, n, _) => assert(kept(src) <= n) }
    // determinism: same result set on a second run
    val again = TextQueries.textMixture(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("G22 winnowing: a shared 6-token run guarantees a shared fingerprint; disjoint docs share none") {
    // guarantee threshold = gram + window - 1 = 6 consecutive tokens
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared five six seven eight nine"),
      (3L, "totally different words here nothing matches anything"),
      (4L, "ab"), // < 3 tokens: md5(text) fallback, still 1 fingerprint
    ).toDF("doc_id", "text")
    // reuse the driver query's plan via a temp parquet table
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    d.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.textWinnow(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._2 >= 1 && out(2L)._2 >= 1,
      s"docs sharing a 6-token run must share >= 1 fingerprint: $out")
    assert(out(3L)._2 == 0, s"disjoint doc shares nothing: $out")
    assert(out(4L) == ((1L, 0L)), s"short doc winnows to its text hash: $out")
  }

  test("G21 boilerplate: near-universal tokens within a source flagged, cross-source isolation") {
    // srcA: "tpl" in 3/3 docs (boiler at 8/10), "rare" in 1/3 (not);
    // srcB: "tpl" in only 1/2 docs — NOT boiler there (per-source df)
    val d = Seq(
      (1L, "tpl tpl rare", "srcA"),
      (2L, "tpl x", "srcA"),
      (3L, "tpl y", "srcA"),
      (4L, "tpl z", "srcB"),
      (5L, "w z", "srcB"),
    ).toDF("doc_id", "text", "source")
    val out = TextQueries.boilerplate(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: 3 tokens, "tpl" twice boiler (multiplicity counts)
    assert(out(1L) == ((3L, 2L, 0.6667)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 0.5)))
    // srcB: "z" is in 2/2 docs → boiler; "tpl" in 1/2 → not
    assert(out(4L) == ((2L, 1L, 0.5)), s"doc4 (tpl must NOT be boiler in srcB): ${out(4L)}")
    assert(out(5L) == ((2L, 1L, 0.5)))
  }

  test("G23 line dedup removes within-source recurring segments, keeps the rest in order") {
    // segments are LineSegTokens=5 tokens; "a b c d e" recurs in docs
    // 1+2 of srcA → removed from both; doc 3 (srcB) has the SAME
    // segment but no within-srcB partner → kept (per-source cut);
    // doc 4 = doc 1's exact duplicate → fully removed → cleaned = ""
    val seg = "a b c d e"
    val d = Seq(
      (1L, seg, "srcA"),
      (2L, s"$seg u v w x y", "srcA"),
      (3L, seg, "srcB"),
      (4L, seg, "srcA"),
    ).toDF("doc_id", "text", "source")
    val out = TextQueries.lineDedup(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4), r.getInt(5)))).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L && out(1L)._4 == 0)
    assert(out(1L)._3 == emptyMd5, s"fully-removed doc must hash empty: ${out(1L)}")
    // doc 2: first segment removed, second ("u v w x y") kept verbatim
    assert(out(2L) == ((2L, 1L, org.apache.commons.codec.digest.DigestUtils.md5Hex("u v w x y"), 9)),
      s"doc2: ${out(2L)}")
    // srcB's identical segment survives — recurrence is per-source
    assert(out(3L)._2 == 0L && out(3L)._4 == 9, s"doc3: ${out(3L)}")
    assert(out(4L)._2 == 1L && out(4L)._4 == 0)
  }

  test("packing bins by exclusive running sum: oversized doc occupies one bin") {
    // budget 512: docs of 300+300 fill bin 0 (cum 0,300), a 900-token
    // doc starts at cum 600 -> bin 1, next doc at cum 1500 -> bin 2
    val docs = Seq(
      ("s", 1L, ("w " * 300).trim), ("s", 2L, ("w " * 300).trim),
      ("s", 3L, ("w " * 900).trim), ("s", 4L, ("w " * 10).trim))
      .toDF("source", "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val out = docs
      .select(col("source"), col("doc_id"),
        size(TextQueries.tokens(col("text"))).as("n"))
      .withColumn("bin",
        floor(coalesce(sum(col("n")).over(w), lit(0L)) / TextQueries.PackBudget).cast("int"))
      .select("doc_id", "bin").as[(Long, Int)].collect().toSeq.sorted
    assert(out == Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2)))
  }

  test("stratified sample is deterministic and independent per stratum") {
    val a = TextQueries.textSample(spark, sfDir).collect().toSeq
    val b = TextQueries.textSample(spark, sfDir).collect().toSeq
    assert(a.nonEmpty && a.toSet == b.toSet)
    // salting with lang means the kept id-set differs per stratum (the
    // same doc_id would be kept in one lang and dropped in another)
    assert(a.forall(_.getInt(2) < TextQueries.SampleBucketMax))
  }

  test("gopher rules fire on the documented boundary cases") {
    val good = (1 to 60).map(i => s"the of word$i").mkString(" ") // 180 words, all alpha, stops
    val df = Seq(
      (1L, good),                          // passes every rule
      (2L, "the of and short"),            // < 50 words -> r_words 0
      (3L, (1 to 60).map(_ => "# ...").mkString(" ")), // symbols, no alpha, no stops
    ).toDF("doc_id", "text")
    val out = TextQueries.gopherRules(df)
      .select("doc_id", "r_words", "r_symbol", "r_alpha", "r_stops", "keep")
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(out(0) == ((1L, 1, 1, 1, 1, 1)))
    assert(out(1)._2 == 0 && out(1)._6 == 0) // word count fails
    assert(out(2)._3 == 0 && out(2)._4 == 0 && out(2)._5 == 0 && out(2)._6 == 0)
  }

  test("repetition counts duplicated n-gram occurrences, not distinct grams") {
    // "a b c a b c a b c d": 8 trigrams, "a b c" x3 + "b c a" x2 +
    // "c a b" x2 -> dup3 = 7, max3 = 3; n = 10; 6 five-grams,
    // "a b c a b" x2 + "b c a b c" x2 -> dup5 = 4
    val df = Seq((1L, "a b c a b c a b c d")).toDF("doc_id", "text")
    val r = TextQueries.repetition(df).collect()(0)
    assert(r.getLong(1) == 10L)          // n_tokens
    assert(r.getLong(2) == 3L)           // top3_count
    assert(r.getDouble(3) == 0.9)        // 3*3/10
    assert(r.getDouble(4) == 2.0)        // 5*4/10 (overlaps can exceed 1)
    assert(r.getInt(5) == 0 && r.getInt(6) == 0)
  }

  test("zipf profile ranks by (freq desc, token), head-cuts, exact shares and cum shares") {
    // corpus: a×4, b×2, c×2, d×1 → total 9; tie b/c breaks to b;
    // topK 3 drops d but the TOTAL still counts it
    val df = Seq((1L, "a b a c"), (2L, "a b c a d")).toDF("doc_id", "text")
    val got = TextQueries.zipfProfile(df, topK = 3)
      .select("rank", "token", "freq", "fr_product", "share", "cum_share")
      .as[(Int, String, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a", 4L, 4L, 0.444444, 0.444444),
      (2, "b", 2L, 4L, 0.222222, 0.666667),
      (3, "c", 2L, 6L, 0.222222, 0.888889)), s"$got")
  }

  test("repetition drops docs under five tokens (no 5-grams)") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val ids = TextQueries.repetition(df).select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(2L))
  }

  test("G54 Kneser-Ney: plain-Scala reference parity and EXACT normalization of the smoothed distribution") {
    // repeated structure so discounting, fertility backoff, unseen
    // bigrams over seen prefixes, and full prefix backoff ALL fire;
    // ids 8/13/28 are non-train under the G5 md5 split, and doc 8's
    // tokens are absent from every other doc → pure-backoff document
    val docs: Seq[(Long, String)] = Seq(
      (0L, "a b a b c"), (1L, "a b c d"), (2L, "b c a b"), (3L, "d a b c"),
      (4L, "c d a b a"), (5L, "e f a"), (6L, "a b e f"), (7L, "f e d c b a"),
      (8L, "zz qq ww zz"), (9L, "b a d c"), (10L, "c c a"), (11L, "d d b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kn").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.textKnScore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    // independent reference: java MessageDigest split + Scala-map KN
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(s"split|$id").take(4), 16) < TextQueries.TrainBucketMax
    assert(!isTrain(8L), "fixture doc 8 must be non-train")
    val bigramsOf = docs.toMap.view.mapValues(
      _.split(" +").toSeq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq).toMap
    val train = docs.map(_._1).filter(isTrain).flatMap(bigramsOf)
    val cBg = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cPre = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1f = cBg.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = cBg.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = cBg.size.toLong
    val vocab = train.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
    def pcont(w: String): Double = (n1b.getOrElse(w, 0L) + 1).toDouble / (types + vocab)
    def p(t1: String, t2: String): Double = cPre.get(t1) match {
      case Some(cp) =>
        (math.max(cBg.getOrElse((t1, t2), 0L).toDouble - 0.75, 0.0)
          + 0.75 * n1f(t1) * pcont(t2)) / cp
      case None => pcont(t2)
    }
    docs.foreach { case (id, _) =>
      val bgs = bigramsOf(id)
      val exp = bgs.map { case (a, b) => -math.log(p(a, b)) / math.log(2.0) }
      val (nB, nBack, s) = got(id)
      assert(nB == bgs.size.toLong, s"doc $id n_bigrams")
      assert(nBack == bgs.count(b => !cPre.contains(b._1)).toLong,
        s"doc $id n_backoff")
      assert(math.abs(s - exp.sum / exp.size) < 2e-4,
        s"doc $id surprise: got $s expected ${exp.sum / exp.size}")
    }
    assert(got(8L)._2 == got(8L)._1, "doc 8 must be pure backoff")
    // THE KN invariant: the add-one continuation distribution keeps
    // every seen prefix's smoothed distribution EXACTLY normalized —
    // sum over the vocab of P(w|t1) = (c_pre − D·n1f)/c_pre +
    // D·n1f/c_pre · Σpcont, and Σpcont = (T + V)/(T + V) = 1
    val vocabSeq = train.flatMap(pr => Seq(pr._1, pr._2)).distinct
    cPre.keys.foreach { t1 =>
      val mass = vocabSeq.map(w => p(t1, w)).sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"P(.|$t1) must normalize exactly, got $mass")
    }
  }

  test("G49 DSIR: target-like raw docs outrank target-unlike ones; n_feats counts unigrams+bigrams") {
    // target slice (en) speaks "good stuff"; the de corpus has one
    // doc that ALSO says "good stuff" (target-like) and several that
    // say distinct junk. DSIR must weight the target-like de doc
    // above every junk de doc — that ordering IS the method.
    val d = (Seq(
      (1L, "good stuff", "en"), (2L, "good stuff", "en"),
      (3L, "good stuff here", "en"),
      (10L, "good stuff", "de")) ++
      (11L to 14L).map(i => (i, s"junk$i noise$i", "de")))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    d.withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.textDsir(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // "good stuff" = 2 unigrams + 1 bigram
    assert(out(10L)._1 == 3L, s"n_feats: ${out(10L)}")
    (11L to 14L).foreach { j =>
      assert(out(10L)._2 > out(j)._2,
        s"target-like doc 10 must outweigh junk doc $j: $out")
    }
    // target docs score their own distribution highest of all
    assert(out(1L)._2 >= out(10L)._2, s"$out")
  }

  test("G59 hashed linear classifier: scores equal an independent in-memory scorer over unigrams+bigrams, corpus-wide") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def wgt(feat: String): Long = {
      val bucket = java.lang.Long.parseLong(md5hex(feat).take(8), 16) %
        TextQueries.QcBuckets
      java.lang.Long.parseLong(md5hex(s"qw|$bucket").take(8), 16) %
        (2 * TextQueries.QcWgtRange + 1) - TextQueries.QcWgtRange
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.map { case (id, text) =>
      val toks = text.trim.split(" +").filter(_.nonEmpty).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val score = feats.map(wgt).sum
      id -> ((feats.size.toLong, score, (if (score >= 0) 1 else 0)))
    }
    val got = TextQueries.textClassifier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(4)))).toMap
    assert(got.size == docs.size, "one verdict row per document")
    assert(got == want,
      s"classifier drift on ${got.count(kv => want.get(kv._1) != Some(kv._2))} docs")
    // the hashing trick genuinely collides at this bucket count —
    // the property that makes the weight table O(buckets), not O(vocab)
    val feats = docs.values.flatMap { t =>
      val toks = t.trim.split(" +").filter(_.nonEmpty).toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }.toSet
    val buckets = feats.map(f =>
      java.lang.Long.parseLong(md5hex(f).take(8), 16) % TextQueries.QcBuckets)
    assert(buckets.size < feats.size,
      s"the hash must genuinely collide (${feats.size} feats -> ${buckets.size} buckets)")
  }
}
