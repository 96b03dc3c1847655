package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G33/G34: the HOF-projection Viterbi-EM trainer must reproduce an
  * independent in-memory unigram-LM implementation exactly — the
  * BpeSpec parity convention — on a hand-checkable fixture AND the
  * real sf corpus; plus direct pins on the DP tie-break and the
  * zero-shuffle E-step plan shape. */
class UnigramSpec extends SparkSpec {

  private val S = Unigram.Scale
  private def ilog(x: Long): Long = math.round(math.log(x.toDouble) * S)

  /** Independent reference: seed → Viterbi-EM with the same
    * fixed-point integer log weights and longer-piece tie-break. */
  private def refTrain(wordCounts: Map[String, Long])
      : (Map[String, Long], Map[String, Long]) = {
    val sub = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, n) <- wordCounts; l <- 1 to Unigram.MaxPieceLen if l <= w.length;
         st <- 0 to w.length - l)
      sub(w.substring(st, st + l)) += n
    val chars = sub.filter(_._1.length == 1).toMap
    val multi = sub.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(Unigram.MultiBudget).toMap
    var counts: Map[String, Long] = chars ++ multi
    val vocab = counts.keySet
    def weights(c: Map[String, Long]): Map[String, Long] = {
      val lt = ilog(c.values.map(_ + 1L).sum)
      c.map { case (p, n) => p -> (ilog(n + 1L) - lt) }
    }
    var wt = weights(counts)
    def viterbi(w: String): List[String] = {
      val dp = Array.fill(w.length + 1)((Long.MinValue, 0))
      dp(0) = (0L, 0)
      for (j <- 1 to w.length; l <- 1 to Unigram.MaxPieceLen if l <= j)
        wt.get(w.substring(j - l, j)).foreach { g =>
          val cand = dp(j - l)._1 + g
          if (cand >= dp(j)._1) dp(j) = (cand, l) // ascending l, >=: longer wins ties
        }
      var j = w.length; var out = List.empty[String]
      while (j > 0) { val l = dp(j)._2; out = w.substring(j - l, j) :: out; j -= l }
      out
    }
    for (_ <- 1 to Unigram.EmRounds) {
      val c = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, n) <- wordCounts; p <- viterbi(w)) c(p) += n
      counts = vocab.iterator.map(p => p -> c(p)).toMap
      wt = weights(counts)
    }
    (counts, wt)
  }

  private def wordCountsOf(docs: org.apache.spark.sql.DataFrame): Map[String, Long] =
    Bpe.pretokenize(docs, "text").select("w", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("G33 DP tie-break: equal scores hand the slot to the LONGER last piece, recursively") {
    import spark.implicits._
    val words = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("w", "n")
    // exact tie by construction: w(aa) = 2·w(a), so every segmentation
    // of a^k scores identically — the pick is pure tie-break
    val wt = Map("a" -> -100L, "aa" -> -200L)
    val segs = Unigram.segment(words, wt).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // reversed-lengths lexicographic max: [2,2] beats [2,1],[1,2],[1,1,1,1]
    assert(segs("aaaa") == "aa|aa", s"got ${segs("aaaa")}")
    // [2,1] reversed is (1 then 2)? No: reversed = last piece first →
    // 'a|aa' has reversed lengths [2,1], which beats 'aa|a' ([1,2])
    // and 'a|a|a' ([1,1,1])
    assert(segs("aaa") == "a|aa", s"got ${segs("aaa")}")
  }

  test("G33 a word unsegmentable under a caller-supplied map yields NULL, never a wrapped-overflow garbage walk") {
    import spark.implicits._
    // 'a' is absent: position 1 is unreachable; without the
    // reachability guard MinValue + wgt would wrap positive and win
    val segs = Unigram.segment(Seq(("ab", 1L), ("bb", 1L)).toDF("w", "n"),
      Map("b" -> -1L, "bb" -> -1L)).collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(segs("ab").isEmpty, s"unsegmentable word must be NULL: ${segs("ab")}")
    assert(segs("bb").contains("bb"), s"segmentable words unaffected: ${segs("bb")}")
  }

  test("G33 the E-step is ONE shuffle-free codegen'd projection (broadcast map, no UDF)") {
    import spark.implicits._
    val words = Seq(("hello", 3L), ("world", 2L)).toDF("w", "n")
      .repartition(4).localCheckpoint(true)
    val seg = Unigram.segment(words, Map("h" -> -1L, "e" -> -1L, "l" -> -2L,
      "o" -> -1L, "w" -> -3L, "r" -> -1L, "d" -> -1L, "lo" -> -2L, "llo" -> -3L))
    val a = graft.monitor.PlanAudit.audit(seg)
    assert(a.shuffleExchanges == 0, s"Viterbi must not shuffle: $a")
    assert(a.wholeStageSpans >= 1, s"Viterbi must run codegen'd: $a")
  }

  test("G33/G34 parity vs the independent reference on a fixture") {
    import spark.implicits._
    val docs = Seq("low low lower lowest", "newer new newest low",
      "banana bandana", "abracadabra").toDF("text")
    val (refCounts, refWt) = refTrain(wordCountsOf(docs))
    val got = Unigram.trainedVocab(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refCounts, s"final EM counts diverge:\n got=$got\n ref=$refCounts")
    // encode face: every word segments as the reference does under the
    // FINAL weights
    val wcs = wordCountsOf(docs)
    val dp = Unigram.segment(wcs.keys.toSeq.map(w => (w, 1L)).toDF("w", "n"), refWt)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    wcs.keys.foreach { w =>
      val expect = {
        var j = w.length
        val dpArr = Array.fill(w.length + 1)((Long.MinValue, 0)); dpArr(0) = (0L, 0)
        for (jj <- 1 to w.length; l <- 1 to Unigram.MaxPieceLen if l <= jj)
          refWt.get(w.substring(jj - l, jj)).foreach { g =>
            val cand = dpArr(jj - l)._1 + g
            if (cand >= dpArr(jj)._1) dpArr(jj) = (cand, l)
          }
        var out = List.empty[String]
        while (j > 0) { val l = dpArr(j)._2; out = w.substring(j - l, j) :: out; j -= l }
        out.mkString("|")
      }
      assert(dp(w) == expect, s"'$w': got ${dp(w)}, ref $expect")
    }
  }

  test("G36 prune-and-refit ≡ the reference: chars + top-K surviving pieces, one more E-step") {
    import spark.implicits._
    val docs = Seq("low low lower lowest", "newer new newest low",
      "banana bandana", "abracadabra").toDF("text")
    val wcs = wordCountsOf(docs)
    val (cnts, _) = refTrain(wcs)
    val keepMulti = cnts.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(Unigram.KeepMulti)
    val prunedCounts = cnts.filter(_._1.length == 1) ++ keepMulti
    val vocabP = prunedCounts.keySet
    val lt = ilog(prunedCounts.values.map(_ + 1L).sum)
    val wtP = prunedCounts.map { case (p, n) => p -> (ilog(n + 1L) - lt) }
    def viterbi(w: String): List[String] = {
      val dp = Array.fill(w.length + 1)((Long.MinValue, 0)); dp(0) = (0L, 0)
      for (j <- 1 to w.length; l <- 1 to Unigram.MaxPieceLen if l <= j)
        wtP.get(w.substring(j - l, j)).foreach { g =>
          val cand = dp(j - l)._1 + g
          if (cand >= dp(j)._1) dp(j) = (cand, l)
        }
      var j = w.length; var out = List.empty[String]
      while (j > 0) { val l = dp(j)._2; out = w.substring(j - l, j) :: out; j -= l }
      out
    }
    val cP = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, n) <- wcs; p <- viterbi(w)) cP(p) += n
    val expect = vocabP.iterator.map(p => p -> cP(p)).toMap
    val got = Unigram.trainedVocabPruned(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"pruned refit diverges:\n got=$got\n ref=$expect")
    // the prune actually shrank the multi-char population to the budget
    assert(got.keys.count(_.length >= 2) <= Unigram.KeepMulti)
  }

  test("G35 corpus piece counts ≡ the reference segmentation, summed per document") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "newest banana"), (3L, "  "))
      .toDF("doc_id", "text")
    val (_, refWt) = refTrain(wordCountsOf(docs.select("text")))
    def viterbiLen(w: String): Long = {
      val dp = Array.fill(w.length + 1)((Long.MinValue, 0)); dp(0) = (0L, 0)
      for (j <- 1 to w.length; l <- 1 to Unigram.MaxPieceLen if l <= j)
        refWt.get(w.substring(j - l, j)).foreach { g =>
          val cand = dp(j - l)._1 + g
          if (cand >= dp(j)._1) dp(j) = (cand, l)
        }
      var j = w.length; var k = 0L
      while (j > 0) { j -= dp(j)._2; k += 1 }
      k
    }
    val expect = Map(
      1L -> (3L, Seq("low", "low", "lower").map(viterbiLen).sum),
      2L -> (2L, Seq("newest", "banana").map(viterbiLen).sum),
      3L -> (0L, 0L)) // the zero-word doc keeps its zero row
    val got = Unigram.pieceCounts(docs, "text", "g35fixture")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect, s"got $got, expected $expect")
  }

  test("G33 parity vs the reference on the real sf corpus") {
    val docs = graft.Tables.documents(spark, sfDir).select("text")
    val (refCounts, _) = refTrain(wordCountsOf(docs))
    val got = Unigram.trainedVocab(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refCounts)
    // ranking is (cnt desc, piece asc), dense from 1
    val ranked = Unigram.trainedVocab(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(ranked.map(_._3).sorted.toSeq == (1 to ranked.length).toSeq)
    assert(ranked.sortBy(_._3).sliding(2).forall {
      case Array((p1, c1, _), (p2, c2, _)) => c1 > c2 || (c1 == c2 && p1 < p2)
      case _ => true
    })
  }

  test("G56 byte fallback: OOV chars segment to UTF-8 byte pieces; trained pieces are never shadowed; fallback off still NULLs") {
    import spark.implicits._
    val wt = Map("a" -> -100L, "b" -> -150L, "ab" -> -180L)
    val words = Seq(("abé", 1L), ("a€b", 1L), ("ab", 1L)).toDF("w", "n")
    val withFb = words.withColumn("seg",
      Unigram.viterbiSeg(col("w"), wt, byteFallback = true))
    val segs = withFb.collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // in-vocab word: identical to the no-fallback DP ("ab" −180 still
    // beats "a|b" −250 — ByteWgt can never compete with trained pieces)
    assert(segs("ab") == "ab", s"got ${segs("ab")}")
    // 2-byte OOV char at the end: é = C3 A9
    assert(segs("abé") == "ab|<0xC3>|<0xA9>", s"got ${segs("abé")}")
    // 3-byte OOV char MID-word: € = E2 82 AC — trained pieces resume
    // on the far side, so the fallback is per-character, not per-word
    assert(segs("a€b") == "a|<0xE2>|<0x82>|<0xAC>|b", s"got ${segs("a€b")}")
    // the DP stays one shuffle-free codegen'd projection with the
    // fallback branch in place
    val audit = graft.monitor.PlanAudit.audit(withFb)
    assert(audit.shuffleExchanges == 0, s"fallback must not shuffle: $audit")
    // and WITHOUT fallback the same OOV words are NULL — exactly the
    // production failure the G56 face exists to close
    val nulls = words.withColumn("seg", Unigram.viterbiSeg(col("w"), wt))
      .collect().map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(nulls("abé").isEmpty && nulls("a€b").isEmpty &&
      nulls("ab").contains("ab"))
  }

  test("G60 sample-first unigram: an all-true sample degenerates to the full encode; a sample missing a char yields NULL for its words, never a dropped row") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val full = Unigram.encodeVocab(docs, "text",
      graft.store.GraftStore.dirKey(sfDir))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val degenerate = Unigram.encodeVocabSampled(docs, "text", lit(true))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(degenerate == full)
    // a sample that excludes the only doc containing 'z': the z-words
    // keep their rows with NULL seg (the G56 fallback's row class)
    val d = Seq((1L, "ab ba ab"), (2L, "zab")).toDF("doc_id", "text")
    val out = Unigram.encodeVocabSampled(d, "text", col("doc_id") === 1L)
      .collect().map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(out.keySet == Set("ab", "ba", "zab"),
      "the encode covers the WHOLE corpus vocabulary")
    assert(out("zab").isEmpty, "an unsampleable char -> NULL seg")
    assert(out("ab").nonEmpty && out("ba").nonEmpty)
  }
}
