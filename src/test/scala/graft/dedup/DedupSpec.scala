package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (0L, base),
      (1L, base),                                            // exact dup of 0
      (2L, base.replace("lazy", "sleepy")),                  // near dup of 0
      (3L, "completely different words about spark shuffles and partitions everywhere"),
    ).toDF("doc_id", "text")
  }

  test("E1 exact dedup groups identical docs under min id") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out(0L) == (0L, 2L, 0))
    assert(out(1L) == (0L, 2L, 1)) // dup, canonical 0
    assert(out(2L)._2 == 1L && out(3L)._2 == 1L)
  }

  test("E2 LSH banding finds near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dups must collide")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)), "near dup should collide in some band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not collide")
  }

  test("E3 simhash: near dups close in hamming, unrelated far") {
    val sh = Dedup.simhashDf(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) == sh(1L))
    assert(ham(sh(0L), sh(2L)) <= 8, s"near dup hamming was ${ham(sh(0L), sh(2L))}")
    assert(ham(sh(0L), sh(3L)) > 8, s"unrelated hamming was ${ham(sh(0L), sh(3L))}")
  }

  test("E3b simhash pairs: exact dups collide at hamming 0, banding never misses <=3") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0), "exact dups must pair at hamming 0")
    // pigeonhole: every pair within the bound MUST be found by banding —
    // cross-check against the exhaustive hamming matrix
    val sims = Dedup.simhashDf(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exhaustive = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b)).toSet
    assert(pairs.keySet == exhaustive)
  }

  test("E4 jaccard verification keeps true near dups with correct score") {
    val rows = Dedup.jaccardPairs(corpus, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((0L, 1L)) == 1.0)
    rows.get((0L, 2L)).foreach(j => assert(j > 0.5 && j < 1.0))
    assert(!rows.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("E6 survivors: exact + near dups cluster transitively, min id kept") {
    val out = Dedup.survivors(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // docs 0,1 (exact) and 2 (near dup of 0) form ONE cluster via closure
    assert(out(0L) == (0L, 1))
    assert(out(1L) == (0L, 0))
    assert(out(2L) == (0L, 0))
    assert(out(3L) == (3L, 1), "unrelated doc survives as its own cluster")
  }

  test("E5 embedding pairs: identical vectors in a block score 1.0") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f), 1), // other block: never paired with 0/1
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("E8 semantic survivors: min id kept per dup set, cross-cluster twins both survive") {
    import spark.implicits._
    // cluster 0: vecs 1,2,3 identical (1 kept, 2+3 removed — both have
    // the smaller partner 1) + orthogonal 4 (kept); cluster 1: vec 5
    // IDENTICAL to 1 but in another cluster → kept (the SemDeDup
    // recall trade is pinned, not accidental)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val asg = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0), (5L, 1))
      .toDF("vec_id", "cluster")
    val out = Dedup.semanticSurvivors(vecs, asg, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1), s"$out")
  }

  test("E9 containment: subset doc scores 1.0 with direction; low-overlap pair filtered") {
    import spark.implicits._
    // doc 1 ⊂ doc 2 (every shingle of 1 in 2, but 2 has many more) —
    // Jaccard is low (2/6), containment a_in_b = 1.0. doc 3 shares
    // one rare shingle with 2 → candidate, but containment < 0.8.
    // doc 4 is disjoint → never a candidate.
    val sets = Seq(
      (1L, Seq("s1", "s2")),
      (2L, Seq("s1", "s2", "s3", "s4", "s5", "s6")),
      (3L, Seq("s6", "x1", "x2", "x3")),
      (4L, Seq("y1", "y2")),
    ).toDF("id", "sh")
    val out = Dedup.containmentFromSets(sets, maxDf = 20, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getString(3)))).toMap
    assert(out == Map((1L, 2L) -> ((1.0, "a_in_b"))), s"$out")
  }

  test("E9 rank budget: per-shingle pair mass is linear, deterministic, and exactly the md5-rank predicate; budget >= df-1 is exact") {
    import spark.implicits._
    // 12 docs sharing ONE rare shingle (df=12 ≤ maxDf): unbudgeted
    // pairs = C(12,2) = 66; with budget B the kept pairs are exactly
    // those whose lower md5-rank endpoint ≤ B → B·(d−1) − B(B−1)/2 =
    // 4·11 − 6 = 38 for B=4. Every set is identical so verification
    // passes all candidates — the counts isolate BLOCKING semantics.
    val sets = (1L to 12L).map(i => (i, Seq("z"))).toDF("id", "sh")
    def pairs(budget: Int): Set[(Long, Long)] =
      Dedup.containmentFromSets(sets, maxDf = 20, threshold = 0.0,
        rankBudget = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pairs(11)
    assert(all.size == 66, "budget >= df-1 must keep every pair (the dial's exact end)")
    val kept = pairs(4)
    assert(kept.size == 38, s"B(d-1)-B(B-1)/2 pairs expected, got ${kept.size}")
    assert(kept.subsetOf(all))
    assert(kept == pairs(4), "the budget must be deterministic across runs")
    // independently recompute the md5 rank lottery in plain Scala and
    // check the kept set IS the predicate min(rank_a, rank_b) <= 4
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rank = (1L to 12L).sortBy(i => (md5hex(s"z|$i"), i))
      .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val expect = (for {
      a <- 1L to 12L; b <- 1L to 12L
      if a < b && math.min(rank(a), rank(b)) <= 4
    } yield (a, b)).toSet
    assert(kept == expect, "kept pairs must be exactly the rank predicate")
  }

  test("E9 persisted pair table bakes the valve params into its NAME: a dial change cannot silently read a stale frame") {
    // r15 advice: the budget/maxDf/threshold are part of the persisted
    // rows — key the catalog name on them so a parameter change MISSES
    // the memo and rebuilds instead of serving old-budget pairs.
    DedupQueries.dedupContainment(spark, sfDir).limit(1).collect()
    val params = s"b${DedupQueries.ContainmentRankBudget}_" +
      s"df${DedupQueries.ContainmentMaxDf}_" +
      s"t${(DedupQueries.ContainmentThreshold * 100).round}"
    val names = spark.catalog.listTables().collect().map(_.name)
    assert(names.exists(n => n.startsWith(s"graft_containment_$params")),
      s"containment table must be keyed on valve params: $params not in " +
        names.filter(_.startsWith("graft_containment")).mkString(","))
  }

  test("E9 containment broadcasts the shingle sets ONLY under the configured threshold") {
    import spark.implicits._
    // an unconditional broadcast() hint bypasses
    // autoBroadcastJoinThreshold entirely — at corpus scale the
    // one-array-per-document frame is far past any broadcast budget and
    // the hint turns a graceful shuffle join into an OOM (r13 advisor).
    // The hint must be GATED on the optimizer's size estimate: present
    // for a small side (it is the measured 4× win at bench SF), absent
    // the moment the session disables broadcasting.
    def hints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    val sets = Seq((1L, Seq("s1", "s2")), (2L, Seq("s1", "s2", "s3")))
      .toDF("id", "sh")
    assert(hints(Dedup.containmentFromSets(sets)).nonEmpty,
      "a tiny shingle-set side must keep the broadcast win")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(hints(Dedup.containmentFromSets(sets)).isEmpty,
      "with broadcasting disabled the hint must not be forced")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("E10 substring spans: shared run merges to one maximal span, unique doc zero") {
    import spark.implicits._
    // docs 0 and 1 share chars 1..14 ("ABCDEFGHIJKLMN") and diverge
    // after; w=10 → duplicated starts p=1..5 in each (one island),
    // maximal span = 5 + 10 - 1 = 14. doc 2 shares nothing. doc 3
    // repeats a 12-char block WITHIN itself at p=1 and p=13 → its
    // starts {1,2,3,13,14,15} form TWO islands (runs of 3), max span
    // 3 + 9 = 12.
    val docs = Seq(
      (0L, "ABCDEFGHIJKLMN" + "0qrstuvwxy"),
      (1L, "ABCDEFGHIJKLMN" + "1zzzzzzzzz"),
      (2L, "totally unrelated chars 9876"),
      (3L, "PQRSTUVWXYZ@" + "PQRSTUVWXYZ@"),
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, "doc_id", "text", w = 10, flagChars = 14)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out(0L) == ((5L, 1L, 14L, 1)), s"$out")
    assert(out(1L) == ((5L, 1L, 14L, 1)))
    assert(out(2L) == ((0L, 0L, 0L, 0)))
    assert(out(3L) == ((6L, 2L, 12L, 0)), s"$out")
  }

  test("E26 decontamination ≡ an independent in-memory gram-overlap pass; both row classes present") {
    val docs = graft.Tables.documents(spark, sfDir)
    val n = DedupQueries.DecontamN
    def grams(t: String): Set[String] = {
      val ws = t.trim.split(" +").toSeq
      if (ws.length < n) Set.empty
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    def bucket(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$id".getBytes("UTF-8"))
      Integer.parseInt(f"${h(0) & 0xff}%02x${h(1) & 0xff}%02x", 16)
    }
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (train, eval) = rows.partition { case (id, _) =>
      bucket(id) < graft.text.TextQueries.TrainBucketMax }
    val evalGrams = eval.iterator.flatMap(x => grams(x._2)).toSet
    val want = train.map { case (id, t) =>
      val hit = grams(t).count(evalGrams.contains).toLong
      id -> ((hit, if (hit > 0) 1 else 0))
    }.toMap
    val got = DedupQueries.dedupDecontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == want, s"decontamination diverged on ${
      got.count(kv => want.get(kv._1) != Some(kv._2))} docs")
    assert(got.values.exists(_._2 == 1) && got.values.exists(_._2 == 0),
      "the fixture must exercise BOTH row classes")
  }
}
