package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private val dataDir = "/root/testdata/sf0.01" // embeddings table lives at all SFs

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("n_id")).toSet }

  test("F1 brute-force top-k: k rows per query, descending cosine, no self") {
    val emb = Tables.embeddings(spark, dataDir)
    val out = Similarity.bruteTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 5), 3).cache()
    val rows = out.collect()
    assert(rows.length == 5 * 3)
    assert(!rows.exists(r => r.getAs[Long]("q_id") == r.getAs[Long]("n_id")))
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    out.unpersist()
  }

  test("F2 ANN-LSH results are a subset-quality approximation with measurable recall") {
    val emb = Tables.embeddings(spark, dataDir)
    val truth = topkSets(Similarity.bruteTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), 5))
    val ann = topkSets(SimQueries.simAnnLsh(spark, dataDir))
    // every ANN hit shares the query bucket; recall is positive but
    // not required to be 1 — assert it's meaningfully above zero
    val recalls = truth.keys.toSeq.map { q =>
      val t = truth(q); val a = ann.getOrElse(q, Set.empty)
      a.intersect(t).size.toDouble / t.size
    }
    assert(recalls.sum / recalls.size > 0.2,
      s"mean recall too low: ${recalls.sum / recalls.size}")
  }

  test("F3 IVF coarse search: probing more lists improves or maintains recall") {
    val emb = Tables.embeddings(spark, dataDir).cache()
    val queries = emb.filter(col("vec_id") < 10)
    val truth = topkSets(Similarity.bruteTopK(emb, "vec_id", "embedding", queries, 5))
    def recall(nprobe: Int): Double = {
      val got = topkSets(Similarity.ivfSearch(emb, "vec_id", "embedding",
        queries, 5, nCentroids = 8, nprobe = nprobe))
      truth.keys.toSeq.map { q =>
        got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / truth(q).size
      }.sum / truth.size
    }
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    assert(r1 > 0.0)
    assert(r4 >= r1, s"recall must not drop with more probes: $r1 -> $r4")
    assert(r8 >= r4 && r8 > 0.9, s"probing all lists should approach exact: $r8")
    emb.unpersist()
  }

  test("F6 int8 quantization: range, exact max element, zero vector, error bound") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // max|x| = 1.0 -> q = (64, -127, 32)
      (2L, Seq(0.0f, 0.0f, 0.0f)),   // all-zero -> zeros, no div-by-zero
      (3L, Seq(2.0f, 1.0f, -2.0f)))  // max at both signs -> ±127
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(q == Map(
      (1L, 0) -> 64, (1L, 1) -> -127, (1L, 2) -> 32,
      (2L, 0) -> 0, (2L, 1) -> 0, (2L, 2) -> 0,
      (3L, 0) -> 127, (3L, 1) -> 64, (3L, 2) -> -127))
    // reconstruction error bound on real vectors: |x - q*scale| <= scale/2
    val emb = Tables.embeddings(spark, dataDir).limit(50)
    val ex = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"), col("x").cast("double").as("x"))
    val scale = ex.groupBy("vec_id").agg((max(abs(col("x"))) / 127.0).as("scale"))
    val err = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .join(ex, Seq("vec_id", "dim")).join(scale, "vec_id")
      .filter(col("scale") > 0)
      .select(max(abs(col("x") - col("q") * col("scale")) / col("scale")).as("m"))
      .first().getDouble(0)
    assert(err <= 0.5 + 1e-9, s"quantization error exceeds half a step: $err")
  }

  test("F8 PQ-ADC with the corpus inside the codebook is exact squared L2") {
    import spark.implicits._
    // every vector encodes to itself (sub-distance 0), so ADC(q, x)
    // collapses to the true ||q − x||² — closed-form expectations
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 2f)), (3L, Array(3f, 3f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, "vec_id", "embedding",
        queryMaxId = 1, k = 3, m = 2, subDim = 1, codebookSize = 4)
      .select("q_id", "n_id", "adc", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._4)
    assert(out == Seq((0L, 1L, 1.0, 1), (0L, 2L, 4.0, 2), (0L, 3L, 18.0, 3)))
  }

  test("F8 PQ-ADC recall against brute force is non-trivial on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = topkSets(Similarity.bruteTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 5), 5))
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
        queryMaxId = 5, k = 5, m = 8, subDim = 8, codebookSize = 16)
      .select(col("q_id"), col("n_id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    // PQ ranks by L2 over a 16-entry codebook — coarse, but it must
    // recover a measurable share of the true cosine neighbors
    val hits = brute.map { case (q, s) => (pq.getOrElse(q, Set()) & s).size }.sum
    assert(hits > 0, "PQ found no true neighbors at all")
  }

  test("F7 MIPS-via-ANN returns true inner products and recovers exact-MIPS neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.mipsTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 5)
      .select(col("q_id"), col("n_id"), col("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.mipsViaAnn(emb, "vec_id", "embedding",
        queryMaxId = 5, k = 5,
        tables = Similarity.planeSigns(24, 65).grouped(3).toSeq)
      .select(col("q_id"), col("n_id"), col("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ann.nonEmpty, "no candidates survived the augmented buckets")
    // scores are the ORIGINAL dot products: any pair also in the exact
    // top-k must carry the identical rounded dot
    ann.foreach { case (pair, d) =>
      exact.get(pair).foreach(ed => assert(ed == d, s"$pair: $d != $ed"))
    }
    // the reduction must recover a measurable share of true neighbors
    val hits = ann.map(_._1).count(exact.contains)
    assert(hits > 0, "MIPS-via-ANN recovered no exact-MIPS neighbors")
  }

  test("F11 IVF-PQ at full probe equals whole-corpus PQ; at nprobe=1 returns <= k per query") {
    val emb = Tables.embeddings(spark, dataDir)
    val nC = 4
    val full = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        queryMaxId = 5, k = 5, nCentroids = nC, nprobe = nC,
        m = 8, subDim = 8, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
        queryMaxId = 5, k = 5, m = 8, subDim = 8, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full == pq, "probing every list must reduce IVF-PQ to plain PQ")
    val narrow = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        queryMaxId = 5, k = 5, nCentroids = nC, nprobe = 1,
        m = 8, subDim = 8, codebookSize = 16)
      .collect().groupBy(_.getLong(0))
    assert(narrow.nonEmpty && narrow.values.forall(_.length <= 5))
  }

  test("F10 int8 k-means separates two obvious clusters and assigns every vector") {
    import spark.implicits._
    // 2-dim quantized rows: vecs 0-2 near (100, 0), vecs 3-5 near
    // (0, 100); seeds are vec 0 and vec 1 (both in cluster A), so the
    // test also proves the centroid UPDATE pulls a seed across
    val rows = Seq(
      (0L, 0, 100), (0L, 1, 0), (1L, 0, 90), (1L, 1, 10), (2L, 0, 95), (2L, 1, 5),
      (3L, 0, 0), (3L, 1, 100), (4L, 0, 10), (4L, 1, 90), (5L, 0, 5), (5L, 1, 95),
    ).toDF("vec_id", "dim", "q")
    val out = Similarity.kmeansInt8(rows, k = 2, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 6, s"every vector assigned: $out")
    assert(Set(0L, 1L, 2L).map(out).size == 1, s"cluster A coherent: $out")
    assert(Set(3L, 4L, 5L).map(out).size == 1, s"cluster B coherent: $out")
    assert(out(0L) != out(3L), s"clusters separate: $out")
  }

  test("F12 binary pack sets the sign bit for dim 64; Hamming ranks by sign disagreement") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // v0: all positive (bits = -1 two's complement: every bit incl. 63);
    // v1: identical signs; v2: last dim flipped (hamming 1 from v0);
    // v3: all negative (hamming 64)
    def vec(f: Int => Float) = (0 until 64).map(f).toArray
    val vecs = Seq(
      (0L, vec(_ => 1.0f)), (1L, vec(_ => 2.0f)),
      (2L, vec(i => if (i == 63) -1.0f else 1.0f)),
      (3L, vec(_ => -1.0f)),
    ).toDF("vec_id", "embedding")
    val packed = Similarity.binaryPack(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed(0L) == -1L, s"64 sign bits = all-ones long: ${packed(0L)}")
    assert(packed(2L) == Long.MaxValue, s"bit 63 clear: ${packed(2L)}")
    assert(packed(3L) == 0L)
    val top = Similarity.hammingTopK(vecs, "vec_id", "embedding",
        numQueries = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3))).toSeq.sortBy(_._3)
    assert(top == Seq((1L, 0, 1), (2L, 1, 2), (3L, 64, 3)), s"$top")
  }

  test("F13 rerank with full candidates equals brute force; narrow candidates rescore by true cosine") {
    val emb = Tables.embeddings(spark, dataDir)
    val n = emb.count().toInt
    // the F11 full-probe invariant: nominating EVERY vector reduces
    // the two-stage stack to brute-force cosine, bit for bit
    val full = Similarity.rerankTopK(emb, "vec_id", "embedding",
        numQueries = 5, candK = n, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute, "full candidate set must recover brute force exactly")
    // narrow candidates: every reranked neighbor must come from the
    // bit pass's candidate set, ordered by true cosine
    val cand = Similarity.hammingTopK(emb, "vec_id", "embedding", 5, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.rerankTopK(emb, "vec_id", "embedding", 5, 20, 5)
      .collect()
    assert(rr.nonEmpty && rr.forall(r => cand((r.getLong(0), r.getLong(1)))),
      "reranked results must be Hamming candidates")
    rr.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.sameElements(byRank.sortBy(-(_: Double))),
        "rescored ranks must follow true cosine order")
    }
  }

  test("F16/F22 beam + recall consumers plan over the STORED k-NN graph table") {
    val tbl = SimQueries.knnGraphTable(spark, dataDir)
    // the stored table holds the full graph output (cos + rnk preserved)
    val stored = spark.table(tbl)
    assert(stored.columns.toSeq == Seq("src_id", "nbr_id", "cos", "rnk"))
    assert(stored.count() > 0)
    // sim_knn_graph_lsh and sim_knn_recall read the table directly in
    // their final plan; simBeam's hops checkpoint eagerly (the scan
    // happens at construction), so its graph frame is asserted as the
    // frame the loop joins against.
    for (q <- Seq(SimQueries.simKnnGraphLsh(spark, dataDir),
        SimQueries.simKnnRecall(spark, dataDir),
        SimQueries.storedKnnGraph(spark, dataDir))) {
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.catalogTable.exists(_.identifier.table == tbl) => r
      }
      assert(scans.nonEmpty,
        s"consumer must read the stored table $tbl, not rebuild the graph")
    }
    // beam search still answers k rows per query off the stored graph
    val beam = SimQueries.simBeam(spark, dataDir)
    val perQ = beam.groupBy("q_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == SimQueries.K.toLong))
  }

  test("F16 sampled exact face: sampled truth == full truth on the sample; recall agrees") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dataDir)
    // TEST-ONLY all-pairs ground truth (the shape the driver queries no
    // longer run): the sampled face must reproduce it exactly on the
    // sampled sources, because only the SOURCE side is sampled — the
    // neighbor side stays the whole corpus
    val full = Similarity.bruteTopK(emb, "vec_id", "embedding", emb, SimQueries.KnnK)
      .select(col("q_id").as("src_id"), col("n_id").as("nbr_id"), col("cos"), col("rnk"))
    val sampled = SimQueries.simKnnGraph(spark, dataDir)
    val srcs = sampled.select("src_id").distinct().collect().map(_.getLong(0)).toSet
    assert(srcs.size >= 40, s"sample too small to be a recall dial: ${srcs.size}")
    assert(srcs.size < emb.count(), "the sample must be a strict subset of sources")
    val fullOnSample = full.collect()
      .filter(r => srcs(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val sampledRows = sampled.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(sampledRows == fullOnSample,
      "sampled truth must equal the full graph restricted to sampled sources")
    // the dial the sample exists for: mean LSH recall measured on the
    // sample tracks mean recall measured on every source
    val lsh = SimQueries.storedKnnGraph(spark, dataDir)
      .select("src_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def meanRecall(truth: Set[(Long, Long, Double, Int)]): Double = {
      val bySrc = truth.groupBy(_._1)
      val rs = bySrc.map { case (s, rows) =>
        rows.count(t => lsh((t._1, t._2))).toDouble / SimQueries.KnnK }
      rs.sum / rs.size
    }
    val fullAll = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (mSampled, mFull) = (meanRecall(fullOnSample), meanRecall(fullAll))
    assert(math.abs(mSampled - mFull) <= 0.1,
      s"sampled recall $mSampled must track full recall $mFull")
  }

  test("F23 HNSW: layer hierarchy returns k rows per query and recall >= flat beam") {
    val h = SimQueries.simHnsw(spark, dataDir)
    val perQ = h.groupBy("q_id").count().collect()
    assert(perQ.length == SimQueries.NumQueries &&
      perQ.forall(_.getLong(1) == SimQueries.K.toLong))
    def avgRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = df.select("recall").collect().map(_.getDouble(0))
      rs.sum / rs.length
    }
    val hnsw = avgRecall(SimQueries.simHnswRecall(spark, dataDir))
    val flat = avgRecall(SimQueries.simBeamRecall(spark, dataDir))
    assert(hnsw >= flat,
      s"per-query entry from the layer hierarchy must not lose to the " +
        s"fixed min-id corner entry (hnsw=$hnsw, flat=$flat)")
  }

  test("F23 three-layer face: nested layers, k rows per query, recall dial computed") {
    // layer nesting: % 64 == 0 implies % 8 == 0 (same hash, multiple
    // modulus) — every layer-2 member is a layer-1 member
    val l2 = spark.table(SimQueries.hnswL2Table(spark, dataDir))
      .select("src_id").distinct().collect().map(_.getLong(0)).toSet
    val l1 = spark.table(SimQueries.hnswL1Table(spark, dataDir))
      .select("src_id").distinct().collect().map(_.getLong(0)).toSet
    assert(l2.subsetOf(l1), s"layer 2 must nest inside layer 1: ${l2 -- l1}")
    val h = SimQueries.simHnsw3(spark, dataDir)
    val perQ = h.groupBy("q_id").count().collect()
    assert(perQ.length == SimQueries.NumQueries &&
      perQ.forall(_.getLong(1) == SimQueries.K.toLong))
    // the dial exists and computes — its VALUE is the documented
    // tiny-corpus trade-off, not a pinned floor
    val rec = SimQueries.simHnsw3Recall(spark, dataDir)
      .select("recall").collect().map(_.getDouble(0))
    assert(rec.length == SimQueries.NumQueries && rec.forall(r => r >= 0 && r <= 1))
  }

  test("planeSigns is deterministic and balanced-ish") {
    val p1 = Similarity.planeSigns(4, 64)
    val p2 = Similarity.planeSigns(4, 64)
    assert(p1 == p2)
    assert(p1.flatten.forall(s => s == 1 || s == -1))
    val pos = p1.flatten.count(_ == 1)
    assert(pos > 64 && pos < 192, s"suspiciously unbalanced planes: $pos/256 positive")
  }
}
