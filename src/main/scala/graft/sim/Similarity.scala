package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate & exact similarity search over embedding columns
  * (SURVEY §2 F1-F3).
  *
  * Scale shape: brute force is the ground-truth baseline — broadcast the
  * (small) query set against the corpus, map-side score, one shuffle for
  * the per-query top-k window. The scale path is LSH bucketing: corpus
  * and queries hash to sign-buckets of deterministic random hyperplanes,
  * candidates come from a bucket-equality join (shuffle on the bucket
  * key, never all-pairs), and only candidates are cosine-scored. IVF is
  * the centroid-partitioned variant of the same idea.
  */
object Similarity {

  /** Deterministic ±1 hyperplane matrix derived from md5("seed|p|d") —
    * reproducible in any engine/language, no RNG state. */
  def planeSigns(numPlanes: Int, dims: Int, seed: String = "graft"): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        val hex = md.digest(s"$seed|$p|$d".getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
      }
    }
  }

  /** Sign-bucket of a vector under the given planes: one bit per plane
    * ('1' iff dot(v, plane) >= 0), concatenated to a bucket string.
    * The dot is the codegen'd graft_dot over (cast array, literal
    * plane) — Cast-to-array<double> is codegen'd, and graft_dot
    * accumulates in element order, so bucket values are bit-identical
    * to the previous interpreted aggregate/zip_with formulation (and
    * to the DuckDB oracle's list_sum) while staying inside
    * whole-stage codegen. */
  def lshBucket(spark: org.apache.spark.sql.SparkSession, vec: Column,
      planes: Seq[Seq[Int]]): Column =
    concat(planes.map { pl =>
      val dot = VectorFunctions.dotProduct(spark,
        vec.cast("array<double>"), typedLit(pl.map(_.toDouble)))
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** F6: symmetric int8 quantization per vector — the storage/transfer
    * compression step an embedding store runs before ANN serving
    * (4× smaller than float32; dot products stay proportional within a
    * per-vector scale). q_d = round(x_d * 127 / max|x|), so values land
    * in [-127, 127] with the max element at exactly ±127; an all-zero
    * vector quantizes to zeros. Exploded-row formulation (codegen'd,
    * one shuffle for the per-vector max) — not interpreted array
    * lambdas, per the §3 rule. Both engines compute the identical
    * double expression and both round half-away-from-zero. */
  def quantizeInt8(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = vecs
      .select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
    val w = Window.partitionBy("vec_id")
    ex.withColumn("maxabs", max(abs(col("x"))).over(w))
      .select(col("vec_id"), col("dim"),
        when(col("maxabs") === 0.0, lit(0))
          .otherwise(round(col("x") * 127.0 / col("maxabs")).cast("int")).as("q"))
  }

  /** F12: 1-bit (sign) BINARY quantization — a ≤64-dim vector packs
    * to ONE long (bit i set iff x_i > 0) and similarity collapses to
    * Hamming distance, bit_count(a XOR b): 8 bytes per vector and a
    * two-instruction kernel — the coarsest rung of the quantization
    * ladder (int8 F6 → PQ F8 → sign bits), the candidate-generation
    * pass serving stacks run before int8/exact rescoring. Packing is
    * one explode + a codegen'd bit_or aggregation (no HOF lambda);
    * the i=63 shift lands in the sign bit identically in any two's-
    * complement engine. */
  def binaryPack(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("vec_id"),
        when(col("x") > 0, expr("shiftleft(1L, i)")).otherwise(lit(0L)).as("b"))
      .groupBy("vec_id").agg(bit_or(col("b")).as("bits"))

  /** F12 search: exact Hamming top-k over the packed corpus for a
    * broadcast query set (bruteTopK's shape with the bit kernel);
    * ties break by (hamming, n_id). */
  def hammingTopK(vecs: DataFrame, idCol: String, vecCol: String,
      numQueries: Int, k: Int): DataFrame = {
    val packed = binaryPack(vecs, idCol, vecCol)
    val q = broadcast(packed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("bits").as("qb")))
    packed.select(col("vec_id").as("n_id"), col("bits").as("nb"))
      .crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("hamming", expr("bit_count(qb ^ nb)").cast("int"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("hamming"), col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("hamming"), col("rnk"))
  }

  /** F13: two-stage retrieval (candidate generation + rescoring) —
    * the production serving stack's composition: the coarsest
    * quantization rung (F12 sign bits) nominates candK candidates per
    * query in an 8-byte-per-vector Hamming pass, and ONLY those
    * candidates are rescored with the exact float cosine. The corpus
    * scan runs at two instructions per vector; the exact kernel
    * touches queries·candK rows. Rescoring restores the true metric's
    * ORDER among survivors — the part a Hamming rank gets wrong —
    * so quality loss is exactly the bit pass's candidate recall, and
    * candK == corpus size recovers brute-force EXACTLY (spec-pinned,
    * the F11 full-probe invariant). */
  def rerankTopK(vecs: DataFrame, idCol: String, vecCol: String,
      numQueries: Int, candK: Int, k: Int): DataFrame = {
    val cand = hammingTopK(vecs, idCol, vecCol, numQueries, candK)
      .select(col("q_id"), col("n_id"))
    val qv = broadcast(vecs.filter(col(idCol) < numQueries)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val cos = VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("nv"))
    cand.join(vecs.select(col(idCol).as("n_id"), col(vecCol).as("nv")), "n_id")
      .join(qv, "q_id")
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** F15: Matryoshka two-stage retrieval — candidate generation by
    * cosine over only the FIRST `prefixDims` dimensions, exact
    * full-dimension rescoring of the candidates (how MRL-trained
    * embeddings are served: the prefix is itself a valid embedding,
    * so the cheap low-dim scan ranks ~correctly and the full vector
    * only touches candK rows per query). The prefix stage here is the
    * brute scan at 1/(d/prefix) the arithmetic; at scale it composes
    * with any ANN face over the prefix (IVF/LSH on 16 dims is also
    * ~4× cheaper to build and probe than on 64). Same candidate →
    * rescore → rank shape as [[rerankTopK]], with the shipped recall
    * query measuring exactly what the truncation gives up. */
  def matryoshkaTopK(vecs: DataFrame, idCol: String, vecCol: String,
      numQueries: Int, prefixDims: Int, candK: Int, k: Int): DataFrame = {
    val trunc = vecs.select(col(idCol), slice(col(vecCol), 1, prefixDims).as("tv"))
    val cand = bruteTopK(trunc, idCol, "tv",
      trunc.filter(col(idCol) < numQueries), candK)
      .select(col("q_id"), col("n_id"))
    val qv = broadcast(vecs.filter(col(idCol) < numQueries)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val cos = VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("nv"))
    cand.join(vecs.select(col(idCol).as("n_id"), col(vecCol).as("nv")), "n_id")
      .join(qv, "q_id")
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** F10: deterministic Lloyd k-means over int8-QUANTIZED vectors —
    * the codebook-learning step PQ/IVF serving stacks train offline,
    * spelled so every iteration is EXACT and cross-engine stable:
    * distances are integer sums of squared int diffs, centroid
    * updates are floor(Σq / n) over exact integer sums (the one IEEE
    * division takes identical integer operands in every engine, so
    * the floor is identical too), argmin ties break to the smallest
    * centroid id, and seeds are the K smallest vector ids. Float
    * k-means can NOT be pinned this way — per-dim float means are
    * aggregation-order-dependent, and a last-ulp flip in iteration 1
    * cascades into different assignments by iteration 3.
    *
    * Scale shape: the K·dims centroid table broadcasts; each
    * iteration is ONE map-side-combined aggregation over n·K·dims
    * joined rows (never vector×vector) plus a per-vector rank window.
    * Empty clusters drop out of the centroid table (documented Lloyd
    * behavior) and both engines drop them identically. */
  def kmeansInt8(quantized: DataFrame, k: Int, iterations: Int): DataFrame = {
    val q = quantized.localCheckpoint(eager = true) // read every iteration
    val seeds = q.select("vec_id").distinct().orderBy("vec_id").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("vec_id")) - 1)
    var cent = q.join(seeds, "vec_id")
      .select(col("cid"), col("dim"), col("q").cast("long").as("c"))
      .localCheckpoint(eager = true)
    var asg: DataFrame = null
    for (i <- 1 to iterations) {
      val d = col("q") - col("c")
      val dist = q.join(broadcast(cent), "dim")
        .groupBy("vec_id", "cid").agg(sum(d * d).as("dist"))
      val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
      asg = dist.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select("vec_id", "cid", "dist")
        .localCheckpoint(eager = true)
      if (i < iterations)
        cent = q.join(asg.select("vec_id", "cid"), "vec_id")
          .groupBy("cid", "dim")
          .agg(floor(sum(col("q")).cast("double") / count(lit(1))).cast("long").as("c"))
          .localCheckpoint(eager = true)
    }
    asg.select(col("vec_id"), col("cid").as("cluster"), col("dist").as("dist_sq"))
  }

  /** F14: radius (range) search — every neighbor with cosine ≥ τ of
    * each query, the UNBOUNDED-count dual of top-k (dedup and
    * recall-sweep workloads ask "everything this similar", not "the
    * 5 best"). Same broadcast-queries shape as [[bruteTopK]] but NO
    * per-query window: the threshold filter is map-side, so the
    * whole query is one scan with zero shuffle — the k-free answer
    * is strictly CHEAPER than top-k at scale, not more expensive.
    * Row set pinned by the float threshold (the
    * dedup_embedding_pairs precedent: identical cosine expression
    * trees on both engines → identical doubles → identical filter
    * decisions). */
  def rangeSearch(vecs: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, minCos: Double): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val n = vecs.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val cos = VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("nv"))
    n.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cos)
      .filter(col("cos") >= minCos)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
  }

  /** F1: exact top-k cosine neighbors for each query vector (ground
    * truth). Queries are broadcast; ties break by neighbor id. */
  def bruteTopK(vecs: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val n = vecs.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val cos = VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("nv"))
    n.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cos)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** F7: max-inner-product top-k — the recommendation-scoring variant
    * of F1 (score = raw dot product, not angle). Same broadcast-queries
    * + per-query window shape as bruteTopK, with the codegen'd
    * graft_dot on the hot path. The documented scale path for MIPS is
    * the norm-augmentation reduction to cosine ANN: append
    * sqrt(M² − ‖x‖²) to every item vector (M = max item norm) and a 0
    * to queries — inner-product order becomes cosine order, after which
    * annLsh answers it sub-linearly; this brute pass is the exact
    * ground truth that reduction is measured against. */
  def mipsTopK(vecs: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv")))
    val n = vecs.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("nv"))
    val dot = VectorFunctions.dotProduct(vecs.sparkSession, col("qv"), col("nv"))
    n.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dot").desc, col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("dot"), 4).as("dot"), col("rnk"))
  }

  /** F2: multi-table LSH ANN — L independent hash tables of a few
    * sign-planes each; a pair is a candidate if it collides in ANY
    * table (union drives recall up exponentially in L, the standard
    * LSH recall/cost dial). Candidates come from a (table, bucket)
    * equality join — shuffle on the bucket key, never all-pairs — and
    * only DISTINCT candidate pairs are cosine-scored. */
  /** (id, t, bucket) rows of every vector under every LSH table — the
    * frame worth PERSISTING (write-once / query-many): the ann and
    * recall queries then skip the numTables × numPlanes bucket dots per
    * corpus scan, exactly the dedup signature-store split. */
  def lshBucketsOf(vecs: DataFrame, idCol: String, vecCol: String,
      tables: Seq[Seq[Seq[Int]]]): DataFrame = {
    val buckets = array(tables.map(pl =>
      lshBucket(vecs.sparkSession, col("v"), pl)): _*)
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), posexplode(buckets))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
  }

  def annLsh(vecs: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, tables: Seq[Seq[Seq[Int]]]): DataFrame =
    annLshFromBuckets(vecs, idCol, vecCol,
      lshBucketsOf(vecs, idCol, vecCol, tables), queryPred, k)

  /** F2 over a precomputed/persisted (id, t, bucket) frame. */
  def annLshFromBuckets(vecs: DataFrame, idCol: String, vecCol: String,
      bucketed: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val qSide = bucketed.filter(queryPred).select(col("id").as("q_id"), col("t"), col("bucket"))
    val cand = bucketed.join(broadcast(qSide), Seq("t", "bucket"))
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id").distinct()
    cand
      .join(base.select(col("id").as("q_id"), col("v").as("qv")), "q_id")
      .join(base, "id")
      .withColumn("cos", VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }

  /** F28/I60 batch kernel: ADMISSION evidence for incoming vectors
    * against a FROZEN banded index — the similarity gate of a
    * streaming corpus front door (the third gate next to the E17
    * fingerprint and H44 CLIP gates): each incoming vector buckets
    * under the SAME hyperplanes as the index, candidates come from
    * the (t, bucket) equi-join (never all-pairs; the incoming side
    * broadcasts — a micro-batch against a corpus-bucketed table),
    * candidates verify by exact cosine, and the TOP-1 neighbor rides
    * the row as evidence. Every incoming row survives: admitted = 1
    * unless its nearest bucketed neighbor scores ≥ `tau` (a near-dup
    * of the existing corpus); no-candidate rows admit with null
    * evidence — the left-join row class a silent inner join would
    * drop. */
  def annAdmitAgainst(incoming: DataFrame, idCol: String, vecCol: String,
      indexBuckets: DataFrame, indexVecs: DataFrame,
      tau: Double, tables: Seq[Seq[Seq[Int]]]): DataFrame = {
    val spark = incoming.sparkSession
    val inVecs = incoming.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val inB = lshBucketsOf(incoming, idCol, vecCol, tables)
      .select(col("id").as("q_id"), col("t"), col("bucket"))
    val cand = indexBuckets.join(broadcast(inB), Seq("t", "bucket"))
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id").distinct()
    val top1 = cand
      .join(indexVecs.select(col("vec_id").as("id"), col("embedding").as("nv")), "id")
      .join(broadcast(inVecs), "q_id")
      .withColumn("cos", VectorFunctions.cosineSim(spark, col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("id"))))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("id").as("nn_id"),
        round(col("cos"), 4).as("nn_cos"))
    inVecs.select(col("q_id").as("vec_id"))
      .join(top1.withColumnRenamed("q_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("nn_id"), col("nn_cos"),
        (col("nn_cos").isNull || col("nn_cos") < tau).cast("int").as("admitted"))
  }

  /** F7 scale path: MIPS answered THROUGH cosine LSH — the
    * norm-augmentation reduction documented at mipsTopK, realized.
    * Every ITEM vector gains one coordinate sqrt(M² − ‖x‖²) (M = max
    * corpus norm, an in-plan broadcast scalar), every QUERY a 0: all
    * augmented items share norm M, so cosine order under the
    * augmentation equals raw inner-product order and LSH buckets over
    * the augmented vectors answer MIPS sub-linearly. Candidates come
    * from the (table, bucket) equality join — never all-pairs — and
    * are scored by the ORIGINAL dot product (the augmented query
    * coordinate is 0, so both dots agree). The quality dial vs the
    * exact mipsTopK is sim_mips_ann_recall, the F5 pattern. */
  def mipsViaAnn(vecs: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Int, k: Int, tables: Seq[Seq[Seq[Int]]]): DataFrame = {
    val spark = vecs.sparkSession
    val base = vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nsq", VectorFunctions.dotProduct(spark, col("v"), col("v")))
    val maxN = base.agg(max(col("nsq")).as("max_nsq"))
    val items = base.crossJoin(broadcast(maxN))
      .select(col("id"), concat(col("v"),
        array(sqrt(greatest(lit(0.0), col("max_nsq") - col("nsq"))))).as("av"))
    val qs = base.filter(col("id") < queryMaxId)
      .select(col("id"), concat(col("v"), array(lit(0.0))).as("av"))
    def bucketsOf(df: DataFrame): DataFrame = {
      val bs = array(tables.map(pl => lshBucket(spark, col("av"), pl)): _*)
      df.select(col("id"), posexplode(bs).as(Seq("t", "bucket")))
    }
    val cand = bucketsOf(items)
      .join(broadcast(bucketsOf(qs)
        .select(col("id").as("q_id"), col("t"), col("bucket"))),
        Seq("t", "bucket"))
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id").distinct()
    cand
      .join(base.select(col("id").as("q_id"), col("v").as("qv")), "q_id")
      .join(base.select(col("id"), col("v")), "id")
      .withColumn("dot", VectorFunctions.dotProduct(spark, col("qv"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dot").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("dot"), 4).as("dot"), col("rnk"))
  }

  /** F8: product-quantization ADC top-k — the memory-bound ANN serving
    * path: vectors compress to M sub-space codebook codes (here M×4
    * bits ≈ 8 bytes vs 256 for float32×64), and each query scores the
    * WHOLE corpus through an M×K distance table instead of touching
    * raw vectors. Codebooks are deterministic (the sub-vectors of the
    * first `codebookSize` ids — the IVF-pivot trick, no RNG); encoding
    * is a broadcast join against M×K codebook rows; ADC is one
    * (m, code) equality join + a FIXED-ORDER d0+…+d(M−1) sum (each
    * sub-distance lands in its own conditional aggregate, so the
    * addition order is pinned by the expression and both engines
    * produce bit-identical doubles — a row-order sum would not).
    * At scale: codes are 30× smaller than vectors — the shuffle that
    * scores a 100 TB corpus moves 3 TB. */
  def pqTopK(vecs: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Int, k: Int, m: Int, subDim: Int,
      codebookSize: Int): DataFrame = {
    val (codes, dtable) = pqPieces(vecs, idCol, vecCol, queryMaxId, m, subDim, codebookSize)
    adcRank(
      codes.join(broadcast(dtable),
          col("m") === col("qm") && col("code") === col("c_id"))
        .filter(col("q_id") =!= col("id")),
      k, m)
  }

  /** PQ building blocks shared by pqTopK (whole-corpus ADC) and
    * ivfPqTopK (ADC over probed lists only): `codes` (id, m, code) and
    * the per-query distance table (q_id, qm, c_id, d). */
  private def pqPieces(vecs: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Int, m: Int, subDim: Int,
      codebookSize: Int): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    // (id, m, sub-vector) rows: M fixed-width slices per vector
    def subs(df: DataFrame): DataFrame = {
      val slices = array((0 until m).map(i =>
        slice(col(vecCol).cast("array<double>"), i * subDim + 1, subDim)): _*)
      df.select(col(idCol).as("id"), posexplode(slices).as(Seq("m", "sv")))
    }
    def dot(a: Column, b: Column) = VectorFunctions.dotProduct(spark, a, b)
    // ||a − b||² = a·a − 2 a·b + b·b, every dot in element order
    def d2(a: Column, b: Column): Column =
      dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    val allSubs = subs(vecs).localCheckpoint(eager = true)
    val codebook = broadcast(
      allSubs.filter(col("id") < codebookSize)
        .select(col("id").as("c_id"), col("m").as("cm"), col("sv").as("cv")))
    val codes = allSubs.join(codebook, col("m") === col("cm"))
      .withColumn("dd", d2(col("sv"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy("id", "m").orderBy(col("dd"), col("c_id"))))
      .filter(col("r") === 1)
      .select(col("id"), col("m"), col("c_id").as("code"))
    val dtable = allSubs.filter(col("id") < queryMaxId)
      .join(codebook, col("m") === col("cm"))
      .select(col("id").as("q_id"), col("m").as("qm"), col("c_id"),
        d2(col("sv"), col("cv")).as("d"))
    (codes, dtable)
  }

  /** ADC finishing: per-(query, neighbor) fixed-order d0+…+d(M−1) sum
    * (each sub-distance in its own conditional aggregate — addition
    * order pinned by the expression, bit-identical cross-engine) +
    * the top-k rank. */
  private def adcRank(scored: DataFrame, k: Int, m: Int): DataFrame = {
    val fixedOrderSum = (0 until m).map(i =>
      sum(when(col("m") === i, col("d")))).reduce(_ + _)
    scored
      .groupBy(col("q_id"), col("id").as("n_id"))
      .agg(fixedOrderSum.as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), round(col("adc"), 4).as("adc"), col("rnk"))
  }

  /** F11: IVF-PQ — the production ANN serving layout (FAISS's
    * IndexIVFPQ shape): the coarse quantizer (deterministic pivots,
    * F3) routes each query to its `nprobe` inverted lists, and PQ-ADC
    * (F8) scores ONLY those lists' codes through the M×K distance
    * table. At 100 TB the corpus is touched as codes (~30× smaller
    * than vectors) AND only nprobe/nlists of it per query — the two
    * reductions compose multiplicatively. Same determinism contract
    * as both parents: cosine ties break to the smaller centroid id,
    * ADC sums are fixed-order. */
  def ivfPqTopK(vecs: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Int, k: Int, nCentroids: Int, nprobe: Int,
      m: Int, subDim: Int, codebookSize: Int): DataFrame = {
    val spark = vecs.sparkSession
    val centroids = broadcast(
      vecs.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("c_id"), col(vecCol).as("cv")))
    val assigned = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(centroids)
      .withColumn("cos_c", VectorFunctions.cosineSim(spark, col("v"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy("id").orderBy(col("cos_c").desc, col("c_id"))))
      .filter(col("r") === 1)
      .select(col("id"), col("c_id"))
    val probes = vecs.filter(col(idCol) < queryMaxId)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .crossJoin(centroids)
      .withColumn("cos_c", VectorFunctions.cosineSim(spark, col("qv"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_c").desc, col("c_id"))))
      .filter(col("r") <= nprobe)
      .select(col("q_id"), col("c_id"))
    // one row per (query, list member): ids are assigned to exactly
    // one list and probes are distinct, so no dedup is needed
    val cand = probes.join(assigned, "c_id")
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id")
    val (codes, dtable) = pqPieces(vecs, idCol, vecCol, queryMaxId, m, subDim, codebookSize)
    adcRank(
      cand.join(codes, "id")
        .join(broadcast(dtable.withColumnRenamed("q_id", "dq")),
          col("m") === col("qm") && col("code") === col("c_id")
            && col("q_id") === col("dq")),
      k, m)
  }

  /** F9: distance to the per-label centroid — the embedding-space
    * OUTLIER signal (vectors far from their group's mean are mislabeled
    * or noise; the filter an embedding-based curation pass thresholds
    * on). Exploded-row formulation: one (label, dim) mean aggregation,
    * one join back, one per-vector sum — all codegen'd, shuffles keyed
    * on (label, dim) and (label, id), never all-pairs. The centroid
    * means and the distance sum are order-sensitive float reductions —
    * round(4) on the output, the corpus-stats contract. */
  def centroidDistance(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val ex = vecs.select(col(labelCol).as("label"), col(idCol).as("id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
    val mu = ex.groupBy("label", "dim").agg(avg(col("x")).as("mu"))
    ex.join(mu, Seq("label", "dim"))
      .groupBy("label", "id")
      .agg(round(sqrt(sum((col("x") - col("mu")) * (col("x") - col("mu")))), 4)
        .as("dist"))
  }

  /** F3: IVF-style coarse search: the first `nCentroids` vectors (by
    * id) act as deterministic pivots; every vector is assigned to its
    * nearest pivot (one broadcast join, map-side); a query probes the
    * `nprobe` pivots nearest to IT and searches only those inverted
    * lists. */
  def ivfSearch(vecs: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int, nCentroids: Int, nprobe: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cos_c").desc, col("c_id"))
    val centroids = broadcast(
      vecs.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("c_id"), col(vecCol).as("cv")))
    // assign: nearest centroid per vector
    val assigned = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(centroids)
      .withColumn("cos_c", VectorFunctions.cosineSim(vecs.sparkSession, col("v"), col("cv")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("id"), col("v"), col("c_id"))
    // probe lists: nprobe nearest centroids per query
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .crossJoin(centroids)
      .withColumn("cos_c", VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_c").desc, col("c_id"))))
      .filter(col("r") <= nprobe)
      .select(col("q_id"), col("qv"), col("c_id"))
    probes.join(assigned, "c_id")
      .filter(col("q_id") =!= col("id"))
      .withColumn("cos", VectorFunctions.cosineSim(vecs.sparkSession, col("qv"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("cos"), 4).as("cos"), col("rnk"))
  }
}
