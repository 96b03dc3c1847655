package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution over KG node names (SURVEY §2 B13) — the
  * deterministic stand-in for the reference's LLM normalize prompt
  * rules 1-2 (`Art-Knowledge-Graph-AWS/LLM/chains.py:127-142`:
  * "Pablo Picasso" / "P. Picasso" → one canonical artist, full museum
  * names), which canonicalize spelling variants the rule-based
  * normalizer (B3) cannot see.
  *
  * Shape: the E2 MinHash/LSH machinery applied to NAMES — character
  * k-gram shingles of the normalized name, minhash signature, banding
  * blocked WITHIN a label (the label rides inside the bucket hash, so
  * a museum and an artist can never collide), Jaccard verification on
  * the candidate pairs only. All hashing is md5-on-strings, so every
  * step is oracle-checkable in any engine.
  *
  * Scale shape: the input is the distinct (label, name) dictionary —
  * orders of magnitude smaller than the corpus — and candidate
  * generation is ONE shuffle on (band, bucket), never all-pairs, so
  * the same plan holds for a 10^8-name dictionary. Serial/ID-like
  * names ("Customer#000000042") are near-identical as character
  * grams and would merge wholesale, which is why production runs pass
  * an explicit label allowlist covering the labels whose names are
  * natural language (the `labels` parameter; the reference's prompt
  * has the same scope — artists and museums, not accession numbers).
  */
object EntityResolution {

  /** Normalized name: trimmed, space-collapsed, lower-cased — the
    * casing/whitespace half of canonicalization, done before gramming
    * so "Pablo  Picasso" and "pablo picasso" gram identically. */
  def normName(c: Column): Column = lower(regexp_replace(trim(c), " +", " "))

  /** Character k-gram array of a (normalized) name; names shorter
    * than k yield the whole name so they still participate. */
  def charGrams(nm: Column, k: Int): Column =
    when(length(nm) >= k,
      transform(sequence(lit(1), length(nm) - (k - 1)), i => nm.substr(i, lit(k))))
      .otherwise(array(nm))

  /** Jaccard-verified same-label merge-candidate pairs over a node
    * frame (label, name). Returns (label, name_a, name_b, jaccard)
    * with name_a < name_b, jaccard ≥ threshold on the DISTINCT
    * gram-hash sets (hashes, not raw grams — the r8 signature-store
    * convention: bounded bytes per element).
    *
    * numHashes = bands × rowsPerBand; a pair is a candidate iff some
    * band of the minhash signature matches exactly, so sub-threshold
    * pairs are pruned with probability 1-(1-J^r)^b without ever being
    * enumerated. */
  def resolutionPairs(nodes: DataFrame, labels: Seq[String], k: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    val n = bands * rowsPerBand
    val nm = normName(col("name"))
    val ex = nodes.filter(col("label").isin(labels: _*))
      .select(col("label"), col("name"), explode(charGrams(nm, k)).as("g"))
    val mins = (0 until n).map(i =>
      min(md5(concat(lit(s"$i|"), col("g")))).as(s"h$i"))
    val aggs = mins.tail :+ collect_set(md5(col("g"))).as("gs")
    // one gram pass builds signature AND verification set; checkpointed
    // because banding and both verify joins read it (the in-query
    // analogue of the persisted dedup signature tables)
    val sig = ex.groupBy("label", "name").agg(mins.head, aggs: _*)
      .localCheckpoint(eager = true)
    val bandKeys = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(j => col(s"h${b * rowsPerBand + j}"))
      md5(concat((col("label") +: lit("|") +: hs): _*))
    }
    val banded = sig.select(col("label"), col("name"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.select(col("band"), col("bucket"), col("label"), col("name").as("name_a"))
      .join(banded.select(col("band"), col("bucket"), col("name").as("name_b")),
        Seq("band", "bucket"))
      .filter(col("name_a") < col("name_b"))
      .select("label", "name_a", "name_b").distinct()
    val sets = sig.select(col("label"), col("name"), col("gs"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val uni = size(col("ga")) + size(col("gb")) - inter
    cand
      .join(sets.select(col("label"), col("name").as("name_a"), col("gs").as("ga")),
        Seq("label", "name_a"))
      .join(sets.select(col("label"), col("name").as("name_b"), col("gs").as("gb")),
        Seq("label", "name_b"))
      .withColumn("jaccard", round(inter.cast("double") / uni, 4))
      .filter(col("jaccard") >= threshold)
      .select("label", "name_a", "name_b", "jaccard")
  }

  /** Canonical-name map: connected components over the verified pairs
    * (similarity is not transitive; clustering is the closure), min
    * name per cluster — every in-scope node gets (label, name,
    * canonical_name, is_canonical). The merge the reference applies by
    * rewriting triples through the LLM's canonical answer. */
  def resolutionClusters(nodes: DataFrame, labels: Seq[String], k: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    val pairs = resolutionPairs(nodes, labels, k, bands, rowsPerBand, threshold)
    // CC over composite string ids keeps the label partition intact
    val sep = "\u0001"
    val cc = graft.graph.Graphs.connectedComponents(
      pairs.select(concat_ws(sep, col("label"), col("name_a")).as("u"),
        concat_ws(sep, col("label"), col("name_b")).as("v")))
    nodes.filter(col("label").isin(labels: _*))
      .join(cc.withColumnRenamed("id", "nid"),
        concat_ws(sep, col("label"), col("name")) === col("nid"), "left")
      .select(col("label"), col("name"),
        coalesce(substring_index(col("component"), sep, -1), col("name"))
          .as("canonical_name"))
      .withColumn("is_canonical",
        (col("canonical_name") === col("name")).cast("int"))
  }
}
