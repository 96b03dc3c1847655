package graft.kg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Incremental batched Neo4j upsert writer (SURVEY §2 B10) — the
  * reference's OTHER loading path: where exportNeo4jBulk is the
  * offline 100 TB bulk-import answer, this is the incremental-refresh
  * shape the reference actually runs — batched UNWIND upserts over a
  * live connection (Art-Knowledge-Graph-AWS/GRAPH/graph_builder.py
  * APOC UNWIND batches of 500; GRAPH/main_neo4j_loader.py drives
  * them).
  *
  * Spark-first split: batch ASSEMBLY is a deterministic, oracled
  * DataFrame transform (md5-derived batch ids — portable, no RNG; rows
  * serialized to sorted JSON arrays exactly like Sources.jsonBatches);
  * batch TRANSPORT is a pluggable serializable trait executed with
  * foreachPartition (per-partition connection, the same
  * external-system shape as LlmChains.Chain). The bolt driver itself
  * is external to this engine, so tests run a recording transport.
  */
object Neo4jUpsert {

  /** One UNWIND-batch upsert statement template over typed edges —
    * mirrors the reference MERGE semantics (typed endpoint nodes
    * merged by (label, name), relationship merged between them,
    * weight updated). No apostrophes: embeds verbatim in SQL oracles. */
  val EdgeUnwindCypher: String =
    """UNWIND $rows AS row
      |CALL apoc.merge.node([row.src_label], {name: row.src}) YIELD node AS h
      |CALL apoc.merge.node([row.dst_label], {name: row.dst}) YIELD node AS t
      |CALL apoc.merge.relationship(h, row.rel, {}, {weight: row.weight}, t) YIELD rel
      |RETURN count(*)""".stripMargin

  /** Executes (cypher, rowsJson) batches against a live server.
    * Implementations must be serializable — `run` invokes them on
    * executors, one transport call per partition so a connection is
    * opened per partition, not per batch. */
  trait CypherTransport extends Serializable {
    def send(batches: Iterator[(String, String)]): Unit
  }

  /** Deterministic UNWIND batches from a typed edge frame
    * (GraphBuilder.edges schema): batch_id = md5-derived bucket of the
    * edge key (portable across engines — the oracle reproduces it),
    * rows_json = the batch rows as a SORTED compact-JSON array (stable
    * output regardless of shuffle order). One shuffle on batch_id. */
  def edgeUpsertBatches(edges: DataFrame, numBatches: Int): DataFrame = {
    // Null-safe on arbitrary caller frames (r3 advice): concat_ws SKIPS
    // nulls and to_json OMITS null fields, so a null label would shift
    // the batch key and shrink the JSON relative to a null-propagating
    // oracle ('||' / struct_pack). GraphBuilder.edges can't emit null
    // labels (normalizeLabel defaults to Entity), but this API accepts
    // any edge frame — coalesce the key columns to '' so both engines
    // see identical bytes either way.
    val Seq(srcL, src, rel, dstL, dst) =
      Seq("src_label", "src", "rel", "dst_label", "dst")
        .map(c => coalesce(col(c), lit("")))
    val key = concat_ws("|", srcL, src, rel, dstL, dst)
    val bid = conv(substring(md5(key), 1, 8), 16, 10).cast("long") % numBatches
    val rowJson = to_json(struct(srcL.as("src_label"), src.as("src"), rel.as("rel"),
      dstL.as("dst_label"), dst.as("dst"), col("weight")))
    edges
      .select(bid.as("batch_id"), rowJson.as("row_json"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_rows"),
        concat(lit("["), array_join(sort_array(collect_list(col("row_json"))), ","),
          lit("]")).as("rows_json"))
      .withColumn("cypher", lit(EdgeUnwindCypher))
  }

  /** Ship assembled batches through the transport, partition-parallel. */
  def run(batches: DataFrame, transport: CypherTransport): Unit =
    batches.select(col("cypher"), col("rows_json")).foreachPartition {
      (it: Iterator[Row]) => transport.send(it.map(r => (r.getString(0), r.getString(1))))
    }

  /** B24: fixed batch-SIZE assembly — ceil(n/batchSize) batches of at
    * most `batchSize` rows each, the contract the reference's batched
    * loader actually implies (graph_builder.py loads in batches OF
    * 500): a server-side UNWIND transaction is sized by its ROW
    * COUNT, so the payload bound must hold as data grows —
    * [[edgeUpsertBatches]]' fixed batch COUNT keeps the shuffle key
    * space stable but lets every batch grow linearly with the corpus
    * (r18 review). Deterministic and shuffle-parallel: edges take a
    * md5 total order, ranked WITHOUT a global window (the classic
    * single-partition scale trap) via the G11 exclusive-cumsum idiom
    * — a 256-way hex-prefix range bucketing gives per-bucket
    * row_numbers (256 independent window groups), a 256-row
    * broadcast of exclusive bucket offsets lifts them to global
    * ranks, and batch_id = rank / batchSize. */
  def edgeUpsertBatchesBySize(edges: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import org.apache.spark.sql.expressions.Window
    val Seq(srcL, src, rel, dstL, dst) =
      Seq("src_label", "src", "rel", "dst_label", "dst")
        .map(c => coalesce(col(c), lit("")))
    val key = concat_ws("|", srcL, src, rel, dstL, dst)
    val rowJson = to_json(struct(srcL.as("src_label"), src.as("src"), rel.as("rel"),
      dstL.as("dst_label"), dst.as("dst"), col("weight")))
    val base = edges.select(md5(key).as("h"), key.as("k"),
      rowJson.as("row_json"))
    // hex-prefix buckets ARE ranges of the md5 order, so global order
    // == (bucket, within-bucket md5 order); ties broken by the full
    // key in both engines (md5 collisions)
    val local = base
      .withColumn("bucket", substring(col("h"), 1, 2))
      .withColumn("lr", row_number().over(
        Window.partitionBy("bucket").orderBy("h", "k")))
    // 256-row exclusive cumsum as a broadcast triangular self-join —
    // NOT a global window: even over a provably tiny frame, a
    // no-partition window statically plans the single-partition
    // exchange the J5 fleet tripwire exists to reject, and this
    // spelling keeps the whole plan free of the construct (the frame
    // broadcasts; off(b) = Σ counts of buckets < b)
    val counts = local.groupBy("bucket").agg(count(lit(1)).as("c"))
    val offs = counts
      .join(broadcast(counts.select(col("bucket").as("b2"), col("c").as("c2"))),
        col("b2") < col("bucket"), "left")
      .groupBy("bucket").agg(coalesce(sum(col("c2")), lit(0L)).as("off"))
    local.join(broadcast(offs), "bucket")
      .withColumn("batch_id",
        // Spark '/' is double division — floor+cast is exact here
        // (global ranks stay far below 2^53)
        floor((col("off") + col("lr") - 1) / lit(batchSize)).cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_rows"),
        concat(lit("["), array_join(sort_array(collect_list(col("row_json"))), ","),
          lit("]")).as("rows_json"))
      .withColumn("cypher", lit(EdgeUnwindCypher))
  }
}
