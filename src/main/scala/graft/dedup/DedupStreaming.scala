package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E17 (r13): streaming ingest dedup — the corpus front door. A
  * training pipeline's first dedup pass runs AT INGEST, on the
  * document stream itself, so a re-crawl or a replayed shard never
  * reaches the lake twice; the batch E-family then handles the
  * cross-horizon and near-duplicate work.
  *
  * The fingerprint is E1's exact spelling — md5 of
  * whitespace-normalized text — so batch and stream agree on what
  * "the same document" means (DedupStreamingSpec pins that a
  * re-spaced replay is suppressed, and that the surviving key set
  * equals the batch exact-dedup's). State is one entry per distinct
  * fingerprint and EXPIRES with the watermark
  * (dropDuplicatesWithinWatermark — the I12 discipline): a plain
  * dropDuplicates on a stream is the unbounded-state trap, while
  * replays arrive near-real-time, so the bounded horizon suffices;
  * anything that re-appears after the horizon is caught by E7's
  * incremental dedup against the persisted signature store — the
  * two-tier contract of a production ingest path. */
object DedupStreaming {

  def dedupStreaming(docs: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withWatermark("ts", watermarkDelay)
      .withColumn("fp", md5(regexp_replace(trim(col("text")), " +", " ")))
      .dropDuplicatesWithinWatermark("fp")

  /** I59: ADMISSION-TIME decontamination — the E26 audit run per
    * micro-batch against a FROZEN held-out gram set, composed with
    * the K-store exactly-once batch sink: a crawl batch lands in the
    * corpus table only WITH its contamination verdict attached, and a
    * replayed micro-batch publishes no second version (the I30
    * batchId idempotence). The gate itself is stateless — the eval
    * side never changes mid-stream (benchmarks are frozen before a
    * run), so there is no watermark and no state store; per batch it
    * is the same explode + broadcastable equi-join + per-doc count as
    * the batch face, which is what makes stream ≡ batch pinnable row
    * for row. Usage:
    * `ds.writeStream.foreachBatch(decontaminateSink(evalGrams, t) _)`. */
  def decontaminateSink(evalGrams: DataFrame, table: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val gated = DedupQueries.decontaminateAgainst(batch, evalGrams)
    graft.store.SnapshotStore.commitStreamBatch(table, gated, batchId)
    ()
  }
}
