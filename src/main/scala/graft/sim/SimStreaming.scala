package graft.sim

import org.apache.spark.sql.DataFrame

/** I60 (r18 verdict #6): streaming ANN admission — the SIMILARITY gate
  * of the streaming corpus front door, completing the gate triad next
  * to the E17/I59 fingerprint gates and the I58 CLIP gate: every
  * micro-batch of incoming vectors joins the PERSISTED banded LSH
  * index and lands in the corpus table WITH its nearest-neighbor
  * evidence attached (top-1 indexed neighbor + the admit verdict),
  * through the K-store exactly-once batch sink.
  *
  * The gate is STATELESS per batch — the index is a frozen snapshot
  * table (refreshing it is the F26/F27/K47 maintenance loop's job, a
  * separate cadence exactly like production vector stores), so there
  * is no watermark and no state store; per batch it is the SAME
  * bucket equi-join + exact-cosine verify as the batch face
  * (Similarity.annAdmitAgainst — one spelling, both engines), which
  * is what makes stream ≡ batch pinnable row for row. The incoming
  * side broadcasts (a micro-batch against a corpus-bucketed table);
  * candidates are bucket collisions, never all-pairs.
  *
  * Usage:
  * `ds.writeStream.foreachBatch(annAdmitSink(buckets, vecs, t) _)`.
  */
object SimStreaming {

  /** `indexBuckets`: the persisted (id, t, bucket) table;
    * `indexVecs`: (vec_id, embedding) for exact verification;
    * `batch`: incoming (vec_id, embedding) rows. */
  def annAdmitSink(indexBuckets: DataFrame, indexVecs: DataFrame,
      table: String, tau: Double = SimQueries.AdmitTau)(
      batch: DataFrame, batchId: Long): Unit = {
    val gated = Similarity.annAdmitAgainst(batch, "vec_id", "embedding",
      indexBuckets, indexVecs, tau, SimQueries.Tables64)
    graft.store.SnapshotStore.commitStreamBatch(table, gated, batchId)
    ()
  }
}
