package graft.streaming

import graft.index.{IvfIndex, NswIndex}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous index maintenance — the live twin of the batch
  * incremental paths, mirroring the reference's mutating endpoints
  * (`add`/`remove` records against a served index,
  * /root/reference/src/models/ivf_index.py:90-137,
  * nsw_index.py:54-113) as a Structured Streaming sink.
  *
  * A mutation stream `(vec_id, embedding, op)` with `op ∈ {upsert,
  * delete}` drives one bounded maintenance call per micro-batch via
  * `foreachBatch`: deletes through `maintainRemove`, upserts through
  * `maintain`, so the drift-envelope rebuild policy fires under
  * continuous ingestion exactly as it does in batch — most batches
  * cost one delta append; the occasional batch that pushes
  * accumulated drift past the threshold pays the full re-fit.
  *
  * Exactly-once: `foreachBatch` is at-least-once, and the layout
  * mutations converge under replay — add is an id-upsert (stale rows
  * dropped first) and remove is idempotent, so a retried micro-batch
  * rewrites the same state. The drift COUNTER is replay-idempotent
  * for pure-upsert and pure-delete replays: upsert drift counts only
  * rows not already stored byte-identically and remove drift counts
  * only ids actually present, so those replays contribute 0
  * (IndexStreamSpec). A replayed batch carrying BOTH ops for one
  * already-applied id is the exception: the delete sees the id
  * present (+1) and the re-applied upsert then sees it absent (+1),
  * so each replay adds 2 to the counter even though the LAYOUT
  * converges. The failure mode is one-sided — an inflated counter can
  * only fire a rebuild early, never miss one — and the spec's
  * mixed-replay case pins the exact movement.
  *
  * Deletes apply before upserts within a batch, so a batch carrying
  * both ops for one id converges to "present" — the order a client
  * replacing a record expects.
  */
object IndexStream {

  /** Mutation stream → persisted IVF layout ([[IvfIndex.persist]]'s
    * contract at `path`). Start with e.g.
    * `.trigger(...).start()` on the returned writer. */
  def maintainIvf(mutations: DataFrame, path: String,
      threshold: Double = IvfIndex.rebuildThreshold): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyBatch(batch,
        del => IvfIndex.maintainRemove(batch.sparkSession, path, del, threshold),
        ups => IvfIndex.maintain(batch.sparkSession, path, ups, threshold))
    }

  /** Mutation stream → persisted NSW graph layout
    * ([[NswIndex.persist]]'s contract at `path`). */
  def maintainNsw(mutations: DataFrame, path: String,
      threshold: Double = NswIndex.rebuildThreshold): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      applyBatch(batch,
        del => NswIndex.maintainRemove(batch.sparkSession, path, del, threshold),
        ups => NswIndex.maintain(batch.sparkSession, path, ups, threshold))
    }

  /** Split one micro-batch into its delete and upsert sides and apply
    * each through the index's policy entry point. The batch is tiny
    * relative to the index (it's a trigger interval of mutations) but
    * is read twice (split + the maintenance joins), so it rides a
    * localCheckpoint rather than re-running the source. */
  private def applyBatch(batch: DataFrame,
      applyDeletes: DataFrame => Unit,
      applyUpserts: DataFrame => Unit): Unit = {
    if (batch.isEmpty) return
    val b = batch.localCheckpoint(true)
    val deletes = b.filter(col("op") === "delete").select(col("vec_id"))
    val upserts = b.filter(col("op") === "upsert")
      .select(col("vec_id"), col("embedding"))
    if (!deletes.isEmpty) applyDeletes(deletes)
    if (!upserts.isEmpty) applyUpserts(upserts)
  }
}
