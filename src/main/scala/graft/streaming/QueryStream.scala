package graft.streaming

import graft.index.IvfIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous ANN SERVING — the live twin of the /query endpoint the
  * reference exposes per-request (main.py:316-344 serves one query
  * per HTTP call): a stream of `(q_id, q_vec)` queries answered
  * against a persisted IVF layout, completing the streaming story —
  * [[IndexStream]] maintains the layout under continuous mutation,
  * QueryStream serves from it, and the two compose on one durable
  * index (the spec drives exactly that: an upsert applied by
  * IndexStream is visible to the NEXT query batch, no restart, no
  * refit).
  *
  * Shape: `foreachBatch` turns each micro-batch of queries into ONE
  * batch probe search — the exact [[IvfIndex.searchPersisted]] plan
  * (broadcast centroid ranking, partition-pruned posting scan,
  * WindowGroupLimit top-k), so streamed answers are definitionally
  * the batch answers, and per-batch cost is the probed n_probe/k
  * slice of the index, not a full scan. Serving keeps NO streaming
  * state: no watermark, no state store — the index on disk IS the
  * state, owned by the maintenance stream.
  *
  * Exactly-once OUTPUT without a sidecar: each batch writes
  * `<out>/batch=<id>` with overwrite — a replayed batch id rewrites
  * its own directory byte-for-byte (the search is deterministic) and
  * touches no other, so downstream readers never see duplicated or
  * torn batches regardless of redelivery. (Compare [[IndexStream]],
  * which must track applied ids in a sidecar because maintenance
  * MUTATES shared state; serving is idempotent by construction.)
  */
object QueryStream {

  /** Query stream → top-`k` hits per query, one partition-directory
    * per micro-batch under `out`. Start with `.start()` on the
    * returned writer; read results with
    * `spark.read.option("basePath", out).parquet(out)` (carries the
    * `batch` column). */
  def serveIvf(queries: DataFrame, path: String, out: String,
      nProbe: Int = 0, k: Int = 10): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch(
      (batch: DataFrame, id: Long) => serveBatch(batch, id, path, out, nProbe, k))

  /** One micro-batch, exactly as [[serveIvf]]'s sink applies it —
    * `private[graft]` so the spec can drive a true same-id replay. */
  private[graft] def serveBatch(batch: DataFrame, batchId: Long,
      path: String, out: String, nProbe: Int, k: Int): Unit =
    if (!batch.isEmpty) {
      IvfIndex.searchPersisted(batch.sparkSession, path, batch, nProbe, k)
        .write.mode("overwrite").parquet(s"$out/batch=$batchId")
    }
}
