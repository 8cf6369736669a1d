package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate — the live twin of `pipeline_clean`'s
  * quality stage: score and filter documents as they arrive instead
  * of in a nightly batch. The scoring is pure per-row column algebra
  * ([[graft.text.TextOps.qualityColumns]]), so the streaming plan is
  * stateless — no watermark, no state store, exact parity with the
  * batch twin by construction — and every micro-batch is one narrow
  * codegen'd pass. Dedup against history is deliberately NOT here:
  * that is [[DedupStream]]'s job, with watermark-bounded state.
  */
object QualityStream {

  /** Thresholds ARE `pipeline_clean`'s quality-stage constants —
    * shared so batch/stream parity survives tuning: enough tokens to
    * be trainable, enough distinct tokens to reject degenerate
    * repetition. */
  def qualityGate(docs: DataFrame,
      minTokens: Long = graft.operators.Collections.QualityMinTokens,
      minDistinctRatioE6: Long = graft.operators.Collections.QualityMinDistinctRatioE6): DataFrame =
    graft.text.TextOps.qualityColumns(docs)
      .filter(col("n_tokens") >= minTokens &&
        col("distinct_ratio_e6") >= minDistinctRatioE6)
}
