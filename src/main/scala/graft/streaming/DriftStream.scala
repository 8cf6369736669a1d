package graft.streaming

import graft.operators.EmbeddingStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming embedding-drift monitor — the live twin of
  * `embedding_drift`: per-dimension Welch z of the ARRIVING
  * embeddings against a frozen baseline slice, updated every
  * micro-batch. The production shape: the baseline is yesterday's
  * ingest (here: the batch even-half moments, a d-row static frame),
  * the stream is today's, and the monitor's current table answers
  * "has the encoder/preprocessing shifted?" continuously instead of
  * at the nightly batch.
  *
  * Plan shape: the baseline joins the exploded component stream
  * BEFORE the aggregation (stream-static joins after a streaming
  * aggregation are unsupported — joining first, then carrying the
  * per-dim baseline moments through the GROUP BY keys, expresses the
  * same thing legally); the streaming aggregation keeps d keys of
  * state (dimension-cardinality — bounded forever, no watermark
  * needed); the verdict columns are [[EmbeddingStats.driftVerdict]]
  * — the SAME expression tree as the batch op, so stream ≡ batch
  * parity is by construction. Complete output mode: the sink always
  * holds the CURRENT drift table, the way a monitor is read.
  */
object DriftStream {

  /** The frozen baseline: even-half per-dim moments, batch-computed
    * once at stream start (a re-baseline is a restart — the same
    * contract as ClusterStream's exemplars). */
  def baseline(spark: SparkSession, dir: String): DataFrame =
    EmbeddingStats.sliceMoments(
      EmbeddingStats.sliceComponents(
        graft.core.Tables.embeddings(spark, dir), 0L), "a")

  /** Drift of the arriving odd-half stream against `base`. */
  def drift(stream: DataFrame, base: DataFrame): DataFrame = {
    val comp = EmbeddingStats.sliceComponents(
        stream.select(col("vec_id"), col("embedding")), 1L)
      .join(broadcast(base), Seq("dim"))
    val agg = comp
      .groupBy(col("dim"), col("n_a"), col("sum_a_e6"), col("var_num_a"))
      .agg(count(lit(1)).as("n_b"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("ss"))
      .select(col("dim"), col("n_a"), col("sum_a_e6"), col("var_num_a"),
        col("n_b"), col("s").as("sum_b_e6"),
        (col("n_b") * col("ss") - col("s") * col("s")).as("var_num_b"))
    EmbeddingStats.driftVerdict(agg)
  }
}
