package graft.streaming

import graft.operators.Clusters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exemplar assignment — the live twin of
  * `cluster_assign`'s E-step: route vectors to their nearest fixed
  * exemplar AS THEY ARRIVE (the online ingest path of a clustered /
  * IVF-routed corpus layout). The assignment is per-row struct-max
  * algebra over one broadcast exemplar row
  * ([[Clusters.assignColumns]] — the window-free shape built for
  * exactly this), so the streaming plan is STATELESS: no watermark,
  * no state store, exact batch parity by construction, every
  * micro-batch one narrow codegen'd pass. Per-cluster rollups over
  * the stream belong downstream (a windowed agg or the batch card) —
  * this component is the routing stage.
  */
object ClusterStream {

  /** Exemplars from the BATCH corpus (the fixed `vec_id < K`
    * convention): the model rides one collected broadcast row, read
    * once at stream start — a swap to retrained exemplars is a
    * restart, which is exactly how a versioned index rolls. */
  def exemplars(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.core.Tables.embeddings(spark, dir).filter($"vec_id" < Clusters.K)
      .select($"vec_id".as("cluster_id"), $"embedding".as("c_vec"))
  }

  /** Assign a (vec_id, embedding) stream to its nearest exemplars. */
  def assign(stream: DataFrame, exemplars: DataFrame): DataFrame =
    Clusters.assignColumns(stream.select(col("vec_id"), col("embedding")),
      exemplars)
}
