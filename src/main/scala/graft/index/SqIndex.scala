package graft.index

import graft.core.{Stab, Tables}
import graft.operators.KnnSearch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar (int8) quantization over the `embeddings` table — the
  * simple sibling of product quantization: each dimension is affinely
  * mapped to a byte against per-dimension corpus bounds, so a vector
  * stores d bytes instead of d×4 float bytes and a brute scan reads
  * 4× less. Where IVF-PQ ([[IvfIndex.pqBuild]]) buys the big
  * memory/scan win with a codebook, SQ8 is the zero-training variant
  * every vector store ships first (the reference scans raw floats
  * only, /root/reference/src/models/collection.py:243-330 — this is
  * the drop-in compressed form of that same scan).
  *
  * Everything is pure column algebra and integer-exact across
  * engines:
  *  - bounds are exact float min/max per dimension (no arithmetic);
  *  - `code_i = clamp(floor((v_i − mn_i)·255/(mx_i − mn_i) + 0.5))`
  *    computed in doubles with the cast-then-subtract order the
  *    DuckDB twin uses verbatim — IEEE-identical, so codes match
  *    bit-for-bit;
  *  - the asymmetric (raw query × dequantized corpus) dot accumulates
  *    left-to-right in doubles, matching `list_sum` over a
  *    `generate_series` transform, then e6-stabilizes for ranking.
  *
  * Scale shape: the bounds aggregation is one corpus scan whose
  * partial state is d×2 floats per task; the per-dimension stats then
  * COLLAPSE to a single broadcast array row (the `knn_join_ivf`
  * pattern — no driver collect, no plan literals), so quantize +
  * score + per-query top-k all happen map-side inside the one scan,
  * and only k·queries rows reach the rank shuffle.
  */
object SqIndex {

  /** Per-dimension quantizer stats: exact float min/max and the
    * byte-step, e6-stabilized for the oracle. 1-based `dim` to match
    * DuckDB's `generate_subscripts`. */
  def sqBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dimStats(Tables.embeddings(spark, dir))
      .select($"dim", Stab.e6($"mn".cast("double")).as("mn_e6"),
        Stab.e6($"mx".cast("double")).as("mx_e6"),
        Stab.e6(step($"mn", $"mx")).as("step_e6"))
      .orderBy($"dim")
  }

  val sqBuildSql: String =
    s"""SELECT i AS dim,
       |  ${Stab.sqlE6("CAST(mn AS DOUBLE)")} AS mn_e6,
       |  ${Stab.sqlE6("CAST(mx AS DOUBLE)")} AS mx_e6,
       |  ${Stab.sqlE6("CASE WHEN CAST(mx AS DOUBLE) = CAST(mn AS DOUBLE) THEN 0.0 ELSE (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 255.0 END")} AS step_e6
       |FROM (
       |  SELECT i, min(v) AS mn, max(v) AS mx
       |  FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)
       |  GROUP BY i)
       |ORDER BY dim""".stripMargin

  /** (dim, mn, mx) per dimension, 1-based, exact floats. */
  private[index] def dimStats(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select(posexplode($"embedding").as(Seq("p", "v")))
      .groupBy(($"p" + 1).cast(LongType).as("dim"))
      .agg(min($"v").as("mn"), max($"v").as("mx"))
  }

  private def step(mn: Column, mx: Column): Column =
    when(mx.cast("double") === mn.cast("double"), 0.0)
      .otherwise((mx.cast("double") - mn.cast("double")) / 255.0)

  /** `knn_brute_sq`: brute top-k where the corpus side is SQ8-coded
    * and scores are the asymmetric dequantized dot product — the
    * compressed twin of [[KnnSearch.bruteDot]] (same queries, same k,
    * same tie-break), fully SQL-oracled because the quantizer is
    * deterministic integer arithmetic. Recall vs the exact scan is
    * the ScalaTest bar (SqSpec). */
  def knnBruteSq(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    // per-dim stats → ONE broadcast row holding (mns, mxs) arrays
    val bounds = dimStats(emb).agg(
      transform(array_sort(collect_list(struct($"dim", $"mn"))), s => s("mn")).as("mns"),
      transform(array_sort(collect_list(struct($"dim", $"mx"))), s => s("mx")).as("mxs"))
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // codes materialize map-side inside the scan stage; at rest they
    // would persist as array<byte> (d bytes), the 4× scan win
    val coded = emb.crossJoin(broadcast(bounds))
      .select($"vec_id", $"mns", $"mxs",
        transform($"embedding", (v, i) => {
          val mn = element_at($"mns", i + 1).cast("double")
          val mx = element_at($"mxs", i + 1).cast("double")
          when(mx === mn, 0L).otherwise(
            least(lit(255L), greatest(lit(0L),
              floor((v.cast("double") - mn) * 255.0 / (mx - mn) + 0.5).cast(LongType))))
        }).as("code"))
    val scored = coded.crossJoin(broadcast(q))
      .select($"q_id", $"vec_id".as("neighbor_id"),
        Stab.e6(aggregate(
          transform($"q_vec", (qv, i) => {
            val mn = element_at($"mns", i + 1).cast("double")
            val mx = element_at($"mxs", i + 1).cast("double")
            val dq = mn + element_at($"code", i + 1).cast("double") * step(mn, mx)
            qv.cast("double") * dq
          }),
          lit(0.0), (acc, x) => acc + x)).as("score_e6"))
    KnnSearch.topK(scored, k, asc = false)
  }

  val knnBruteSqSql: String = {
    val mnD = "CAST(mns[i] AS DOUBLE)"
    val mxD = "CAST(mxs[i] AS DOUBLE)"
    val code =
      s"CASE WHEN $mxD = $mnD THEN 0 ELSE CAST(least(255, greatest(0, " +
        s"CAST(floor((CAST(embedding[i] AS DOUBLE) - $mnD) * 255.0 / ($mxD - $mnD) + 0.5) AS BIGINT))) AS BIGINT) END"
    val stepI = s"CASE WHEN $mxD = $mnD THEN 0.0 ELSE ($mxD - $mnD) / 255.0 END"
    val dq = s"($mnD + CAST(code[i] AS DOUBLE) * $stepI)"
    s"""WITH stats AS (
       |  SELECT i, min(v) AS mn, max(v) AS mx
       |  FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)
       |  GROUP BY i
       |), bounds AS (
       |  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats
       |), coded AS (
       |  SELECT vec_id, mns, mxs,
       |    list_transform(generate_series(1, len(embedding)), i -> $code) AS code
       |  FROM embeddings CROSS JOIN bounds
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5
       |), scored AS (
       |  SELECT q.q_id, c.vec_id AS neighbor_id,
       |    ${Stab.sqlE6(s"list_sum(list_transform(generate_series(1, len(q.q_vec)), i -> CAST(q.q_vec[i] AS DOUBLE) * $dq))")} AS score_e6
       |  FROM coded c CROSS JOIN q
       |)
       |SELECT q_id, neighbor_id, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_e6 DESC, neighbor_id ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }
}
