package graft.operators

import graft.core.{Stab, Tables}
import graft.embed.Embedder
import graft.functions.vectors._
import graft.text.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hybrid retrieval: BM25 (sparse/lexical) ⊕ dense-cosine legs fused
  * with reciprocal-rank fusion — the two-tower search every modern
  * corpus store serves and the reference (dense-only,
  * collection.py:243-330) cannot express.
  *
  * RRF (Cormack & Clarke, SIGIR'09): score(d) = Σ_legs 1/(K + rank_d),
  * K=60. Rank fusion needs no score calibration between legs — exactly
  * why it's the industry default for BM25⊕dense.
  *
  * Scale shape: each leg is independently output-bounded (top-20 per
  * query) before the fusion join, so the full-outer join and the final
  * re-rank run on ≤ 2·20·|queries| rows regardless of corpus size —
  * fusion cost is a function of the workload, never the data. The legs
  * themselves are the already-audited BM25 ([[graft.text.Bm25]]) and
  * broadcast-cross-join cosine shapes. Per-leg RRF contributions are
  * e6-stabilized then summed as exact longs (order-free).
  */
object Hybrid {

  val rrfK = 60
  private val legK = 20

  /** Dense leg: embed query text and document text with the engine
    * embedder, rank by e6-stabilized cosine. */
  def vecRanked(spark: SparkSession, dir: String, k: Int = legK): DataFrame = {
    import spark.implicits._
    val q = Bm25.queries.toDF("q_id", "qtext")
      .select($"q_id", Embedder.embedText($"qtext").as("q_vec"))
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", Embedder.embedText($"text").as("emb"))
    val scored = docs.crossJoin(broadcast(q))
      .select($"q_id", $"doc_id".as("neighbor_id"),
        Stab.e6(cosineSim($"emb", $"q_vec")).as("score_e6"))
    KnnSearch.topK(scored, k, asc = false)
      .select($"q_id", $"neighbor_id".as("doc_id"), $"rank".as("vec_rank"))
  }

  /** e6-stabilized RRF contribution for a 1-based rank column. */
  private def rrfE6(rank: org.apache.spark.sql.Column) =
    Stab.e6(lit(1.0) / (lit(rrfK.toDouble) + rank.cast("double")))

  /** Fused top-k: (q_id, rank, doc_id, bm25_rank, vec_rank, rrf_e6);
    * a leg miss is carried as rank -1 / contribution 0. */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val bm = Bm25.ranked(spark, dir, legK)
      .select($"q_id", $"doc_id", $"rank".as("bm25_rank"))
    val vec = vecRanked(spark, dir)
    val fused = bm.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .select($"q_id", $"doc_id",
        coalesce($"bm25_rank", lit(-1L)).as("bm25_rank"),
        coalesce($"vec_rank", lit(-1L)).as("vec_rank"),
        (when($"bm25_rank".isNotNull, rrfE6($"bm25_rank")).otherwise(lit(0L)) +
          when($"vec_rank".isNotNull, rrfE6($"vec_rank")).otherwise(lit(0L)))
          .as("rrf_e6"))
    val w = Window.partitionBy($"q_id")
      .orderBy($"rrf_e6".desc, $"doc_id".asc)
    fused.withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= k)
      .select($"q_id", $"rank", $"doc_id", $"bm25_rank", $"vec_rank", $"rrf_e6")
      .orderBy($"q_id", $"rank")
  }

  /** `hybrid_rrf` registry entry: the fused top-10 pushed through an
    * invariant grid (the house pattern for ops whose dense leg DuckDB
    * cannot recompute — the BM25 leg's values are already fully
    * SQL-oracled by `text_bm25`). Checks, all recomputed from
    * independent frames, so a broken fusion flips the hash:
    *  - `doc_in_corpus` — fused ids are real documents;
    *  - `bm25_leg_ok`   — carried bm25_rank equals the standalone
    *    BM25 ranking's rank for that (q, doc), INCLUDING the miss
    *    case (-1 ⇔ absent from the leg's top-20);
    *  - `vec_leg_ok`    — same contract against the dense leg;
    *  - `rrf_consistent` — rrf_e6 re-derived from the carried
    *    component ranks with exact long arithmetic;
    *  - `monotone_ok`   — fused ranking non-increasing in rrf_e6.
    */
  def hybridRrfChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fused feeds four frames below — materialize the bounded result
    // once instead of re-running both legs per consumer
    val fused = hybridRrf(spark, dir).localCheckpoint(true)
    val bm = Bm25.ranked(spark, dir, legK)
      .select($"q_id", $"doc_id", $"rank".as("bm_chk"))
    val vec = vecRanked(spark, dir)
      .select($"q_id", $"doc_id", $"vec_rank".as("vec_chk"))
    val docs = Tables.documents(spark, dir).select($"doc_id")
    val nextRow = fused.select($"q_id", ($"rank" - 1).as("rank"),
      $"rrf_e6".as("next_rrf"))
    fused
      .join(broadcast(docs.join(broadcast(fused.select($"doc_id").distinct()),
        Seq("doc_id"), "left_semi").withColumn("in_corpus", lit(true))),
        Seq("doc_id"), "left")
      .join(broadcast(bm), Seq("q_id", "doc_id"), "left")
      .join(broadcast(vec), Seq("q_id", "doc_id"), "left")
      .join(broadcast(nextRow), Seq("q_id", "rank"), "left")
      .select($"q_id", $"rank",
        coalesce($"in_corpus", lit(false)).as("doc_in_corpus"),
        coalesce(($"bm25_rank" === -1L && $"bm_chk".isNull) ||
          $"bm25_rank" === $"bm_chk", lit(false)).as("bm25_leg_ok"),
        coalesce(($"vec_rank" === -1L && $"vec_chk".isNull) ||
          $"vec_rank" === $"vec_chk", lit(false)).as("vec_leg_ok"),
        ($"rrf_e6" ===
          (when($"bm25_rank" =!= -1L, rrfE6($"bm25_rank")).otherwise(lit(0L)) +
            when($"vec_rank" =!= -1L, rrfE6($"vec_rank")).otherwise(lit(0L))))
          .as("rrf_consistent"),
        coalesce($"next_rrf" <= $"rrf_e6", lit(true)).as("monotone_ok"))
      .orderBy($"q_id", $"rank")
  }

  /** Oracle: the all-true grid over the workload × top-10 shape. */
  val hybridRrfCheckedSql: String = {
    val qids = Bm25.queries.map(q => s"CAST(${q._1} AS BIGINT)").mkString(", ")
    s"""SELECT q.q_id, r.rank, true AS doc_in_corpus, true AS bm25_leg_ok,
       |  true AS vec_leg_ok, true AS rrf_consistent, true AS monotone_ok
       |FROM (SELECT unnest([$qids]) AS q_id) q
       |CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS rank) r
       |ORDER BY q_id, rank""".stripMargin
  }
}
