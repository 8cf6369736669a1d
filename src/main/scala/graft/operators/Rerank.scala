package graft.operators

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance reranking (Carbonell & Goldstein,
  * SIGIR'98): greedily re-order a candidate list so each pick trades
  * query relevance against redundancy with what's already picked —
  * the standard diversity pass a retrieval stack runs AFTER the ANN
  * leg, absent from the reference (top-k only,
  * collection.py:243-330).
  *
  * mmr(c) = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), λ = 0.7.
  *
  * Exactness: with λ = 7/10 the greedy runs on
  * `mmr×10 = 7·rel_e6 − 3·maxsim_e6` — pure long arithmetic over the
  * already-e6-stabilized cosines, so there is not a single float op
  * in the selection itself and the DuckDB recursive-CTE oracle
  * reproduces every pick hash-exactly (ties broken by smallest id).
  *
  * Scale shape: candidate scoring and the candN² pair-similarity
  * matrix are computed DISTRIBUTED with the same codegen'd cosine as
  * the kNN family (broadcast query, single corpus scan; any ANN leg
  * could feed the candidate cut instead). Only the greedy itself runs
  * on the driver, over the BOUNDED candidate list (candN=50 rows +
  * pair longs) — the same driver-resident-serving precedent as the
  * NSW single-query walk (NswIndex.scala), not a corpus collect. At
  * 100 TB the rerank cost is a constant per query, independent of
  * corpus size.
  */
object Rerank {

  private val lambdaNum = 7L // λ·10
  private val lambdaCompl = 3L // (1−λ)·10

  /** MMR-rerank the top-`candN` cosine candidates of query `qId` down
    * to `k` diverse results: (rank, neighbor_id, relevance_e6,
    * mmr_x10_e6). */
  def mmrRerank(spark: SparkSession, dir: String, qId: Long = 0L,
      candN: Int = 50, k: Int = 10): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter($"vec_id" === qId).select($"embedding".as("q_vec"))
    // distributed leg 1: candidate cut, total-ordered (rel desc, id asc)
    val cand = emb.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= qId)
      .select($"vec_id".as("id"), $"embedding".as("emb"),
        Stab.e6(cosineSim($"embedding", $"q_vec")).as("rel"))
      .orderBy($"rel".desc, $"id".asc)
      .limit(candN)
      .localCheckpoint(true)
    // distributed leg 2: candidate×candidate similarities (candN² rows)
    val pair = cand.as("a").join(cand.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        Stab.e6(cosineSim(col("a.emb"), col("b.emb"))).as("sim"))
    val cands: Array[(Long, Long)] =
      cand.select($"id", $"rel").as[(Long, Long)].collect()
    val sims: Map[(Long, Long), Long] =
      pair.select($"a", $"b", $"sim").as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
    // driver greedy over exact longs; bounded by candN
    val picks = Array.newBuilder[(Long, Long, Long, Long)]
    var selected = List.empty[Long]
    val remaining = scala.collection.mutable.LinkedHashMap(cands.toSeq: _*)
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val (bestId, bestRel, bestMmr) = remaining.iterator.map { case (id, rel) =>
        val maxSim = if (selected.isEmpty) 0L
          else selected.iterator.map(s => sims((id, s))).max
        (id, rel, lambdaNum * rel - lambdaCompl * maxSim)
      }.reduceLeft { (x, y) =>
        if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
      }
      picks += ((rank, bestId, bestRel, bestMmr))
      selected ::= bestId
      remaining -= bestId
      rank += 1
    }
    picks.result().toSeq
      .toDF("rank", "neighbor_id", "relevance_e6", "mmr_x10_e6")
      .orderBy($"rank")
  }

  def mmrRerankEntry(spark: SparkSession, dir: String): DataFrame =
    mmrRerank(spark, dir)

  /** DuckDB twin: identical candidate cut and pair sims, then the
    * greedy as a recursive CTE carrying the selected-id list — every
    * step picks argmax(7·rel − 3·maxsim, tie min id) via a LATERAL
    * top-1, exactly the driver loop. */
  val mmrRerankSql: String = {
    val relE6 = Stab.sqlE6(KnnSearch.sqlCosine("e.embedding", "qv.q_vec"))
    val simE6 = Stab.sqlE6(KnnSearch.sqlCosine("a.emb", "b.emb"))
    s"""WITH RECURSIVE
       |qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT e.vec_id AS id, e.embedding AS emb, $relE6 AS rel
       |  FROM embeddings e CROSS JOIN qv
       |  WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, id ASC LIMIT 50),
       |pair AS (
       |  SELECT a.id AS a, b.id AS b, $simE6 AS sim
       |  FROM cand a JOIN cand b ON a.id <> b.id),
       |seed AS (SELECT CAST(1 AS BIGINT) AS rank, id, rel, 7*rel AS mmr10, [id] AS sel
       |         FROM cand ORDER BY rel DESC, id ASC LIMIT 1),
       |sel AS (
       |  SELECT * FROM seed
       |  UNION ALL
       |  SELECT s.rank + 1, p.id, p.rel, p.mmr10, list_append(s.sel, p.id)
       |  FROM sel s, LATERAL (
       |    SELECT c.id, c.rel,
       |      7*c.rel - 3*(SELECT max(pr.sim) FROM pair pr
       |                   WHERE pr.a = c.id AND list_contains(s.sel, pr.b)) AS mmr10
       |    FROM cand c WHERE NOT list_contains(s.sel, c.id)
       |    ORDER BY mmr10 DESC, c.id ASC LIMIT 1) p
       |  WHERE s.rank < 10)
       |SELECT rank, id AS neighbor_id, rel AS relevance_e6, mmr10 AS mmr_x10_e6
       |FROM sel ORDER BY rank""".stripMargin
  }
}
