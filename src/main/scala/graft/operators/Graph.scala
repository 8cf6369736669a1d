package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link analysis over the near-duplicate candidate graph.
  *
  * `graph_pagerank`: PageRank centrality on the MinHash near-dup
  * graph (the same banded candidate pairs `dedup_components`
  * clusters, est-Jaccard ≥ 0.5). High-rank nodes are template /
  * boilerplate HUBS — documents that near-duplicate many others
  * transitively — which a keep-one-per-component dedup hides: a
  * component's hub is usually the template, and its rank separates
  * "the template" from "one of its instances" for removal-priority
  * decisions.
  *
  * Exactness: the whole iteration is INTEGER arithmetic, so the
  * result is hash-exact cross-engine (the recursive-CTE oracle
  * replays the same recurrence). rank₀ = 1e6 per node; each round
  * every node sends `rank div deg` to each neighbour (truncating
  * BIGINT division — Spark `div` ≡ DuckDB `//`, measured round 8)
  * and ranks update as `0.15·1e6 + 0.85·Σ incoming` via the integer
  * cross-multiply `150000 + (85·Σ) div 100`. Fixed 5 supersteps —
  * a contract bound like dedup_components' hop cap, not a
  * convergence test, so the loop runs ZERO driver actions.
  *
  * Scale (100 TB): edges are the BANDED candidate pairs (linear in
  * the corpus, per-bucket caps upstream in the LSH machinery) —
  * never all-pairs. Each superstep is one shuffle keyed on doc_id
  * over the pair graph; 5 fixed supersteps = 5 bounded shuffles,
  * no driver round-trips, no broadcast of anything
  * corpus-proportional. The 85·Σ product stays far below Long range
  * (Σ over one node's in-neighbours is bounded by total graph mass
  * only in the pathological one-hub-receives-everything graph; the
  * per-bucket pair caps bound real in-degree).
  */
object GraphOps {

  /** Supersteps — a fixed contract bound shared with the oracle. */
  val iterations = 5

  /** Same candidate threshold as `dedup_components` (est ≥ 0.5). */
  val minEstJaccardE6 = 500000L

  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.minhash(spark, dir)
      .filter($"est_jaccard_e6" >= minEstJaccardE6)
      .select($"doc_a", $"doc_b")
    // undirected: both directions once; checkpointed — reused 5×
    val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy($"src".as("doc_id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var rank = deg.select($"doc_id", $"deg", lit(1000000L).as("rank_e6"))
    for (_ <- 1 to iterations) {
      // every graph node has in-degree ≥ 1 (undirected), so the
      // inner joins preserve exactly the node set each round
      val in = edges
        .join(rank.select($"doc_id".as("src"),
          expr("rank_e6 div deg").as("c")), Seq("src"))
        .groupBy($"dst".as("doc_id"))
        .agg(sum($"c").as("cin"))
      rank = in.join(deg, Seq("doc_id"))
        .select($"doc_id", $"deg",
          expr("150000 + 85 * cin div 100").as("rank_e6"))
    }
    rank.orderBy($"doc_id")
  }

  val graphPagerankSql: String =
    s"""WITH RECURSIVE cand AS (
       |  SELECT doc_a, doc_b FROM (${Dedup.minhashSql}) t
       |  WHERE est_jaccard_e6 >= $minEstJaccardE6
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand
       |), nodes AS (SELECT src AS doc_id, count(*) AS deg FROM e GROUP BY src),
       |pr AS (
       |  SELECT 0 AS iter, doc_id, CAST(1000000 AS BIGINT) AS rank_e6 FROM nodes
       |  UNION ALL
       |  SELECT s.iter + 1, s.dst, CAST(150000 + (85 * s.c) // 100 AS BIGINT)
       |  FROM (
       |    SELECT pr.iter AS iter, e.dst AS dst,
       |      CAST(sum(pr.rank_e6 // nd.deg) AS BIGINT) AS c
       |    FROM pr JOIN e ON e.src = pr.doc_id
       |    JOIN nodes nd ON nd.doc_id = pr.doc_id
       |    WHERE pr.iter < $iterations GROUP BY 1, 2) s
       |)
       |SELECT pr.doc_id, nodes.deg, pr.rank_e6
       |FROM pr JOIN nodes ON nodes.doc_id = pr.doc_id
       |WHERE iter = $iterations
       |ORDER BY pr.doc_id""".stripMargin
}
