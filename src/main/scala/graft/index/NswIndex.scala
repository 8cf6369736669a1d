package graft.index

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NSW (navigable small world) — the reference's graph index
  * (/root/reference/src/models/nsw_index.py) re-expressed for batch:
  *
  *  - BUILD (nsw_index.py:36-52): the k-nearest-neighbor graph is a
  *    single batch job — score candidate pairs, keep top-`k` per
  *    node. Here candidates are exact (the embeddings tables are
  *    small); at 100 TB the identical plan runs over LSH-bucketed
  *    candidates (`LshIndex`) instead of the cross product.
  *  - SEARCH (nsw_index.py:117-165): the reference's per-query greedy
  *    walk becomes a fixed number of BSP supersteps: expand the
  *    frontier through the edges table (one equality join per hop),
  *    score new nodes, keep a beam. All queries traverse
  *    simultaneously — per-hop cost is one join, independent of query
  *    count.
  *
  * Deterministic: entry point = min vec_id, beam ties broken on
  * (score_e6 desc, vec_id asc).
  */
object NswIndex {

  val graphDegree = 5 // matches reference NSWIndex(n_neighbors=5)
  val beamWidth = 16
  val hops = 6
  // LSH candidate generation for the graph build (the 100 TB path):
  // bucket bit depth adapts to n (LshIndex.adaptiveBits, target ~64
  // rows/bucket) so within-bucket pair counts stay linear; multiple
  // independent tables + NN-descent refinement recover neighbors a
  // single bucketing splits apart. Measured (graft.Tune, sf0.001 and
  // sf0.01): 10 tables × 2 refine rounds → 0.94 edge agreement with
  // the exact build; 8 tables → 0.91 (clears the ≥0.9 bar with <1%
  // margin — the ~20% build saving is not worth the thin margin);
  // 6 tables → 0.84 (fails). 10 is the measured choice.
  val buildTables = 10
  val buildTargetBucket = 64
  val buildRefineRounds = 2

  /** Directed kNN edges: top-`graphDegree` neighbors per vector.
    * EXACT mode — all-pairs scoring; n² and only for oracle-checkable
    * small data. The scale path is [[buildEdgesLsh]]. */
  def buildEdges(emb: DataFrame, degree: Int = graphDegree): DataFrame = {
    val pairs = emb.select(col("vec_id").as("src"), col("embedding").as("src_vec"))
      .crossJoin(emb.select(col("vec_id").as("dst"), col("embedding").as("dst_vec")))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        Stab.e6(cosineSim(col("src_vec"), col("dst_vec"))).as("score_e6"))
    pairs.withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("score_e6").desc, col("dst").asc)).cast("long"))
      .filter(col("rank") <= degree)
  }

  /** Directed kNN edges from LSH-bucketed candidates, refined by
    * NN-descent — the 100 TB build (reference nsw_index.py:36-52
    * computes the same top-k graph by brute force in-process).
    *
    * Round 0: candidate pairs from `buildTables` independent
    * random-hyperplane bucketings; each table contributes only
    * within-bucket pairs (a bucket-equality self-join — linear shuffle
    * + bucket-local expansion, never n²).
    *
    * Refinement (NN-descent, Dong et al. WWW'11): a vector's true
    * neighbors are usually neighbors of its neighbors, so one round of
    * 2-hop expansion over the UNDIRECTED round-0 graph (forward +
    * reverse edges), rescore, top-k recovers most edges a bucketing
    * split apart. Per-node candidate count is (2·degree)² — linear in
    * n, never all-pairs. */
  def buildEdgesLsh(emb: DataFrame, degree: Int = graphDegree,
      nTables: Int = buildTables, nBits: Int = -1,
      refineRounds: Int = buildRefineRounds): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    val bits =
      if (nBits > 0) nBits
      else LshIndex.adaptiveBits(base.count(), buildTargetBucket)
    def topEdges(cand: DataFrame): DataFrame = {
      val scored = cand
        .join(base.select(col("vec_id").as("src"), col("embedding").as("src_vec")), Seq("src"))
        .join(base.select(col("vec_id").as("dst"), col("embedding").as("dst_vec")), Seq("dst"))
        .select(col("src"), col("dst"),
          Stab.e6(cosineSim(col("src_vec"), col("dst_vec"))).as("score_e6"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("score_e6").desc, col("dst").asc)).cast("long"))
        .filter(col("rank") <= degree)
    }
    val cand = LshIndex.saltedCandidatePairs(base, nTables, bits,
      bucketCap = 128, seedBase = 1042L)
    var edges = topEdges(cand.distinct())
    (0 until refineRounds).foreach { _ =>
      // Materialize the round's edges: the 2-hop self-join references
      // them three times and the LSH plan must not replay per use.
      val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val hop2 = und.as("a").join(und.as("b"),
          col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      edges = topEdges(und.unionByName(hop2).distinct())
    }
    edges
  }

  /** Session-scoped edge-table memo — same rationale as
    * IvfIndex.buildCached: the reference builds the graph once
    * (nsw_index.py:36-52) and serves every query from it. Keyed by
    * (session, dir) and invalidated by store writes under the dir. */
  private val edgeCache =
    new graft.store.VersionedMemo[DataFrame](_.unpersist())

  def edgesCached(spark: SparkSession, dir: String): DataFrame =
    edgeCache.get(spark, dir, dir)(
      buildEdges(Tables.embeddings(spark, dir)).cache())

  /** Memoized edge table over an arbitrary corpus (e.g.
    * document-content embeddings) under an explicit cache key — uses
    * the LSH+NN-descent build (the scale path), not the exact n²
    * build that only exists for the SQL oracle. `versionDir` is the
    * data dir whose writes must invalidate the graph. */
  def edgesCachedFor(key: String, emb: DataFrame, versionDir: String): DataFrame =
    edgeCache.get(emb.sparkSession, key, versionDir)(
      buildEdgesLsh(emb).cache())

  /** `nsw_build` query (oracle: plain SQL — same top-k-per-node). */
  def nswBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    edgesCached(spark, dir).orderBy($"src", $"rank")
  }

  /** `nsw_build_lsh` query: the LSH-candidate graph build (rows-only
    * driver check; the edge-agreement spec vs the exact build is the
    * correctness bar). */
  def nswBuildLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    buildEdgesLsh(Tables.embeddings(spark, dir)).orderBy($"src", $"rank")
  }

  val nswBuildSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    val cos = s"(CASE WHEN ${dot("a.embedding", "a.embedding")} = 0 OR ${dot("b.embedding", "b.embedding")} = 0 THEN 0.0 " +
      s"ELSE ${dot("a.embedding", "b.embedding")} / (sqrt(${dot("a.embedding", "a.embedding")}) * sqrt(${dot("b.embedding", "b.embedding")})) END)"
    s"""WITH scored AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst, ${Stab.sqlE6(cos)} AS score_e6
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |)
       |SELECT src, dst, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY src
       |    ORDER BY score_e6 DESC, dst ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= $graphDegree
       |ORDER BY src, rank""".stripMargin
  }

  /** Persist the graph index in its scale layout: the edge table plus
    * the vectors it indexes. At 100 TB the graph build is a batch job
    * whose output must be a table — serving then reads the layout
    * instead of paying an inline build per session (the reference
    * builds once in memory and serves every query from it,
    * nsw_index.py:36-52; this is the batch analog, matching
    * [[IvfIndex.persist]]'s contract). At cluster scale both tables
    * would be bucketed by their join key (`node`/`vec_id`) so each
    * beam superstep joins without an Exchange; the seam is this one
    * writer. */
  def persist(emb: DataFrame, edges: DataFrame, path: String): Unit = {
    edges.select(col("src"), col("dst")).write.mode("overwrite")
      .parquet(s"$path/edges")
    emb.select(col("vec_id"), col("embedding")).write.mode("overwrite")
      .parquet(s"$path/vectors")
  }

  /** Beam search against a persisted layout — same traversal as
    * [[beamSearch]], reading the index tables from disk. */
  def searchPersisted(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, singleQuery: Boolean = false): DataFrame =
    beamSearch(
      spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/edges"),
      queries, k, singleQuery)

  /** Batch beam search over a prebuilt edge table for a queries
    * frame (q_id, q_vec). Returns top-`k` of everything visited.
    *
    * `singleQuery = true` switches every per-query window (beam cut,
    * final rank) to orderBy+limit: with one query the windows'
    * `partitionBy(q_id)` constant-folds to an empty partition spec and
    * Spark moves the whole frontier into one task per hop. */
  def beamSearch(emb: DataFrame, edges: DataFrame, queries: DataFrame,
      k: Int = 5, singleQuery: Boolean = false): DataFrame = {
    // The graph and vectors are the persisted index: materialize once.
    // Without this every superstep re-derives the whole kNN build.
    val embSel = emb.select(col("vec_id").as("node"), col("embedding")).cache()
    // Traverse the UNDIRECTED graph: the reference inserts
    // bidirectional links (nsw_index.py:36-52), so a node is reachable
    // through its own out-edges reversed even when no other node ranks
    // it in ITS top-k — with directed-only expansion a newly inserted
    // vector can be unreachable from the entry point.
    val edgeSel = edges.select(col("src").as("node"), col("dst"))
      .unionByName(edges.select(col("dst").as("node"), col("src").as("dst")))
      .cache()
    val scoreAgainst = (nodes: DataFrame) =>
      nodes.join(embSel, Seq("node"))
        .select(col("q_id"), col("node"),
          Stab.e6(cosineSim(col("embedding"), col("q_vec"))).as("score_e6"),
          col("q_vec"))
    val entry = emb.agg(min(col("vec_id")).as("node"))
    // localCheckpoint: each superstep's result is tiny (queries × beam)
    // — materializing it stops the plan DAG doubling per hop.
    var visited = scoreAgainst(queries.crossJoin(broadcast(entry))).localCheckpoint(true)
    var frontier = visited
    for (_ <- 1 to hops) {
      val expanded = frontier
        .join(edgeSel, Seq("node"))
        .select(col("q_id"), col("dst").as("node"), col("q_vec"))
        .distinct()
        .join(visited.select(col("q_id"), col("node")), Seq("q_id", "node"), "left_anti")
      val scored = scoreAgainst(expanded).localCheckpoint(true)
      visited = visited.unionByName(scored).localCheckpoint(true)
      frontier =
        if (singleQuery)
          scored.orderBy(col("score_e6").desc, col("node").asc).limit(beamWidth)
        else
          scored.withColumn("brank", row_number().over(
              Window.partitionBy(col("q_id")).orderBy(col("score_e6").desc, col("node").asc)))
            .filter(col("brank") <= beamWidth)
            .drop("brank")
    }
    // the final ranking reads only the checkpointed `visited` — the
    // loop-scratch caches must not pile up across beam invocations
    embSel.unpersist()
    edgeSel.unpersist()
    if (singleQuery)
      graft.operators.KnnSearch.topKSingle(
        visited.select(col("q_id"), col("node").as("neighbor_id"), col("score_e6")),
        k, asc = false)
    else
      visited.withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("score_e6").desc, col("node").asc)).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("node").as("neighbor_id"), col("score_e6"), col("rank"))
        .orderBy(col("q_id"), col("rank"))
  }

  /** `nsw_search` query: beam search for the fixed query set.
    * Rows-only check (+ recall spec vs brute force). */
  def nswSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val edges = edgesCached(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    beamSearch(emb, edges, queries)
  }
}
