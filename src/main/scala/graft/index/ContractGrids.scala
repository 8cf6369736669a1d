package graft.index

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic serve-contract grids for the approximate-index
  * entries that previously ran as rows-only driver checks
  * (`ivf_build`, `ivf_search`, `nsw_search`, `nsw_build_lsh`,
  * `ann_lsh_bucketed`) — the same oracle pattern as the checked
  * /query views (Collections.queryIndexChecked): an approximate hit
  * set cannot hash-match a SQL oracle, but its CONTRACT can, and the
  * all-true grid IS SQL-exact, so a contract break (foreign id, short
  * result, misjoined score, non-monotone ranking, malformed build)
  * flips the driver's hash compare. Recall quality stays covered by
  * the measured ScalaTest bars (SURVEY §5) and `index_recall_eval`.
  *
  * Scale shape: every probe broadcasts the ≤ |queries|·k hit rows
  * into the corpus scan (never the reverse), the monotone check
  * windows over the same tiny frame, and the build grids aggregate
  * the posting/edge tables they already materialize — the checks add
  * no corpus shuffle to any entry.
  */
object ContractGrids {

  /** Per-hit contract view of a cosine ANN top-k frame
    * `(q_id, neighbor_id, score_e6, rank)` for the fixed `vec_id < 5`
    * query workload:
    *  - `id_in_corpus`: the neighbor exists in the vectors table;
    *  - `score_exact`: the reported score equals the exact stabilized
    *    cosine recomputed for that (query, neighbor) pair — a misjoin
    *    or stale-score bug cannot survive integer equality;
    *  - `top1_exact` (structural only where the index always probes
    *    the query's own location): rank 1 scores exactly 1.0 — the
    *    query vector IS a corpus vector, so a serve that loses it has
    *    broken candidate generation;
    *  - `monotone`: scores never increase with rank. */
  def annServeGrid(spark: SparkSession, dir: String, hits: DataFrame,
      withTop1: Boolean): DataFrame = {
    // materialize the k·queries rows: the probes below reference this
    // frame repeatedly and must not replay the index search
    val base = hits.select(col("q_id"), col("neighbor_id"),
        col("score_e6"), col("rank"))
      .localCheckpoint(true)
    val emb = Tables.embeddings(spark, dir)
    // corpus-side probe, keeps ≤ |hits| embedding rows for the recompute
    val nbr = emb.join(
        broadcast(base.select(col("neighbor_id").as("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rank"))
    val graded = base
      .withColumn("prev_e6", lag(col("score_e6"), 1).over(w))
      .join(broadcast(nbr), Seq("neighbor_id"), "left")
      .join(broadcast(q), Seq("q_id"), "left")
    val checks = Seq(
      col("q_id"), col("rank"),
      col("n_vec").isNotNull.as("id_in_corpus"),
      coalesce(
        Stab.e6(cosineSim(col("n_vec"), col("q_vec"))) === col("score_e6"),
        lit(false)).as("score_exact")) ++
      (if (withTop1)
        Seq((col("rank") > 1L || col("score_e6") === 1000000L).as("top1_exact"))
      else Nil) ++
      Seq((col("prev_e6").isNull || col("score_e6") <= col("prev_e6"))
        .as("monotone"))
    graded.select(checks: _*).orderBy(col("q_id"), col("rank"))
  }

  private def annServeGridSql(k: Int, withTop1: Boolean): String = {
    val top1 = if (withTop1) "true AS top1_exact, " else ""
    s"""SELECT q.q_id, CAST(r.rank AS BIGINT) AS rank, true AS id_in_corpus,
       |  true AS score_exact, ${top1}true AS monotone
       |FROM (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 5) q
       |CROSS JOIN generate_series(1, $k) r(rank)
       |ORDER BY q_id, rank""".stripMargin
  }

  /** `ivf_search`: probe search through the serve grid. `top1_exact`
    * is included — nProbe=11 of 16 clusters always covers the query's
    * own cluster on this corpus (the same property `ivf_add_delta`'s
    * grid has asserted since r4). */
  def ivfSearchChecked(spark: SparkSession, dir: String): DataFrame =
    annServeGrid(spark, dir, IvfIndex.ivfSearch(spark, dir), withTop1 = true)

  val ivfSearchCheckedSql: String = annServeGridSql(10, withTop1 = true)

  /** `ivf_search_mass`: the coverage-adaptive serve (probe until the
    * ranked cells' cumulative row mass reaches tau — round 15) through
    * the same grid. `top1_exact` is STRUCTURAL at any tau: the
    * nearest cell has prior mass 0, so it is always probed and the
    * query's own cluster always scans. */
  def ivfSearchMassChecked(spark: SparkSession, dir: String): DataFrame =
    annServeGrid(spark, dir, IvfIndex.ivfSearchMass(spark, dir),
      withTop1 = true)

  val ivfSearchMassCheckedSql: String = annServeGridSql(10, withTop1 = true)

  /** `nsw_search`: beam search through the serve grid. No `top1_exact`
    * — a greedy graph walk has no structural self-reachability
    * guarantee; self-recall is the ScalaTest bar's job. */
  def nswSearchChecked(spark: SparkSession, dir: String): DataFrame =
    annServeGrid(spark, dir, NswIndex.nswSearch(spark, dir), withTop1 = false)

  val nswSearchCheckedSql: String = annServeGridSql(5, withTop1 = false)

  /** `ann_lsh_bucketed`: bucketed LSH search through the serve grid.
    * `top1_exact` is structural here: the query's own bucket is always
    * probed (flip 0 is in the probe set), so the query vector itself
    * is always a candidate. */
  def annLshBucketedChecked(spark: SparkSession, dir: String): DataFrame =
    annServeGrid(spark, dir, LshIndex.annLshBucketed(spark, dir),
      withTop1 = true)

  val annLshBucketedCheckedSql: String = annServeGridSql(10, withTop1 = true)

  /** `ivf_build`: the build contract as a summary grid — every corpus
    * vector posted exactly once, cluster ids inside [0, k), exactly k
    * centroids. (Nearest-centroid assignment is NOT re-asserted in
    * floats: MLlib's norm-optimized distance can differ in ulps from a
    * naive recompute on boundary points, which would make an exact
    * boolean flaky — posting-completeness is the structural contract;
    * assignment quality is the recall bar's job.) */
  def ivfBuildChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val built = IvfIndex.buildCached(spark, dir)
    val n = Tables.embeddings(spark, dir).count()
    val total = built.assigned.count()
    val once = built.assigned.select($"vec_id").distinct().count()
    // the expected cell count is the corpus-derived one (kFor) — at
    // the test SFs that is exactly defaultK, on a bigger corpus the
    // invariant follows the auto sizing instead of pinning a constant
    val kExpect = IvfIndex.kFor(spark, n)
    val bad = built.assigned.filter($"cluster_id" < 0 ||
      $"cluster_id" >= kExpect).count()
    val kC = built.centroids.count()
    Seq(
      ("assigned_once", once == total),
      ("assigned_total", total == n),
      ("centroids_k", kC == kExpect.toLong),
      ("clusters_in_range", bad == 0L))
      .toDF("invariant", "holds").orderBy($"invariant")
  }

  val ivfBuildCheckedSql: String =
    """SELECT t.invariant, true AS holds
      |FROM (VALUES ('assigned_once'), ('assigned_total'), ('centroids_k'),
      |  ('clusters_in_range')) t(invariant)
      |ORDER BY invariant""".stripMargin

  /** `nsw_build_lsh`: the LSH-approximate graph-build contract as a
    * summary grid — non-empty, no self-loops, both endpoints in the
    * corpus, per-node degree ≤ the cap with consecutive 1..deg ranks,
    * and every edge score equal to the exact stabilized cosine of its
    * endpoints. Edge-set AGREEMENT with the exact build stays the
    * measured ScalaTest bar (≥ 0.9). */
  def nswBuildLshChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    // materialize once: five probes below must not replay the build
    val edges = NswIndex.buildEdgesLsh(emb).localCheckpoint(true)
    val nE = edges.count()
    val selfLoops = edges.filter($"src" === $"dst").count()
    val badEnds =
      edges.join(emb.select($"vec_id".as("src")), Seq("src"), "left_anti").count() +
      edges.join(emb.select($"vec_id".as("dst")), Seq("dst"), "left_anti").count()
    val badDeg = edges.groupBy($"src")
      .agg(count(lit(1)).as("deg"), max($"rank").as("max_rank"))
      .filter($"deg" > NswIndex.graphDegree || $"max_rank" =!= $"deg").count()
    val wrongScore = edges
      .join(emb.select($"vec_id".as("src"), $"embedding".as("s_vec")), Seq("src"))
      .join(emb.select($"vec_id".as("dst"), $"embedding".as("d_vec")), Seq("dst"))
      .filter(Stab.e6(cosineSim($"s_vec", $"d_vec")) =!= $"score_e6").count()
    Seq(
      ("degree_ranked", badDeg == 0L),
      ("endpoints_in_corpus", badEnds == 0L),
      ("no_self_loops", selfLoops == 0L),
      ("nonempty", nE > 0L),
      ("scores_exact", wrongScore == 0L))
      .toDF("invariant", "holds").orderBy($"invariant")
  }

  val nswBuildLshCheckedSql: String =
    """SELECT t.invariant, true AS holds
      |FROM (VALUES ('degree_ranked'), ('endpoints_in_corpus'),
      |  ('no_self_loops'), ('nonempty'), ('scores_exact')) t(invariant)
      |ORDER BY invariant""".stripMargin

  /** Shared filtered-serve invariant grid — ONE definition of the
    * contract every label-filtered entry asserts (persisted IVF/NSW,
    * compressed-tier ADC, and both families' filtered as-of serves),
    * so the five grids cannot silently diverge on what "filtered
    * serve" means. Over a filtered top-k frame
    * `(q_id, neighbor_id, score_e6, rank)` for the `vec_id < 5` label
    * workload:
    *  - `k_results`: exactly k rows (pre-filter semantics — a
    *    post-filtered top-k comes up short);
    *  - `all_match_label`: every neighbor satisfies the predicate,
    *    with labels re-derived from the TABLE (stale serve-side
    *    metadata flips the hash);
    *  - `self_found` / `top1_exact`: the query's own vector (which
    *    trivially matches its own label) leads at exactly 1.0;
    *  - `monotone`: scores non-increasing in rank.
    * Scale shape: both label probes broadcast ≤ |hits| rows into the
    * corpus scan; no corpus shuffle. */
  def filteredServeGrid(spark: SparkSession, dir: String,
      hits: DataFrame): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label").as("n_label"))
      .join(broadcast(hits.select(col("neighbor_id")).distinct()),
        Seq("neighbor_id"), "left_semi")
    val qLabels = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val next = hits.select(col("q_id"), (col("rank") - 1).as("rank"),
      col("score_e6").as("next_score"))
    hits
      .join(broadcast(labels), Seq("neighbor_id"))
      .join(broadcast(qLabels), Seq("q_id"))
      .join(broadcast(next), Seq("q_id", "rank"), "left")
      .groupBy(col("q_id")).agg(
        (count(lit(1)) === 10L).as("k_results"),
        (min((col("n_label") === col("q_label")).cast("int")) === 1)
          .as("all_match_label"),
        (max(when(col("neighbor_id") === col("q_id"), 1)).isNotNull)
          .as("self_found"),
        (max(when(col("rank") === 1L, col("score_e6"))) === 1000000L)
          .as("top1_exact"),
        (min(coalesce(col("next_score") <= col("score_e6"), lit(true))
          .cast("int")) === 1).as("monotone"))
      .orderBy(col("q_id"))
  }
}
