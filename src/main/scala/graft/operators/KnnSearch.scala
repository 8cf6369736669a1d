package graft.operators

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brute-force exact kNN over the `embeddings` table — the Spark
  * re-expression of the reference's
  * `BruteForceCosineSimilarityIndex.search`
  * (/root/reference/src/models/collection.py:243-330) plus the metric
  * variants and the batch kNN-join the reference runs as one query at
  * a time.
  *
  * Plan shape (and why it scales): query vectors are a tiny relation →
  * `broadcast` cross join against the big table (no shuffle of the
  * vectors), score with a codegen'd expression, then per-query top-k
  * via `row_number <= k` which Spark ≥3.5 executes as a
  * WindowGroupLimit (per-partition k-row heap before the single
  * shuffle on q_id). The big table is scanned exactly once per batch
  * of queries, never re-shuffled — at 100 TB the scan is the only
  * unavoidable cost and everything else stays map-side.
  *
  * Ranking happens on the e6-stabilized score so the top-k cut is
  * reproducible across engines (SURVEY.md §5).
  */
object KnnSearch {

  /** Per-query top-k given a scored (q_id, neighbor_id, score_e6) frame.
    * `asc=true` ranks ascending (distances), else descending. */
  def topK(scored: DataFrame, k: Int, asc: Boolean): DataFrame = {
    val order: Seq[Column] =
      if (asc) Seq(col("score_e6").asc, col("neighbor_id").asc)
      else Seq(col("score_e6").desc, col("neighbor_id").asc)
    val w = Window.partitionBy(col("q_id")).orderBy(order: _*)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Per-query top-k for a SINGLE-query scored frame. [[topK]] over a
    * constant q_id is a scale-killer: constant folding empties the
    * window's partition spec and Spark funnels every scored row into
    * ONE task ("No Partition Defined for Window operation"). The
    * single-query cut is orderBy+limit instead — TakeOrderedAndProject
    * keeps per-partition k-row heaps and merges k·partitions rows, so
    * the corpus never converges on one task. The rank column is
    * recovered from the k materialized winners by a k² self-join
    * (constant work), not a window. */
  def topKSingle(scored: DataFrame, k: Int, asc: Boolean): DataFrame = {
    val order: Seq[Column] =
      if (asc) Seq(col("score_e6").asc, col("neighbor_id").asc)
      else Seq(col("score_e6").desc, col("neighbor_id").asc)
    // materialize the winners once: both sides of the rank self-join
    // read them, and the corpus scan must not run twice
    val top = scored.orderBy(order: _*).limit(k).localCheckpoint(true)
    val beatsOnScore =
      if (asc) col("b.score_e6") < col("a.score_e6")
      else col("b.score_e6") > col("a.score_e6")
    // rank(a) = |{b : b sorts at-or-before a}| — ids are distinct per
    // query so the (score, id) order is total and the count is exact
    val beatsOrEq = beatsOnScore ||
      (col("b.score_e6") === col("a.score_e6") &&
        col("b.neighbor_id") <= col("a.neighbor_id"))
    top.as("a").join(top.as("b"), beatsOrEq)
      .groupBy(col("a.q_id").as("q_id"), col("a.neighbor_id").as("neighbor_id"),
        col("a.score_e6").as("score_e6"))
      .agg(count(lit(1)).cast("long").as("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def scoredAgainstQueries(spark: SparkSession, dir: String,
      queryPred: Column, score: (Column, Column) => Column): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Stab.e6(score(col("embedding"), col("q_vec"))).as("score_e6"))
  }

  def bruteCosine(spark: SparkSession, dir: String): DataFrame =
    topK(scoredAgainstQueries(spark, dir, col("vec_id") < 5, cosineSim), 10, asc = false)

  def bruteDot(spark: SparkSession, dir: String): DataFrame =
    topK(scoredAgainstQueries(spark, dir, col("vec_id") < 5, dotProduct), 10, asc = false)

  def bruteL2(spark: SparkSession, dir: String): DataFrame =
    topK(scoredAgainstQueries(spark, dir, col("vec_id") < 5, l2Distance), 10, asc = true)

  /** Exact kNN join for a bounded query set (every 50th vector),
    * self-matches excluded — the batch analog of running the /query
    * endpoint for a workload of queries at once. */
  def knnJoinExact(spark: SparkSession, dir: String): DataFrame =
    topK(
      scoredAgainstQueries(spark, dir, col("vec_id") % 50 === 0, cosineSim)
        .filter(col("q_id") =!= col("neighbor_id")),
      5, asc = false)

  /** `knn_filtered`: metadata-constrained exact kNN — each query
    * returns the top-k among vectors sharing its `label` (the
    * multi-tenant / attribute-predicate serving shape). The predicate
    * is part of the broadcast-join condition, so it evaluates map-side
    * during the single corpus scan; the rank shuffle carries only
    * matching rows. This is the exact oracle the IVF filtered probe
    * (`ivf_search_filtered`) is measured against. */
  def knnFiltered(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Stab.e6(cosineSim(col("embedding"), col("q_vec"))).as("score_e6"))
    topK(scored, k, asc = false)
  }

  /** `range_search`: radius query — EVERY neighbor whose cosine clears
    * the threshold, not a fixed k. The reference serves only top-k
    * (nsw_index.py:117-165, ivf_index.py:139-185); a radius cut is the
    * retrieval shape dedup and recall evaluation actually need, so it
    * is exposed as a first-class search.
    *
    * Scale shape: identical single-scan broadcast cross join as the
    * kNN family, but the threshold is applied MAP-SIDE on the scored
    * stream — the shuffle into the per-query rank window carries only
    * matches (output-bounded, ~1% of rows at 0.25 on this corpus),
    * never the corpus. Self-match included by design (rank 1,
    * score 1.0): a radius set without the query itself is a dedup
    * convention, not a search one. */
  def rangeSearch(spark: SparkSession, dir: String,
      thresholdE6: Long = 250000L): DataFrame = {
    val scored = scoredAgainstQueries(spark, dir, col("vec_id") < 5, cosineSim)
      .filter(col("score_e6") >= thresholdE6)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---- DuckDB oracle SQL -------------------------------------------------
  // Same double left-to-right accumulation as the codegen'd expressions:
  // list_sum over a generate_series-driven transform sums DOUBLEs
  // sequentially, so both engines produce bit-identical doubles before
  // the e6 stabilization.

  private[graft] def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private[graft] def sqlNormSq(a: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))"

  private[graft] def sqlCosine(a: String, b: String): String =
    s"(CASE WHEN ${sqlNormSq(a)} = 0 OR ${sqlNormSq(b)} = 0 THEN 0.0 " +
      s"ELSE ${sqlDot(a, b)} / (sqrt(${sqlNormSq(a)}) * sqrt(${sqlNormSq(b)})) END)"

  private def sqlL2(a: String, b: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))))"

  private def knnSql(scoreExpr: String, queryWhere: String, k: Int,
      asc: Boolean, excludeSelf: Boolean): String = {
    val dir = if (asc) "ASC" else "DESC"
    val selfFilter = if (excludeSelf) "WHERE q.q_id <> e.vec_id" else ""
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE $queryWhere),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS neighbor_id,
       |    ${Stab.sqlE6(scoreExpr)} AS score_e6
       |  FROM embeddings e CROSS JOIN q $selfFilter
       |)
       |SELECT q_id, neighbor_id, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_e6 $dir, neighbor_id ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  val bruteCosineSql: String =
    knnSql(sqlCosine("e.embedding", "q.q_vec"), "vec_id < 5", 10, asc = false, excludeSelf = false)
  val bruteDotSql: String =
    knnSql(sqlDot("e.embedding", "q.q_vec"), "vec_id < 5", 10, asc = false, excludeSelf = false)
  val bruteL2Sql: String =
    knnSql(sqlL2("e.embedding", "q.q_vec"), "vec_id < 5", 10, asc = true, excludeSelf = false)
  val knnJoinExactSql: String =
    knnSql(sqlCosine("e.embedding", "q.q_vec"), "vec_id % 50 = 0", 5, asc = false, excludeSelf = true)

  /** `sql_knn_cosine`: the brute cosine top-k expressed ENTIRELY in
    * SQL text through the extension-injected function surface
    * (`graft.plans.GraftExtensions` → `registry.injectInto`) — no
    * Column API, no manual registration call. Semantically identical
    * to `knn_brute_cosine`; the point of the entry is that the parsed
    * `cosine_sim` resolves to the same codegen'd Catalyst expression
    * and hash-matches the same oracle, proving the SQL surface is the
    * full-fidelity API. */
  def sqlKnnCosine(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir).createOrReplaceTempView("graft_sql_embeddings")
    spark.sql(
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
        |           FROM graft_sql_embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id,
        |    CAST(FLOOR(cosine_sim(e.embedding, q.q_vec) * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        |  FROM graft_sql_embeddings e CROSS JOIN q)
        |SELECT q_id, neighbor_id, score_e6, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_e6 DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin)
  }

  val sqlKnnCosineSql: String = bruteCosineSql

  /** `mine_triplets`: (anchor, positive, hard-negative) mining — the
    * training-data op behind contrastive/metric embedding training.
    * For each anchor: positive = the nearest SAME-label vector,
    * hard negative = the nearest DIFFERENT-label vector (the negative
    * the loss actually learns from), plus the margin between them and
    * a `label_suspect` flag: when the hardest negative dominates the
    * nearest positive by more than 0.1 cosine, the anchor's label is
    * the likelier culprit than the geometry — the mining pass doubles
    * as dataset-QA (on this corpus every margin is negative; the flag
    * separates ordinary hard triplets from label-noise candidates).
    * The reference has no training-side surface at all; this reuses
    * its search scan shape (collection.py:243-330) for mining instead
    * of serving.
    *
    * Scale shape: identical to the kNN family — anchors broadcast,
    * corpus scanned ONCE, both per-(anchor, side) top-1 cuts ride a
    * single `row_number <= 1` window (WindowGroupLimit: per-partition
    * 1-row heaps before the only shuffle, keyed (q_id, is_pos)), then
    * a |anchors|-row pivot. Nothing corpus-sized crosses the wire. */
  def mineTriplets(spark: SparkSession, dir: String,
      suspectE6: Long = 100000L): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val scored = emb.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        (col("label") === col("q_label")).as("is_pos"),
        col("vec_id").as("cand_id"),
        Stab.e6(cosineSim(col("embedding"), col("q_vec"))).as("score_e6"))
    val w = Window.partitionBy(col("q_id"), col("is_pos"))
      .orderBy(col("score_e6").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("q_id"))
      .agg(
        max(when(col("is_pos"), col("cand_id"))).as("pos_id"),
        max(when(col("is_pos"), col("score_e6"))).as("pos_score_e6"),
        max(when(!col("is_pos"), col("cand_id"))).as("neg_id"),
        max(when(!col("is_pos"), col("score_e6"))).as("neg_score_e6"))
      .select(col("q_id"), col("pos_id"), col("pos_score_e6"),
        col("neg_id"), col("neg_score_e6"),
        (col("pos_score_e6") - col("neg_score_e6")).as("margin_e6"),
        (col("pos_score_e6") - col("neg_score_e6") < -suspectE6).as("label_suspect"))
      .orderBy(col("q_id"))
  }

  /** Eval-set row budget for [[labelKnnEval]]: the accuracy estimate
    * converges at a few hundred points, so past the cap the eval set
    * is a deterministic hash sample of ~evalCap rows — CONSTANT at
    * any corpus size (the previous `vec_id % 10` predicate kept 10%
    * of the corpus, which made the broadcast eval frame proportional
    * to n — ~10 TB at the 100 TB target; the Whiten.fitCap pattern,
    * Whiten.scala:49, is the fix). */
  val evalCap = 128L

  /** `label_knn_eval`: leave-one-out kNN classification accuracy of
    * the embedding space — the standard "is this embedding any good"
    * eval a training pipeline runs after every embedder change. A
    * capped deterministic hash-sample of vectors (~[[evalCap]], see
    * above) are eval points; each one's label is predicted by
    * majority vote of its k nearest OTHER vectors (tie → more votes
    * first, then smaller label — fully deterministic), and accuracy
    * is reported per true label plus an overall `label = -1` row.
    *
    * Scale shape: the eval set is CONSTANT-size bounded (broadcast ≈
    * evalCap rows at any corpus), the corpus is scanned once, the
    * per-eval-point top-k rides the WindowGroupLimit heap cut, and
    * everything after the k-row-per-point frame is label-cardinality-
    * sized. Integer counts only — the accuracy ratio is an e6 floor
    * division. The md5-based [[graft.text.TextOps.hash60]] sample
    * predicate is replicated verbatim in the DuckDB oracle. */
  def labelKnnEval(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val m = n / evalCap + 1
    val q = emb.filter(
        pmod(graft.text.TextOps.hash60(col("vec_id").cast("string")),
          lit(m)) === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"),
        col("label").as("n_label"), col("vec_id").as("neighbor_id"),
        Stab.e6(cosineSim(col("embedding"), col("q_vec"))).as("score_e6"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("score_e6").desc, col("neighbor_id").asc)
    val votes = scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .groupBy(col("q_id"), col("q_label"), col("n_label"))
      .agg(count(lit(1)).as("n_votes"))
    val wVote = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("n_label").asc)
    val preds = votes.withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("q_label"),
        (col("n_label") === col("q_label")).as("correct"))
    val perLabel = preds.groupBy(col("q_label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_eval"),
        count(when(col("correct"), 1)).as("n_correct"))
    val overall = preds.agg(count(lit(1)).as("n_eval"),
        count(when(col("correct"), 1)).as("n_correct"))
      .select(lit(-1L).as("label"), col("n_eval"), col("n_correct"))
    perLabel.unionByName(overall)
      .select(col("label"), col("n_eval"), col("n_correct"),
        floor(col("n_correct") * lit(1000000L) / col("n_eval"))
          .cast("long").as("acc_e6"))
      .orderBy(col("label"))
  }

  val labelKnnEvalSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
       |           FROM embeddings
       |           WHERE ${graft.text.TextOps.hash60Sql("CAST(vec_id AS VARCHAR)")}
       |             % (SELECT count(*) // $evalCap + 1 FROM embeddings) = 0),
       |scored AS (
       |  SELECT q.q_id, q.q_label, e.label AS n_label, e.vec_id AS neighbor_id,
       |    ${Stab.sqlE6(sqlCosine("e.embedding", "q.q_vec"))} AS score_e6
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |topk AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_e6 DESC, neighbor_id ASC) AS rank
       |    FROM scored) t WHERE rank <= 5),
       |votes AS (
       |  SELECT q_id, q_label, n_label, count(*) AS n_votes
       |  FROM topk GROUP BY q_id, q_label, n_label),
       |preds AS (
       |  SELECT q_id, q_label, (n_label = q_label) AS correct FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY n_votes DESC, n_label ASC) AS vr
       |    FROM votes) t WHERE vr = 1),
       |per_label AS (
       |  SELECT CAST(q_label AS BIGINT) AS label,
       |    CAST(count(*) AS BIGINT) AS n_eval,
       |    CAST(count(*) FILTER (correct) AS BIGINT) AS n_correct
       |  FROM preds GROUP BY q_label
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
       |    CAST(count(*) FILTER (correct) AS BIGINT) FROM preds)
       |SELECT label, n_eval, n_correct,
       |  CAST(FLOOR(n_correct * 1000000 / n_eval) AS BIGINT) AS acc_e6
       |FROM per_label ORDER BY label""".stripMargin

  val mineTripletsSql: String =
    s"""WITH a AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
       |           FROM embeddings WHERE vec_id < 8),
       |scored AS (
       |  SELECT a.q_id, (e.label = a.q_label) AS is_pos, e.vec_id AS cand_id,
       |    ${Stab.sqlE6(sqlCosine("e.embedding", "a.q_vec"))} AS score_e6
       |  FROM embeddings e CROSS JOIN a WHERE e.vec_id <> a.q_id
       |),
       |top1 AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id, is_pos
       |      ORDER BY score_e6 DESC, cand_id ASC) AS rn
       |    FROM scored) t
       |  WHERE rn = 1
       |)
       |SELECT q_id,
       |  max(CASE WHEN is_pos THEN cand_id END) AS pos_id,
       |  max(CASE WHEN is_pos THEN score_e6 END) AS pos_score_e6,
       |  max(CASE WHEN NOT is_pos THEN cand_id END) AS neg_id,
       |  max(CASE WHEN NOT is_pos THEN score_e6 END) AS neg_score_e6,
       |  max(CASE WHEN is_pos THEN score_e6 END)
       |    - max(CASE WHEN NOT is_pos THEN score_e6 END) AS margin_e6,
       |  (max(CASE WHEN is_pos THEN score_e6 END)
       |    - max(CASE WHEN NOT is_pos THEN score_e6 END)) < -100000 AS label_suspect
       |FROM top1 GROUP BY q_id ORDER BY q_id""".stripMargin

  val knnFilteredSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
       |           FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS neighbor_id,
       |    ${Stab.sqlE6(sqlCosine("e.embedding", "q.q_vec"))} AS score_e6
       |  FROM embeddings e CROSS JOIN q WHERE e.label = q.q_label
       |)
       |SELECT q_id, neighbor_id, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_e6 DESC, neighbor_id ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  val rangeSearchSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS neighbor_id,
       |    ${Stab.sqlE6(sqlCosine("e.embedding", "q.q_vec"))} AS score_e6
       |  FROM embeddings e CROSS JOIN q
       |)
       |SELECT q_id, neighbor_id, score_e6,
       |  row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_e6 DESC, neighbor_id ASC) AS rank
       |FROM scored WHERE score_e6 >= 250000
       |ORDER BY q_id, rank""".stripMargin
}
