package graft.operators

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic exemplar clustering + per-cluster topic cards — the
  * corpus-cartography ops a curation pipeline runs before deciding
  * mixtures (what IS in this corpus, and what does each region talk
  * about). K-means itself rides MLlib in [[graft.index.IvfIndex]] and
  * can only be contract-checked; THESE ops pin the assignment to
  * FIXED exemplars (the `vec_id < K` convention, K=8 — the same
  * deterministic-workload convention as the `vec_id < 5` queries), so
  * every step is stabilized-integer arithmetic and the WHOLE output
  * hash-matches a DuckDB twin. Assignment-to-exemplars is exactly the
  * E-step a k-medoids/k-means round runs; topic scoring is the
  * smoothed relative-frequency ratio (monotone in the log-odds the
  * literature quotes, but computed as ONE integer cross-multiply —
  * no `log`, no float boundary risk).
  *
  * Scale shape: exemplars broadcast into the one corpus scan as a
  * SINGLE array row and the argmax is per-row struct-max algebra, so
  * assignment is fully map-side (no rank shuffle); topic counting is
  * one postings shuffle onto (cluster, term) + one onto term, both
  * partial-agged; cluster totals and the vocabulary scalar collapse
  * to broadcast rows. The doc⋈assignment join is id-equi on the
  * shared key space (at SFs where the embeddings table covers a
  * PREFIX of the docs, both engines see the same inner-join subset —
  * the contract is join-consistent, not coverage-complete).
  */
object Clusters {

  val K = 8

  /** (vec_id, cluster_id, cos_e6): nearest exemplar by stabilized
    * cosine, ties to the LOWEST cluster id.
    *
    * WINDOW-FREE: the K exemplars collapse to ONE broadcast row
    * holding an array of (cluster_id, c_vec) structs, and the argmax
    * is a per-row `array_max` over (cos_e6, −cluster_id) structs —
    * Spark's struct ordering compares fields left-to-right, so the
    * max is the highest score with ties to the lowest id. The whole
    * assignment therefore runs MAP-SIDE inside the one corpus scan
    * (a window formulation would shuffle K·n rank rows); only the
    * downstream rollups shuffle. Also the shape a STREAMING frame
    * can run unchanged ([[graft.streaming.ClusterStream]]) — windows
    * can't stream, per-row algebra can. */
  private[graft] def assignColumns(emb: DataFrame, exemplars: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val exRow = exemplars
      .agg(array_sort(collect_list(struct($"cluster_id", $"c_vec"))).as("exs"))
    emb.crossJoin(broadcast(exRow))
      .select($"vec_id",
        array_max(transform($"exs", e => struct(
          Stab.e6(cosineSim($"embedding", e("c_vec"))).as("cos_e6"),
          (-e("cluster_id")).as("neg_cluster")))).as("best"))
      .select($"vec_id", (-$"best.neg_cluster").as("cluster_id"),
        $"best.cos_e6".as("cos_e6"))
  }

  private[graft] def exemplarAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val ex = emb.filter($"vec_id" < K)
      .select($"vec_id".as("cluster_id"), $"embedding".as("c_vec"))
    assignColumns(emb.select($"vec_id", $"embedding"), ex)
  }

  private val assignSqlCte: String = {
    val cos = Stab.sqlE6(KnnSearch.sqlCosine("e.embedding", "ex.c_vec"))
    s"""ex AS (
       |  SELECT vec_id AS cluster_id, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < $K),
       |scored AS (
       |  SELECT e.vec_id, ex.cluster_id, $cos AS cos_e6
       |  FROM embeddings e CROSS JOIN ex),
       |assign AS (
       |  SELECT vec_id, cluster_id, cos_e6 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_e6 DESC, cluster_id ASC) AS rn
       |    FROM scored) t
       |  WHERE rn = 1)""".stripMargin
  }

  /** `cluster_assign`: the assignment card — per-cluster population
    * and stabilized-cosine spread (mean by truncating integer
    * division: Spark `div` ↔ DuckDB `//`, both truncate, and cluster
    * cosine sums go negative for far-out regions). A dead exemplar
    * (zero members beyond itself) or a collapsed one (everything in
    * one cluster) is immediately visible. */
  def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exemplarAssign(spark, dir)
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(cos_e6) div count(1)").as("mean_cos_e6"),
        min($"cos_e6").as("min_cos_e6"),
        max($"cos_e6").as("max_cos_e6"))
      .orderBy($"cluster_id")
  }

  val clusterAssignSql: String =
    s"""WITH $assignSqlCte
       |SELECT cluster_id, count(*) AS n_vecs,
       |  CAST(sum(cos_e6) AS BIGINT) // count(*) AS mean_cos_e6,
       |  min(cos_e6) AS min_cos_e6, max(cos_e6) AS max_cos_e6
       |FROM assign GROUP BY cluster_id
       |ORDER BY cluster_id""".stripMargin

  /** `cluster_topics`: the top-5 DISTINGUISHING terms per cluster —
    * for each (cluster, term), the add-one-smoothed relative
    * frequency in the cluster vs the REST of the corpus,
    *   score = ((tf_c+1)/(tot_c+V)) / ((tf_r+1)/(tot_r+V)),
    * e6-scaled by one integer cross-multiply in decimal(38,0)/HUGEINT
    * (the q14 overflow convention: tf·tot products pass 2⁶³ at 100 TB
    * corpus token counts). A term every cluster uses scores ~1e6;
    * a cluster-exclusive term scores ≫1e6 — the rank cut is integer-
    * deterministic with ties to the lexicographically first term. */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assign = exemplarAssign(spark, dir)
    val dt = Tables.documents(spark, dir)
      .join(assign, $"doc_id" === $"vec_id")
      .select($"cluster_id", TextOps.tokens($"text").as("w"))
    // (cluster, term) counts feed three descendants — materialize once
    val tf = dt.select($"cluster_id", explode($"w").as("term"))
      .groupBy($"cluster_id", $"term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val ctot = tf.groupBy($"cluster_id").agg(sum($"tf").as("tot_c"))
    val gterm = tf.groupBy($"term").agg(sum($"tf").as("tf_g"))
    val gl = gterm.agg(sum($"tf_g").as("tot_g"), count(lit(1)).as("v"))
    val scored = tf
      .join(broadcast(ctot), Seq("cluster_id"))
      .join(gterm, Seq("term"))
      .crossJoin(broadcast(gl))
      .select($"cluster_id", $"term", $"tf",
        expr("cast(cast(tf + 1 as decimal(38,0)) * ((tot_g - tot_c) + v) * 1000000" +
          " div (cast((tf_g - tf) + 1 as decimal(38,0)) * (tot_c + v)) as long)")
          .as("score_e6"))
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"score_e6".desc, $"term".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"cluster_id", $"term", $"tf", $"score_e6", $"rank")
      .orderBy($"cluster_id", $"rank")
  }

  val clusterTopicsSql: String =
    s"""WITH $assignSqlCte,
       |dt AS (
       |  SELECT a.cluster_id, ${TextOps.tokensSql} AS w
       |  FROM documents d JOIN assign a ON d.doc_id = a.vec_id),
       |tf AS (
       |  SELECT cluster_id, unnest(w) AS term FROM dt),
       |tfc AS (
       |  SELECT cluster_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
       |ctot AS (
       |  SELECT cluster_id, CAST(sum(tf) AS BIGINT) AS tot_c FROM tfc GROUP BY 1),
       |gterm AS (
       |  SELECT term, CAST(sum(tf) AS BIGINT) AS tf_g FROM tfc GROUP BY 1),
       |gl AS (
       |  SELECT CAST(sum(tf_g) AS BIGINT) AS tot_g, count(*) AS v FROM gterm),
       |scored2 AS (
       |  SELECT t.cluster_id, t.term, t.tf,
       |    CAST(CAST(t.tf + 1 AS HUGEINT) * ((gl.tot_g - c.tot_c) + gl.v) * 1000000
       |      // (CAST((g.tf_g - t.tf) + 1 AS HUGEINT) * (c.tot_c + gl.v)) AS BIGINT) AS score_e6
       |  FROM tfc t
       |  JOIN ctot c USING (cluster_id)
       |  JOIN gterm g USING (term)
       |  CROSS JOIN gl)
       |SELECT cluster_id, term, tf, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY score_e6 DESC, term ASC) AS rank
       |  FROM scored2) t
       |WHERE rank <= 5
       |ORDER BY cluster_id, rank""".stripMargin
}

/** Greedy k-center coreset selection (`sample_kcenter`) — the
  * diverse-subset / data-pruning primitive (Sener & Savarese's
  * core-set active learning; 2-approximation to the optimal k-center
  * cover): start from a fixed seed, repeatedly pick the vector
  * FARTHEST from the selected set (minimal max-cosine), emitting the
  * coverage radius at each pick. The emitted max-cos sequence is the
  * coverage curve — it must be non-decreasing (each new center can
  * only improve the worst-covered point), and where it plateaus is
  * the natural coreset size.
  *
  * Scale shape: the per-vector "max cosine to selected" column
  * updates INCREMENTALLY — adding a center is one narrow map
  * (`greatest(old, cos(v, new_center))`) over the corpus, so k
  * centers cost k linear passes and one TakeOrdered argmin each;
  * nothing pairwise ever materializes, and the selected set (k rows)
  * is the only driver state. Exactness: scores e6-floored at every
  * comparison, ties on vec_id — the Python twin replays bit-equal.
  */
object Coreset {

  val k = 8

  def sampleKcenter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    def embOf(id: Long): Array[Float] =
      emb.filter($"vec_id" === id).collect()
        .head.getSeq[Float](1).toArray
    val seedVec = embOf(0L)
    var picks = List((1L, 0L, 1000000L))
    var cov = emb
      .select($"vec_id", $"embedding",
        Stab.e6(cosineSim($"embedding", typedlit(seedVec))).as("maxcos"))
      .localCheckpoint(true)
    (2 to k).foreach { rank =>
      // exclude the ≤k already-picked centers from the argmin: on a
      // degenerate corpus where every vector coincides with a center
      // (all maxcos = 1e6) the unfiltered tie-break would re-pick the
      // smallest vec_id — picks are distinct by construction instead.
      // Non-degenerate results are unchanged (a picked center's
      // maxcos is 1e6, never the minimum while any point is uncovered).
      val pickedIds = picks.map(_._2)
      val far = cov.filter(!$"vec_id".isin(pickedIds: _*))
        .orderBy($"maxcos".asc, $"vec_id".asc).limit(1)
        .select($"vec_id", $"maxcos").collect()
        .headOption.getOrElse(sys.error(
          s"sample_kcenter: corpus has fewer than $k distinct vectors"))
      val (fid, fcos) = (far.getLong(0), far.getLong(1))
      picks = picks :+ ((rank.toLong, fid, fcos))
      if (rank < k) {
        val cVec = embOf(fid)
        // free the superseded coverage checkpoint (the bpeTrain
        // discipline) — without this, k corpus-width copies stay
        // pinned until the ContextCleaner happens to collect them
        val prev = cov
        cov = cov.select($"vec_id", $"embedding",
            greatest($"maxcos",
              Stab.e6(cosineSim($"embedding", typedlit(cVec)))).as("maxcos"))
          .localCheckpoint(true)
        graft.core.Checkpoints.free(prev)
      }
    }
    graft.core.Checkpoints.free(cov)
    graft.core.Checkpoints.free(emb)
    picks.toDF("rank", "vec_id", "maxcos_e6").orderBy($"rank")
  }

  /** Golden pins from the INDEPENDENT Python recompute (inline
    * replay of the documented greedy recurrence on the sf0.01 verify
    * corpus — same convention as quality_train/mm_phash). */
  val sampleKcenterSql: String =
    """SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
      |  CAST(maxcos_e6 AS BIGINT) AS maxcos_e6
      |FROM (VALUES
      |(1, 0, 1000000),
      |(2, 188, -337095),
      |(3, 291, -167423),
      |(4, 152, -90724),
      |(5, 366, -39573),
      |(6, 49, -13149),
      |(7, 11, -945),
      |(8, 132, 22148)
      |) t(rank, vec_id, maxcos_e6)
      |ORDER BY rank""".stripMargin
}
