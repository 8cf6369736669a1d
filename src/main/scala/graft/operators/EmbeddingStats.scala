package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-dimension embedding observability (`embedding_dim_stats`) —
  * the distribution table a pipeline reads BEFORE trusting an index
  * build or a quantizer fit: dead/near-constant dimensions (IVF and
  * PQ subspaces degenerate there), scale drift between ingest batches
  * (breaks L2-based layouts), and outlier components (saturate SQ8
  * ranges — `sq_build` computes exactly these min/max per dim).
  *
  * The reference carries no embedding observability at all; this is
  * the operational complement to its blind `add_index`
  * (/root/reference/src/main.py:35-40).
  *
  * Scale shape: one scan, map-side posexplode to (dim, component)
  * pairs, ONE partial-agged shuffle onto `d` keys (64 here) — output
  * is dimension-cardinality, never corpus-cardinality. All arithmetic
  * is exact: components e6-floored to longs at the scan, so sums,
  * mins/maxes, and the variance numerator `n·Σq² − (Σq)²` (integer
  * cross-multiplication — no float division anywhere) reproduce
  * hash-exactly cross-engine. Long-range note for 100 TB: Σq² grows
  * with n — beyond ~1e5 vectors per aggregation the exact sums need
  * a hierarchical (per-shard, then merged) rollup or decimal(38)
  * accumulators; at the bench SFs the int64 headroom is ample.
  */
object EmbeddingStats {

  def embeddingDimStats(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"),
        Stab.e6(col("x").cast("double")).as("q"))
    q.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_e6"),
        sum(col("q") * col("q")).as("sumsq_e12"),
        min(col("q")).as("min_e6"),
        max(col("q")).as("max_e6"))
      .select(col("dim"), col("n"), col("sum_e6"), col("sumsq_e12"),
        col("min_e6"), col("max_e6"),
        (col("n") * col("sumsq_e12") - col("sum_e6") * col("sum_e6"))
          .as("var_num"))
      .orderBy(col("dim"))
  }

  val embeddingDimStatsSql: String = {
    // parallel unnests in one SELECT zip pairwise in DuckDB — the
    // lateral-free way to get (ordinal, component) rows
    val q = Stab.sqlE6("CAST(x AS DOUBLE)")
    s"""WITH exploded AS (
       |  SELECT unnest(generate_series(1, len(embedding))) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |comp AS (
       |  SELECT CAST(i AS BIGINT) AS dim, $q AS q FROM exploded),
       |agg AS (
       |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(q) AS BIGINT) AS sum_e6,
       |    CAST(sum(q * q) AS BIGINT) AS sumsq_e12,
       |    CAST(min(q) AS BIGINT) AS min_e6,
       |    CAST(max(q) AS BIGINT) AS max_e6
       |  FROM comp GROUP BY dim)
       |SELECT dim, n, sum_e6, sumsq_e12, min_e6, max_e6,
       |  n * sumsq_e12 - sum_e6 * sum_e6 AS var_num
       |FROM agg ORDER BY dim""".stripMargin
  }

  /** `embedding_drift`: per-dimension distribution drift between two
    * ingest slices — the monitoring table that catches a model/
    * preprocessing change BEFORE it breaks the index layouts
    * (`embedding_dim_stats`' scaladoc names scale drift as the
    * failure mode; this op measures it between slices instead of
    * describing one). Slices here are the even/odd vec_id halves
    * (the deterministic stand-in for "yesterday's ingest vs
    * today's"); per dim, Welch's z on the mean shift:
    * z = (μ_a − μ_b) / √(s²_a/n_a + s²_b/n_b), drift flagged at
    * |z| ≥ 3.
    *
    * Exactness: every aggregate is an exact integer (e6-floored
    * components, the n·Σq² − (Σq)² variance numerators), and z is
    * ONE identically-shaped double expression over those integers in
    * both engines, e6-floored — the stats_corr convention.
    *
    * Scale shape: one scan, map-side posexplode, ONE partial-agged
    * shuffle onto d×2 keys, output d rows. At 100 TB the slice key
    * would be the ingest-batch column; the plan is unchanged. */
  /** Per-dim slice moments: (dim, n, s, ss) → (dim, n, sum_e6,
    * var_num) with the exact integer variance numerator. */
  def sliceMoments(comp: DataFrame, suffix: String): DataFrame =
    comp.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("ss"))
      .select(col("dim"), col("n").as(s"n_$suffix"),
        col("s").as(s"sum_${suffix}_e6"),
        (col("n") * col("ss") - col("s") * col("s")).as(s"var_num_$suffix"))

  /** (dim, q) e6-component rows of one slice of the corpus. */
  def sliceComponents(emb: DataFrame, parity: Long): DataFrame =
    emb.filter(pmod(col("vec_id"), lit(2L)) === parity)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"),
        Stab.e6(col("x").cast("double")).as("q"))

  /** The Welch-z verdict over a frame carrying both slices' moment
    * columns — shared with [[graft.streaming.DriftStream]] so the
    * streaming twin's parity is by construction, not by duplication. */
  def driftVerdict(j: DataFrame): DataFrame =
    j.withColumn("z_e6", expr(
        // degenerate guard: a dim constant in BOTH slices has variance
        // numerators 0 (they are ≥ 0 by Cauchy–Schwarz, so the sum is 0
        // iff both are) ⇒ the z denominator is 0 and the engines'
        // NaN/Inf casts diverge — emit a defined NULL z instead
        """case when var_num_a + var_num_b = 0 then cast(null as long)
          | else cast(floor(((cast(sum_a_e6 as double) / n_a - cast(sum_b_e6 as double) / n_b)
          | / sqrt(cast(var_num_a as double) / (cast(n_a as double) * n_a * n_a)
          |      + cast(var_num_b as double) / (cast(n_b as double) * n_b * n_b)))
          | * 1000000.0 + 0.5) as long) end""".stripMargin.replace("\n", " ")))
      .select(col("dim"), col("n_a"), col("n_b"), col("sum_a_e6"),
        col("sum_b_e6"), col("var_num_a"), col("var_num_b"), col("z_e6"),
        coalesce(abs(col("z_e6")) >= 3000000L, lit(false)).as("drifted"))

  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val a = sliceMoments(sliceComponents(emb, 0L), "a")
    val b = sliceMoments(sliceComponents(emb, 1L), "b")
    driftVerdict(a.join(b, Seq("dim"))).orderBy(col("dim"))
  }

  val embeddingDriftSql: String = {
    val q = Stab.sqlE6("CAST(x AS DOUBLE)")
    s"""WITH exploded AS (
       |  SELECT vec_id % 2 AS slice,
       |         unnest(generate_series(1, len(embedding))) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings),
       |comp AS (
       |  SELECT slice, CAST(i AS BIGINT) AS dim, $q AS q FROM exploded),
       |by_slice AS (
       |  SELECT dim, slice, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS ss
       |  FROM comp GROUP BY dim, slice),
       |j AS (
       |  SELECT a.dim, a.n AS n_a, b.n AS n_b, a.s AS sum_a_e6, b.s AS sum_b_e6,
       |    a.n * a.ss - a.s * a.s AS var_num_a,
       |    b.n * b.ss - b.s * b.s AS var_num_b
       |  FROM by_slice a JOIN by_slice b
       |    ON a.dim = b.dim AND a.slice = 0 AND b.slice = 1)
       |SELECT dim, n_a, n_b, sum_a_e6, sum_b_e6, var_num_a, var_num_b,
       |  CASE WHEN var_num_a + var_num_b = 0 THEN NULL
       |    ELSE CAST(FLOOR(((CAST(sum_a_e6 AS DOUBLE) / n_a - CAST(sum_b_e6 AS DOUBLE) / n_b)
       |    / sqrt(CAST(var_num_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_a * n_a)
       |         + CAST(var_num_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * n_b * n_b)))
       |    * 1000000.0 + 0.5) AS BIGINT) END AS z_e6,
       |  coalesce(abs(CASE WHEN var_num_a + var_num_b = 0 THEN NULL
       |    ELSE CAST(FLOOR(((CAST(sum_a_e6 AS DOUBLE) / n_a - CAST(sum_b_e6 AS DOUBLE) / n_b)
       |    / sqrt(CAST(var_num_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_a * n_a)
       |         + CAST(var_num_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * n_b * n_b)))
       |    * 1000000.0 + 0.5) AS BIGINT) END) >= 3000000, false) AS drifted
       |FROM j ORDER BY dim""".stripMargin
  }
}
