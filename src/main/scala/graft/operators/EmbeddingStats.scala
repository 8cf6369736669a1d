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
}
