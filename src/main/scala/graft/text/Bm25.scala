package graft.text

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** BM25 keyword retrieval over the `documents` table — the sparse
  * (lexical) leg the reference has no analog for (its only retrieval
  * is dense cosine, collection.py:243-330); a production corpus store
  * serves both, so BM25 is first-class here and feeds the hybrid
  * fusion in [[graft.operators.Hybrid]].
  *
  * Scale shape: the corpus is scanned twice, both single-pass —
  * once column-pruned for the corpus constants (N, Σdl; in a real
  * deployment these are ingest-maintained table stats), once to build
  * postings. The postings explode is immediately semi-joined against
  * the BROADCAST query-term list, so only rows whose term appears in
  * some query survive to the one (doc_id, term) aggregation shuffle —
  * the corpus itself is never shuffled. df, query terms, and the
  * stats singleton all ride broadcasts; the final per-query sum
  * groups an output-bounded frame. No UDFs — tokenization and scoring
  * are codegen'd column algebra.
  *
  * Cross-engine determinism: per-(q,doc,term) BM25 contributions are
  * e6-stabilized FIRST and then summed as longs, so the aggregation
  * order Spark picks can never flip a bit; `ln` is the only non-IEEE
  * op in the chain (≤1 ulp on both engines, ~1e-10 under the e6
  * boundary). Constants k1=1.2, b=0.75 written identically in both
  * engines ((tf·2.2), (0.25 + 0.75·dl/avgdl)).
  */
object Bm25 {

  /** Fixed benchmark query workload; terms drawn from the synthetic
    * corpus vocabulary so every query has real matches. */
  val queries: Seq[(Long, String)] = Seq(
    0L -> "spark join filter",
    1L -> "window agg stream",
    2L -> "fast sort merge table",
    3L -> "customer data query slow")

  /** (q_id, term) pairs via the SAME tokenizer as the corpus side. */
  private def queryTerms: Seq[(Long, String)] =
    queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
        .map(qid -> _)
    }

  /** Ranked BM25 results (q_id, doc_id, score_e6, rank), top `k` per
    * query. Only docs containing ≥1 query term score (standard BM25:
    * absent terms contribute 0, all-absent docs are not results). */
  def ranked(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", TextOps.tokens($"text").as("w"))
    // corpus constants: N docs, total token count (exact longs)
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size($"w")).cast("double").as("sum_dl"))
    val qt = queryTerms.toDF("q_id", "term")
    // dl rides the explode so postings need no second join on doc_id.
    // Materialized once: both df and the scoring join consume it, and
    // Spark's exchange reuse does not dedupe the two subplans (the
    // AQE final plan re-scanned the corpus per consumer without this)
    // — postings is the term-filtered aggregate, bounded by the
    // workload's matching docs, not the corpus.
    val postings = toks
      .select($"doc_id", size($"w").cast(LongType).as("dl"), explode($"w").as("term"))
      .join(broadcast(qt.select($"term").distinct()), Seq("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    rankedOver(postings, stats, k)
  }

  /** Core scorer over an arbitrary postings frame
    * `(doc_id, dl, term, tf)` plus a 1-row stats frame
    * `(n_docs, sum_dl)` (doubles) — shared by the batch path above
    * and the streamed postings store
    * ([[graft.streaming.PostingsStream]]); a full (unfiltered)
    * postings table is cut to the workload's terms here first. */
  private[graft] def rankedOver(postingsAll: DataFrame, stats: DataFrame,
      k: Int = 10): DataFrame = {
    val spark = postingsAll.sparkSession
    import spark.implicits._
    val qt = queryTerms.toDF("q_id", "term")
    val postings = postingsAll
      .join(broadcast(qt.select($"term").distinct()), Seq("term"))
    val dfr = postings.groupBy($"term")
      .agg(count(lit(1)).cast("double").as("df"))
    val perTerm = postings
      .join(broadcast(dfr), Seq("term"))
      .join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(stats))
      .select($"q_id", $"doc_id",
        Stab.e6(
          log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)) *
            (($"tf" * lit(2.2)) /
              ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl".cast("double") / ($"sum_dl" / $"n_docs"))))
        ).as("score_term_e6"))
    val total = perTerm.groupBy($"q_id", $"doc_id")
      .agg(sum($"score_term_e6").as("score_e6"))
    val w = Window.partitionBy($"q_id")
      .orderBy($"score_e6".desc, $"doc_id".asc)
    total.withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= k)
      .orderBy($"q_id", $"rank")
  }

  /** Tokenize a (doc_id, text) frame into postings rows
    * `(doc_id, dl, term, tf)` — the exact derivation [[ranked]] uses,
    * exposed for the streamed store's per-batch ingestion. */
  private[graft] def toPostings(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", TextOps.tokens($"text").as("w"))
      .select($"doc_id", size($"w").cast(LongType).as("dl"), explode($"w").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
  }

  def textBm25(spark: SparkSession, dir: String): DataFrame =
    ranked(spark, dir)

  /** DuckDB twin: same tokenizer, same constant forms, same
    * stabilize-then-sum ordering. */
  val textBm25Sql: String = {
    val qvals = queryTerms
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH q(q_id, term) AS (VALUES $qvals),
       |toks AS (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |                 CAST(sum(len(w)) AS DOUBLE) AS sum_dl FROM toks),
       |posting AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks) u
       |  WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY doc_id, dl, term),
       |dfr AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM posting GROUP BY term),
       |per_term AS (
       |  SELECT q.q_id, p.doc_id,
       |    ${Stab.sqlE6(
           "ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * " +
           "((p.tf * CAST(2.2 AS DOUBLE)) / (p.tf + CAST(1.2 AS DOUBLE) * (0.25 + 0.75 * CAST(p.dl AS DOUBLE) / (s.sum_dl / s.n_docs))))")} AS score_term_e6
       |  FROM posting p
       |  JOIN dfr d ON p.term = d.term
       |  JOIN q ON q.term = p.term
       |  CROSS JOIN stats s),
       |total AS (SELECT q_id, doc_id, CAST(sum(score_term_e6) AS BIGINT) AS score_e6
       |          FROM per_term GROUP BY q_id, doc_id)
       |SELECT q_id, doc_id, score_e6, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_e6 DESC, doc_id ASC) AS rank FROM total) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }
}
