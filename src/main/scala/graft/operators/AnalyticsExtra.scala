package graft.operators

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Three analytics plan shapes the relational core didn't exercise
  * yet: a RANGE-frame sliding window (`events_rolling`), grouping
  * sets via ROLLUP (`q1_rollup`), and a fixed-column PIVOT
  * (`pivot_lang`). Each is a capability checkbox a user of a general
  * query engine expects, each oracled hash-exact.
  */
object AnalyticsExtra {

  /** `events_rolling`: 7-day moving event volume per type — the
    * RANGE window frame (value-based, not row-based: a missing day
    * must NOT stretch the window to 7 observed rows). Daily counts
    * first (one partial-agged shuffle onto the tiny type×day frame),
    * then the window runs over that aggregated frame — never over
    * raw events; the moving average is exact integer sum·1e6 `div`
    * row-count (both sums bounded by the frame, no overflow
    * exposure). Day index = epoch-days of the UTC-truncated
    * timestamp, integer in both engines. */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .withColumn("epoch_s", unix_timestamp(date_trunc("day", $"ts")))
      .select($"event_type", expr("epoch_s div 86400").as("day_idx"))
      .groupBy($"event_type", $"day_idx")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day_idx")
      .rangeBetween(-6, 0)
    daily
      .withColumn("roll_n", sum($"n").over(w))
      .withColumn("roll_days", count(lit(1)).over(w))
      .select($"event_type", $"day_idx", $"n", $"roll_n", $"roll_days",
        expr("roll_n * 1000000 div roll_days").as("roll_avg_e6"))
      .orderBy($"event_type", $"day_idx")
  }

  val eventsRollingSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day_idx,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day_idx, n,
      |  CAST(sum(n) OVER w AS BIGINT) AS roll_n,
      |  CAST(count(*) OVER w AS BIGINT) AS roll_days,
      |  CAST((CAST(sum(n) OVER w AS BIGINT) * 1000000)
      |    // (CAST(count(*) OVER w AS BIGINT)) AS BIGINT) AS roll_avg_e6
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day_idx""".stripMargin

  /** `q1_rollup`: the Q1 aggregate re-grouped through
    * `ROLLUP(returnflag, linestatus)` — per-pair, per-flag subtotal,
    * and grand total in ONE pass (Spark expands grouping sets inside
    * a single partial-agged aggregation; three separate GROUP BYs
    * would scan three times). `grouping_id()` disambiguates the
    * levels with the same bit encoding both engines use (rightmost
    * column = LSB); NULL group keys surface as the '(all)' sentinel
    * so the oracle never compares NULL orderings. */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        Stab.e2(sum($"l_quantity")).as("sum_qty_e2"),
        grouping_id().cast(LongType).as("gid"))
      .select(
        coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        $"gid", $"n", $"sum_qty_e2")
      .orderBy($"gid", $"returnflag", $"linestatus")
  }

  val q1RollupSql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       |  coalesce(l_linestatus, '(all)') AS linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  count(*) AS n,
       |  ${Stab.sqlE2("sum(l_quantity)")} AS sum_qty_e2
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, returnflag, linestatus""".stripMargin

  /** The corpus language codes, pinned (an inferred pivot would run a
    * distinct-scan job just to learn column names, and a new language
    * appearing at a bigger SF would silently change the SCHEMA —
    * pinned columns keep the contract stable and the plan one pass). */
  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** `pivot_lang`: documents cross-tabulated source × language — the
    * PIVOT surface, planned as one partial-agged aggregation with
    * map-side conditional counting (each `n_<lang>` is a `when`
    * inside the same shuffle; missing cells coalesce to 0). */
  def pivotLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counted = Tables.documents(spark, dir)
      .groupBy($"source").pivot("lang", langs).count()
    val cols = Seq($"source") ++
      langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l"))
    counted.select(cols: _*)
      .withColumn("n_total", langs.map(l => col(s"n_$l")).reduce(_ + _))
      .orderBy($"source")
  }

  val pivotLangSql: String = {
    val cells = langs.map(l =>
      s"count(*) FILTER (lang = '$l') AS n_$l").mkString(",\n  ")
    // n_total = the pinned cells' sum in BOTH engines (a count(*)
    // would silently diverge if an unpinned language ever appears)
    val names = langs.map(l => s"n_$l").mkString(", ")
    val total = langs.map(l => s"n_$l").mkString(" + ")
    s"""SELECT source, $names, $total AS n_total
       |FROM (SELECT source,
       |  $cells
       |FROM documents GROUP BY source)
       |ORDER BY source""".stripMargin
  }

  private val corrFeatures = Seq("chars", "tokens", "types")
  private val corrPairs: Seq[(String, String)] =
    for { i <- corrFeatures.indices; j <- i + 1 until corrFeatures.size }
      yield (corrFeatures(i), corrFeatures(j))

  /** `stats_corr`: Pearson correlation matrix over per-document
    * integer features (n_chars, token count, distinct-token count) —
    * the corpus-profiling step before any length-based quality
    * filter (a near-1 chars↔tokens correlation says one of the two
    * thresholds is redundant). ONE pass: per-row features are
    * codegen'd string ops, then a single partial-agged global
    * aggregation collects every moment (Σx, Σx², Σxy for each pair)
    * — |features|² scalars, no per-pair scans, no shuffle beyond the
    * one global agg. The moment sums stay exact BIGINTs (per-row
    * products ≤ 1e5 ⇒ Σ < 2^63 even at 1e11 docs); the n·Σxy − Σx·Σy
    * cross-terms are where 100 TB overflows, so THOSE go through
    * decimal(38,0) (Spark) / HUGEINT (DuckDB) before the one double
    * division — the q14/dsir overflow convention. corr is e6-floored
    * from identically-shaped double expressions in both engines. */
  def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.text.TextOps.tokens($"text")
    val feats = Tables.documents(spark, dir).select(
      $"n_chars".cast(LongType).as("f_chars"),
      size(toks).cast(LongType).as("f_tokens"),
      size(array_distinct(toks)).cast(LongType).as("f_types"))
    val sumCols = corrFeatures.flatMap { f =>
      Seq(sum(col(s"f_$f")).as(s"s_$f"),
        sum(col(s"f_$f") * col(s"f_$f")).as(s"ss_$f"))
    }
    val prodCols = corrPairs.map { case (a, b) =>
      sum(col(s"f_$a") * col(s"f_$b")).as(s"sp_${a}_$b")
    }
    val g = feats.agg(count(lit(1)).as("n"), (sumCols ++ prodCols): _*)
    def corrExpr(a: String, b: String): String = {
      val num = s"cast(cast(n as decimal(38,0)) * sp_${a}_$b" +
        s" - cast(s_$a as decimal(38,0)) * s_$b as double)"
      val va = s"cast(cast(n as decimal(38,0)) * ss_$a" +
        s" - cast(s_$a as decimal(38,0)) * s_$a as double)"
      val vb = s"cast(cast(n as decimal(38,0)) * ss_$b" +
        s" - cast(s_$b as decimal(38,0)) * s_$b as double)"
      // degenerate-corpus guard: a constant feature has variance
      // numerator 0 ⇒ the ratio is NaN/Inf, and the two engines'
      // casts diverge (Spark non-ANSI maps NaN → 0, DuckDB errors).
      // Emit a defined NULL identically in both engines instead.
      s"case when $va * $vb = 0.0D then cast(null as long) " +
        s"else cast(floor(($num / (sqrt($va) * sqrt($vb))) * 1000000.0 + 0.5) as long) end"
    }
    val stackArgs = corrPairs
      .map { case (a, b) => s"'$a', '$b', ${corrExpr(a, b)}" }.mkString(", ")
    g.selectExpr("n",
        s"stack(${corrPairs.size}, $stackArgs) as (feature_a, feature_b, corr_e6)")
      .select($"feature_a", $"feature_b", $"n", $"corr_e6")
      .orderBy($"feature_a", $"feature_b")
  }

  val statsCorrSql: String = {
    val moments = corrFeatures.flatMap { f =>
      Seq(s"CAST(sum(f_$f) AS BIGINT) AS s_$f",
        s"CAST(sum(f_$f * f_$f) AS BIGINT) AS ss_$f")
    } ++ corrPairs.map { case (a, b) =>
      s"CAST(sum(f_$a * f_$b) AS BIGINT) AS sp_${a}_$b"
    }
    def corr(a: String, b: String): String = {
      val num = s"CAST(CAST(n AS HUGEINT) * sp_${a}_$b" +
        s" - CAST(s_$a AS HUGEINT) * s_$b AS DOUBLE)"
      val va = s"CAST(CAST(n AS HUGEINT) * ss_$a" +
        s" - CAST(s_$a AS HUGEINT) * s_$a AS DOUBLE)"
      val vb = s"CAST(CAST(n AS HUGEINT) * ss_$b" +
        s" - CAST(s_$b AS HUGEINT) * s_$b AS DOUBLE)"
      s"CASE WHEN $va * $vb = 0 THEN NULL " +
        s"ELSE CAST(FLOOR(($num / (sqrt($va) * sqrt($vb))) * 1000000.0 + 0.5) AS BIGINT) END"
    }
    val rows = corrPairs.map { case (a, b) =>
      s"SELECT '$a' AS feature_a, '$b' AS feature_b, n, ${corr(a, b)} AS corr_e6 FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH f AS (
       |  SELECT n_chars AS f_chars,
       |    CAST(len(w) AS BIGINT) AS f_tokens,
       |    CAST(len(list_distinct(w)) AS BIGINT) AS f_types
       |  FROM (SELECT n_chars, ${graft.text.TextOps.tokensSql} AS w FROM documents)
       |), g AS (
       |  SELECT count(*) AS n, ${moments.mkString(",\n    ")}
       |  FROM f)
       |SELECT feature_a, feature_b, n, corr_e6 FROM (
       |  ${rows}
       |) ORDER BY feature_a, feature_b""".stripMargin
  }

  /** `events_dau_wau`: rolling distinct users — DAU, trailing-7-day
    * WAU, and the DAU/WAU stickiness ratio per day. Distinct-count
    * over a SLIDING window can't ride a window frame (count(DISTINCT)
    * isn't a window aggregate in either engine); the scalable shape
    * is dedup-then-scatter: collapse events to the distinct
    * (day, user) frame FIRST (one partial-agged shuffle — the only
    * corpus-volume op), then scatter each active-day row onto the ≤ 7
    * trailing report days it supports (a bounded ×7 explode of the
    * already-small frame) and count distinct users per report day.
    * Report days are restricted to those with ≥ 7 days of history
    * (a partial leading window would understate WAU), but the report
    * frame is driven from the FULL day range (`sequence(d0+6, d1)`),
    * not from the days that happen to have events: a zero-DAU day —
    * exactly what a monitoring table most wants to surface — appears
    * with dau 0 (and stickiness 0) instead of silently vanishing from
    * an inner join. All integer; stickiness = DAU·1e6 div WAU
    * (0 when WAU is 0). */
  def eventsDauWau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dayUser = Tables.events(spark, dir)
      .select(expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("day_idx"),
        $"user_id")
      .distinct()
      .localCheckpoint(true)
    val bounds = dayUser.agg(min($"day_idx").as("d0"), max($"day_idx").as("d1"))
    // a corpus spanning < 7 distinct days has NO report day with a
    // full trailing week — and Spark's sequence(start, stop) with
    // start > stop emits a DESCENDING range (spurious rows DuckDB's
    // generate_series would not produce), so the degenerate case is
    // pinned to empty output in both engines
    val days = bounds.filter($"d0" + 6 <= $"d1")
      .select(explode(sequence($"d0" + 6, $"d1")).as("day_idx"))
    val dau = dayUser.groupBy($"day_idx").agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .select($"user_id", explode(sequence($"day_idx", $"day_idx" + 6)).as("day_idx"))
      .distinct()
      .groupBy($"day_idx").agg(count(lit(1)).as("wau"))
    days.join(dau, Seq("day_idx"), "left")
      .join(wau, Seq("day_idx"), "left")
      .select($"day_idx", coalesce($"dau", lit(0L)).as("dau"),
        coalesce($"wau", lit(0L)).as("wau"))
      .select($"day_idx", $"dau", $"wau",
        when($"wau" === 0L, 0L)
          .otherwise(expr("dau * 1000000 div wau")).as("stickiness_e6"))
      .orderBy($"day_idx")
  }

  val eventsDauWauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day_idx,
      |    user_id
      |  FROM events),
      |bounds AS (SELECT min(day_idx) AS d0, max(day_idx) AS d1 FROM du),
      |days AS (SELECT unnest(generate_series(d0 + 6, d1)) AS day_idx FROM bounds),
      |dau AS (SELECT day_idx, count(*) AS dau FROM du GROUP BY day_idx),
      |wau AS (
      |  SELECT day_idx, count(*) AS wau FROM (
      |    SELECT DISTINCT user_id, unnest(generate_series(day_idx, day_idx + 6)) AS day_idx
      |    FROM du) s
      |  GROUP BY day_idx)
      |SELECT days.day_idx AS day_idx,
      |  CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
      |  CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
      |  CAST(CASE WHEN coalesce(wau.wau, 0) = 0 THEN 0
      |    ELSE coalesce(dau.dau, 0) * 1000000 // wau.wau END AS BIGINT) AS stickiness_e6
      |FROM days
      |LEFT JOIN dau ON days.day_idx = dau.day_idx
      |LEFT JOIN wau ON days.day_idx = wau.day_idx
      |ORDER BY day_idx""".stripMargin

  /** `events_transitions`: the user-journey transition matrix —
    * counts of consecutive (from_type → to_type) steps within each
    * user's time-ordered event stream, with the step share per
    * from_type (the first-order Markov model behind funnel design:
    * `events_funnel` checks ONE hypothesized path, this table ranks
    * ALL observed next-steps). Per-user ordering rides a lag window
    * PARTITIONED BY user (the sessionize discipline: state per key,
    * never a global sort); ties inside one timestamp break on
    * event_id in both engines; the rollup is one partial-agged
    * shuffle onto the |types|² frame. Share = exact integer
    * cross-multiply against the from_type's total outgoing steps. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = steps.groupBy($"from_type").agg(sum($"n").as("out_n"))
    steps.join(outTotals, Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        expr("n * 1000000 div out_n").as("share_e6"))
      .orderBy($"from_type", $"to_type")
  }

  val eventsTransitionsSql: String =
    """WITH steps AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |t AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM steps WHERE to_type IS NOT NULL
      |  GROUP BY from_type, to_type),
      |o AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS out_n FROM t GROUP BY from_type)
      |SELECT t.from_type AS from_type, t.to_type AS to_type, t.n AS n,
      |  CAST(t.n * 1000000 // o.out_n AS BIGINT) AS share_e6
      |FROM t JOIN o ON t.from_type = o.from_type
      |ORDER BY from_type, to_type""".stripMargin

  /** `text_keywords`: per-document top-3 TF-IDF terms — the keyword
    * extraction step of a corpus card / search-facet build. IDF from
    * exact integer document frequencies; the score ranks by the
    * integer cross-multiply tf·1e6·N vs df (monotone in tf·ln(N/df)
    * only within a tf level, so the CONTRACT is the score itself:
    * score_e6 = tf · e6(ln(N/df)) — integer-exact in both engines,
    * no float ranking). Postings + a broadcast N + one df join keyed
    * on term, top-3 via a per-doc window over the already-small
    * scored postings. */
  def textKeywords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val postings = Tables.documents(spark, dir)
      .select($"doc_id", explode(graft.text.TextOps.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = postings.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select($"doc_id", $"term", $"tf", $"df",
        ($"tf" * Stab.e6(log($"n_docs".cast("double") / $"df"))).as("score_e6"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score_e6".desc, $"term")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk".cast(LongType).as("rk"), $"term", $"tf",
        $"df", $"score_e6")
      .orderBy($"doc_id", $"rk")
  }

  val textKeywordsSql: String = {
    val lnTerm = graft.core.Stab.sqlE6("ln(CAST(n.n_docs AS DOUBLE) / df.df)")
    s"""WITH posting AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${graft.text.TextOps.tokensSql}) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT p.doc_id, p.term, p.tf, df.df,
       |    p.tf * $lnTerm AS score_e6
       |  FROM posting p JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, rk, term, tf, df, score_e6
       |FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score_e6 DESC, term) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin
  }

  /** `corpus_mix`: the dataset-card composition table — documents
    * AND token volume by source × language, with each cell's share
    * of corpus tokens (docs alone mislead: a source of few long
    * documents dominates training compute while looking small by
    * count — `corpus_card` reports global totals, this is the
    * breakdown mixture planning actually reads). One tokenize scan
    * into per-doc token counts, one partial-agged shuffle onto the
    * |sources|×|langs| frame, shares by integer cross-multiply
    * against the broadcast corpus total. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select($"source", $"lang",
        size(graft.text.TextOps.tokens($"text")).cast(LongType).as("n_toks"))
    val cells = perDoc.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    cells
      .crossJoin(broadcast(cells.agg(sum($"n_tokens").as("total_tokens"))))
      .select($"source", $"lang", $"n_docs", $"n_tokens",
        expr("n_tokens * 1000000 div total_tokens").as("token_share_e6"))
      .orderBy($"source", $"lang")
  }

  val corpusMixSql: String =
    s"""WITH perdoc AS (
       |  SELECT source, lang,
       |    CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT) AS n_toks
       |  FROM documents),
       |cells AS (
       |  SELECT source, lang, count(*) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
       |  FROM perdoc GROUP BY source, lang),
       |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM cells)
       |SELECT source, lang, n_docs, n_tokens,
       |  CAST(n_tokens * 1000000 // total_tokens AS BIGINT) AS token_share_e6
       |FROM cells CROSS JOIN t
       |ORDER BY source, lang""".stripMargin

  /** Histogram bucket width (chars) for [[docLenHist]]. */
  val histBucketChars = 50L

  /** `doc_len_hist`: the document-length histogram with cumulative
    * shares — the first chart of every dataset card, and the evidence
    * behind any min/max-length filter threshold (quality_quantiles
    * gives exact quantiles per language; the histogram gives the
    * whole shape at a glance). Fixed-width buckets (`n_chars div
    * 50`), per-bucket count, corpus share, and the running cumulative
    * share — all integer (`·1e6 div total`).
    *
    * Scale shape: one partial-agged shuffle onto the bucket frame
    * (bounded by max doc length / width, corpus-size independent),
    * then the cumulative window runs over that TINY aggregated frame
    * only — the events_rolling discipline: a window is fine when its
    * input is already dimension-sized. */
  def docLenHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = Tables.documents(spark, dir)
      .select(expr(s"n_chars div $histBucketChars").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
    // single-partition window is FINE here: its input is the already-
    // aggregated bucket frame (≤ maxlen/width rows at any corpus)
    val w = Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, 0)
    buckets
      .crossJoin(broadcast(buckets.agg(sum($"n").as("total"))))
      .withColumn("cum_n", sum($"n").over(w))
      .select($"bucket", ($"bucket" * histBucketChars).as("lo_chars"),
        $"n", expr("n * 1000000 div total").as("share_e6"),
        $"cum_n", expr("cum_n * 1000000 div total").as("cum_share_e6"))
      .orderBy($"bucket")
  }

  val docLenHistSql: String =
    s"""WITH b AS (
       |  SELECT n_chars // $histBucketChars AS bucket, count(*) AS n
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM b)
       |SELECT bucket, bucket * $histBucketChars AS lo_chars, n,
       |  CAST(n * 1000000 // total AS BIGINT) AS share_e6,
       |  CAST(sum(n) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |  CAST(CAST(sum(n) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    * 1000000 // total AS BIGINT) AS cum_share_e6
       |FROM b CROSS JOIN t
       |ORDER BY bucket""".stripMargin
}
