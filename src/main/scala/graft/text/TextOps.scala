package graft.text

import graft.core.{Stab, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators over the `documents` table: tokenization,
  * token counting, quality scoring, stopword-profile language ID, and
  * winnowing fingerprints.
  *
  * Everything is pure column algebra (`functions._`) — codegen'd,
  * partition-local, no shuffle except the final `orderBy` for
  * deterministic output, so each op is a single scan at any scale.
  *
  * Cross-engine determinism: tokenization is
  * `lower → split [^a-z0-9]+ → drop empties`, hashing is
  * `md5 → first 15 hex digits → 60-bit int` — every step has an
  * identical DuckDB twin (see the `*Sql` values).
  */
object TextOps {

  /** lower → split on non-alphanumeric runs → drop empty fragments. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")

  val tokensSql: String =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Word k-shingles joined with single spaces; empty when fewer than
    * k tokens (guarded: Spark's `sequence(1, n)` DESCENDS for n<1). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " "))
    ).otherwise(array().cast("array<string>"))

  def shinglesSql(w: String, k: Int): String =
    s"CASE WHEN len($w) >= $k THEN list_transform(generate_series(1, len($w) - ${k - 1}), " +
      s"i -> array_to_string($w[i:i+${k - 1}], ' ')) ELSE [] END"

  /** First 60 bits of md5 as a non-negative long — the shared
    * cross-engine string hash. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  def hash60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  // ---- text_tokens -------------------------------------------------------

  /** BPE-ish pre-tokenizer: letter runs | digit runs | single symbol. */
  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        length($"text").cast(LongType).as("n_chars_len"),
        size(tokens($"text")).cast(LongType).as("n_tokens_ws"),
        regexp_count(lower($"text"), lit(bpePattern)).cast(LongType).as("n_tokens_bpe"))
      .orderBy($"doc_id")
  }

  val textTokensSql: String =
    s"""SELECT doc_id,
       |  length(text) AS n_chars_len,
       |  CAST(len($tokensSql) AS BIGINT) AS n_tokens_ws,
       |  CAST(len(regexp_extract_all(lower(text), '$bpePattern')) AS BIGINT) AS n_tokens_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- text_quality ------------------------------------------------------

  private val enStopwords = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Per-row quality columns over any frame with (doc_id, text) —
    * pure column algebra with no aggregation or ordering, so it
    * applies unchanged to a STREAMING documents frame
    * ([[graft.streaming.QualityStream]]). */
  def qualityColumns(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val stoplist = array(enStopwords.map(lit): _*)
    val t = tokens($"text")
    docs
      .select($"doc_id", length($"text").cast(LongType).as("n_chars_len"), t.as("w"))
      .select($"doc_id", $"n_chars_len",
        size($"w").cast(LongType).as("n_tokens"),
        size(array_distinct($"w")).cast(LongType).as("n_distinct"),
        size(filter($"w", x => array_contains(stoplist, x))).cast(LongType).as("n_stop"),
        aggregate($"w", lit(0L), (acc, x) => acc + length(x)).as("sum_token_len"))
      .select($"doc_id", $"n_chars_len", $"n_tokens", $"n_distinct", $"n_stop",
        Stab.e6(when($"n_tokens" > 0, $"n_stop".cast("double") / $"n_tokens").otherwise(0.0)).as("stop_ratio_e6"),
        Stab.e6(when($"n_tokens" > 0, $"n_distinct".cast("double") / $"n_tokens").otherwise(0.0)).as("distinct_ratio_e6"),
        Stab.e6(when($"n_tokens" > 0, $"sum_token_len".cast("double") / $"n_tokens").otherwise(0.0)).as("avg_token_len_e6"))
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityColumns(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  val textQualitySql: String = {
    val stop = enStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS n_chars_len, $tokensSql AS w FROM documents
       |), c AS (
       |  SELECT doc_id, n_chars_len,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(w, x -> list_contains($stop, x))) AS BIGINT) AS n_stop,
       |    CAST(list_sum(list_prepend(0, list_transform(w, x -> length(x)))) AS BIGINT) AS sum_token_len
       |  FROM t
       |)
       |SELECT doc_id, n_chars_len, n_tokens, n_distinct, n_stop,
       |  ${Stab.sqlE6("CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END")} AS stop_ratio_e6,
       |  ${Stab.sqlE6("CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END")} AS distinct_ratio_e6,
       |  ${Stab.sqlE6("CASE WHEN n_tokens > 0 THEN CAST(sum_token_len AS DOUBLE) / n_tokens ELSE 0.0 END")} AS avg_token_len_e6
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---- text_entropy ------------------------------------------------------

  /** `text_entropy`: per-document unigram token entropy (nats) — the
    * repetition/diversity signal quality filters threshold on
    * (low-entropy ⇒ template/spam; complements `text_repetition`'s
    * span coverage with a distributional view).
    *
    * H = ln(n) − (Σ c·ln c)/n, but NOT as float sums: each term's
    * `c·ln c` is e6-stabilized to an integer FIRST, so the per-doc
    * sum is exact in any aggregation order and the division is the
    * truncating `div`↔`//` pair — the only doubles crossing engines
    * are the per-value `ln` calls on identical integer inputs. The
    * normalized ratio (H / ln n, 0..1e6) cross-multiplies in longs
    * (entropy_e6 ≤ ~45e6, no overflow at any doc size). One postings
    * shuffle onto (doc, term), one doc rollup, a broadcast-back join
    * for the zero-token docs. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("c"))
    val ent = tf.groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_distinct"),
        sum(Stab.e6($"c".cast("double") * log($"c".cast("double"))))
          .as("sum_clnc_e6"))
      .select($"doc_id", $"n".as("n_tokens"), $"n_distinct",
        (Stab.e6(log($"n".cast("double"))) - expr("sum_clnc_e6 div n"))
          .as("entropy_e6"),
        Stab.e6(log($"n".cast("double"))).as("max_entropy_e6"))
    docs.select($"doc_id").join(ent, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
        coalesce($"entropy_e6", lit(0L)).as("entropy_e6"),
        when($"max_entropy_e6" > 0L,
          expr("entropy_e6 * 1000000 div max_entropy_e6"))
          .otherwise(lit(0L)).as("norm_entropy_e6"))
      .orderBy($"doc_id")
  }

  val textEntropySql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS c FROM (
       |    SELECT doc_id, unnest($tokensSql) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |ent AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    count(*) AS n_distinct,
       |    CAST(sum(${Stab.sqlE6("CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))")}) AS BIGINT) AS sum_clnc_e6
       |  FROM tf GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(n_tokens, 0) AS n_tokens,
       |  coalesce(n_distinct, 0) AS n_distinct,
       |  coalesce(${Stab.sqlE6("ln(CAST(n_tokens AS DOUBLE))")} - (sum_clnc_e6 // n_tokens), 0) AS entropy_e6,
       |  CASE WHEN coalesce(${Stab.sqlE6("ln(CAST(n_tokens AS DOUBLE))")}, 0) > 0
       |    THEN (${Stab.sqlE6("ln(CAST(n_tokens AS DOUBLE))")} - (sum_clnc_e6 // n_tokens)) * 1000000
       |      // ${Stab.sqlE6("ln(CAST(n_tokens AS DOUBLE))")}
       |    ELSE 0 END AS norm_entropy_e6
       |FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- text_lang_id ------------------------------------------------------

  /** Tiny stopword profiles; scored by membership count, argmax with
    * alphabetical tie-break (the CASE chain tests langs in
    * alphabetical order with >=, so the first maximal lang wins in
    * BOTH engines). */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "des", "que", "une", "dans"),
    "zh" -> Seq("shi", "de", "le", "wo", "ni", "zai", "you", "he"),
  )

  def textLangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = tokens($"text")
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"lang".as("lang_actual"), t.as("w"))
      .select(Seq($"doc_id", $"lang_actual") ++ langProfiles.map { case (lang, words) =>
        val wl = array(words.map(lit): _*)
        size(filter($"w", x => array_contains(wl, x))).cast(LongType).as(s"s_$lang")
      }: _*)
    val langs = langProfiles.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (lang, rest) =>
      val isMax = langs.filter(_ != lang)
        .map(o => col(s"s_$lang") >= col(s"s_$o"))
        .reduce(_ && _)
      when(isMax, lit(lang)).otherwise(rest)
    }
    scored.withColumn("lang_pred", pred).orderBy($"doc_id")
  }

  val textLangIdSql: String = {
    val scoreCols = langProfiles.map { case (lang, words) =>
      val wl = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(w, x -> list_contains($wl, x))) AS BIGINT) AS s_$lang"
    }.mkString(",\n    ")
    val langs = langProfiles.map(_._1)
    val cases = langs.dropRight(1).map { lang =>
      val cond = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, lang AS lang_actual, $tokensSql AS w FROM documents
       |), s AS (
       |  SELECT doc_id, lang_actual,
       |    $scoreCols
       |  FROM t
       |)
       |SELECT *, CASE
       |    $cases
       |    ELSE '${langs.last}' END AS lang_pred
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** `lang_id_eval`: the language identifier held accountable as a
    * query — the full confusion matrix of `text_lang_id` (actual ×
    * predicted counts, plus each cell's share of its actual-language
    * row, e6 by integer division). The `index_recall_eval` pattern
    * applied to the text side: the classifier's quality is a
    * MEASURED table, not a prose claim. Derived entirely from the
    * already-oracled per-doc prediction frame — two tiny rollups on
    * |langs|² cells. */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = textLangId(spark, dir)
      .groupBy($"lang_actual", $"lang_pred")
      .agg(count(lit(1)).as("n"))
    val totals = per.groupBy($"lang_actual").agg(sum($"n").as("n_actual"))
    per.join(broadcast(totals), Seq("lang_actual"))
      .select($"lang_actual", $"lang_pred", $"n",
        expr("n * 1000000 div n_actual").as("share_e6"))
      .orderBy($"lang_actual", $"lang_pred")
  }

  val langIdEvalSql: String =
    s"""WITH p AS (
       |$textLangIdSql
       |), per AS (
       |  SELECT lang_actual, lang_pred, count(*) AS n
       |  FROM p GROUP BY lang_actual, lang_pred
       |), t2 AS (
       |  SELECT lang_actual, CAST(sum(n) AS BIGINT) AS n_actual
       |  FROM per GROUP BY lang_actual)
       |SELECT lang_actual, lang_pred, n, n * 1000000 // n_actual AS share_e6
       |FROM per JOIN t2 USING (lang_actual)
       |ORDER BY lang_actual, lang_pred""".stripMargin

  // ---- text_unigram_ll ---------------------------------------------------

  /** Unigram-LM log-likelihood quality score — the perplexity-style
    * filter every pre-training pipeline runs (docs whose tokens are
    * improbable under the corpus distribution are noise candidates):
    * per doc, Σ tf(term)·ln(p(term)) with p = corpus unigram MLE, and
    * a keep flag at mean-logprob ≥ −3.45 (sf-corpus calibrated;
    * compared as exact longs: sum_lp_e6 ≥ −3450000·n_tokens, no
    * division).
    *
    * Scale shape: one corpus scan → explode → (doc,term) aggregation
    * [the only corpus-sized shuffle], materialized once (Spark does
    * not reuse the exchange across the freq and scoring consumers —
    * at warehouse scale this is the persisted postings intermediate
    * every token-stats pipeline keeps anyway). The term-frequency
    * table is vocab-sized; the scoring join lets AQE choose its
    * strategy rather than hard-coding a broadcast of a possibly
    * heavy-tailed vocabulary.
    *
    * Cross-engine determinism: ln(cnt/T) is e6-stabilized per TERM,
    * then multiplied by integer tf and long-summed per doc — no
    * float aggregation anywhere. */
  def textUnigramLl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("w"))
    val postings = toks.select($"doc_id", explode($"w").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val freq = postings.groupBy($"term").agg(sum($"tf").as("cnt"))
    val tot = freq.agg(sum($"cnt").cast("double").as("t"))
    postings.join(freq, Seq("term"))
      .crossJoin(broadcast(tot))
      .select($"doc_id", $"tf",
        ($"tf" * Stab.e6(log($"cnt".cast("double") / $"t"))).as("lp_e6"))
      .groupBy($"doc_id").agg(
        sum($"tf").as("n_tokens"),
        sum($"lp_e6").as("sum_lp_e6"))
      .select($"doc_id", $"n_tokens", $"sum_lp_e6",
        ($"sum_lp_e6" >= lit(-3450000L) * $"n_tokens").as("keep"))
      .orderBy($"doc_id")
  }

  val textUnigramLlSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
       |posting AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM toks)
       |  GROUP BY doc_id, term),
       |freq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM posting GROUP BY term),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM freq),
       |perdoc AS (
       |  SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS n_tokens,
       |    CAST(sum(p.tf * ${Stab.sqlE6("ln(CAST(f.cnt AS DOUBLE) / t.t)")}) AS BIGINT) AS sum_lp_e6
       |  FROM posting p JOIN freq f USING (term) CROSS JOIN tot t
       |  GROUP BY p.doc_id)
       |SELECT doc_id, n_tokens, sum_lp_e6,
       |  sum_lp_e6 >= -3450000 * n_tokens AS keep
       |FROM perdoc ORDER BY doc_id""".stripMargin

  /** `text_bigram_ll`: bigram-LM fluency scoring — the next model up
    * from [[textUnigramLl]]'s bag-of-words (a unigram LL cannot see
    * scrambled word ORDER; a bigram conditional can, and word-order
    * degeneracy is exactly what template spam and shuffled scrapes
    * look like). Per doc: Σ tf·ln P(w₂|w₁) with add-1 smoothing,
    * P = (c(w₁w₂)+1)/(c(w₁·)+V) — the context count is the exact
    * PREFIX total (Σ bigrams starting w₁, not the unigram count:
    * the conditional then normalizes exactly), V = distinct
    * unigrams. keep ⇔ the doc's mean bigram LL is at least the
    * corpus mean, compared by integer cross-multiplication through
    * decimal(38,0)/HUGEINT (sums are negative: multipliers — both
    * token counts — are positive, so the inequality direction
    * survives the cross-multiply; the q14/dsir overflow convention).
    *
    * Scale shape: one tokenize+shingle scan into (doc, bigram, tf)
    * postings, bigram/prefix count tables join by KEY (corpus-sized
    * — never broadcast), V and the corpus mean are one-row broadcast
    * frames, one per-doc partial-agged rollup. Bigram and prefix
    * KEYS are hash60 LONGS, not strings (the dsir convention):
    * string-keyed joins went 12.9× for 10× data on the replica
    * curve (vocabulary explosion widens every shuffle row);
    * fixed-width keys keep the shuffles linear at any vocabulary,
    * and a 60-bit md5 collision merging two bigrams' counts is
    * identical in both engines. */
  def textBigramLl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("w"))
    val bg = toks.select($"doc_id", explode(shingles($"w", 2)).as("s"))
      .select($"doc_id", hash60($"s").as("bg"),
        hash60(substring_index($"s", " ", 1)).as("prefix"))
      .groupBy($"doc_id", $"bg", $"prefix").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // bfreq keeps the prefix so ctx aggregates the ALREADY-small
    // model table (not the corpus postings), and cc attaches to
    // bfreq model-side — the corpus postings then ride ONE join on
    // bg instead of two full-volume reshuffles
    val bfreq = bg.groupBy($"bg", $"prefix").agg(sum($"tf").as("bc"))
    val ctx = bfreq.groupBy($"prefix").agg(sum($"bc").as("cc"))
    val model = bfreq.join(ctx, Seq("prefix"))
      .select($"bg", $"prefix", $"bc", $"cc")
    val vocab = toks.select(explode($"w").as("t"))
      .agg(countDistinct(hash60($"t")).cast("double").as("v"))
    // join on BOTH keys: a bg-hash collision across different
    // prefixes must not multiply posting rows
    val perDoc = bg
      .join(model, Seq("bg", "prefix"))
      .crossJoin(broadcast(vocab))
      .select($"doc_id", $"tf",
        ($"tf" * Stab.e6(log(($"bc" + 1).cast("double") / ($"cc" + $"v"))))
          .as("lp_e6"))
      .groupBy($"doc_id").agg(
        sum($"tf").as("n_bigrams"),
        sum($"lp_e6").as("sum_lp_e6"))
      .localCheckpoint(true)
    val corpus = perDoc.agg(sum($"n_bigrams").as("g_n"),
      sum($"sum_lp_e6").as("g_sum"))
    perDoc.crossJoin(broadcast(corpus))
      .select($"doc_id", $"n_bigrams", $"sum_lp_e6",
        (expr("cast(sum_lp_e6 as decimal(38,0)) * g_n") >=
          expr("cast(g_sum as decimal(38,0)) * n_bigrams")).as("keep"))
      .orderBy($"doc_id")
  }

  val textBigramLlSql: String =
    s"""WITH toks AS (SELECT doc_id, $tokensSql AS w FROM documents),
       |posting AS (
       |  SELECT doc_id, ${hash60Sql("s")} AS bg,
       |    ${hash60Sql("split_part(s, ' ', 1)")} AS prefix, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${shinglesSql("w", 2)}) AS s FROM toks)
       |  GROUP BY 1, 2, 3),
       |bfreq AS (
       |  SELECT bg, prefix, CAST(sum(tf) AS BIGINT) AS bc
       |  FROM posting GROUP BY bg, prefix),
       |ctx AS (SELECT prefix, CAST(sum(bc) AS BIGINT) AS cc FROM bfreq GROUP BY prefix),
       |vocab AS (
       |  SELECT CAST(count(DISTINCT ${hash60Sql("t")}) AS DOUBLE) AS v
       |  FROM (SELECT unnest(w) AS t FROM toks)),
       |perdoc AS (
       |  SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS n_bigrams,
       |    CAST(sum(p.tf * ${Stab.sqlE6("ln(CAST(f.bc + 1 AS DOUBLE) / (c.cc + vocab.v))")}) AS BIGINT) AS sum_lp_e6
       |  FROM posting p JOIN bfreq f USING (bg, prefix)
       |  JOIN ctx c ON c.prefix = p.prefix
       |  CROSS JOIN vocab
       |  GROUP BY p.doc_id),
       |corpus AS (
       |  SELECT CAST(sum(n_bigrams) AS BIGINT) AS g_n,
       |    CAST(sum(sum_lp_e6) AS BIGINT) AS g_sum FROM perdoc)
       |SELECT doc_id, n_bigrams, sum_lp_e6,
       |  CAST(sum_lp_e6 AS HUGEINT) * g_n >= CAST(g_sum AS HUGEINT) * n_bigrams AS keep
       |FROM perdoc CROSS JOIN corpus
       |ORDER BY doc_id""".stripMargin

  // ---- dsir_importance (hashed n-gram importance resampling) -------------

  /** Hashed feature buckets for [[dsirImportance]]. DSIR's bag-of-
    * hashed-ngrams keeps the model size FIXED at any corpus size —
    * the two distribution estimates are B-row tables regardless of
    * vocabulary, which is what makes the method serviceable at
    * 100 TB (a raw-vocab bigram LM would be corpus-sized). */
  val dsirBuckets = 8192
  private val dsirTargetLang = "en"

  /** `dsir_importance`: Data Selection via Importance Resampling
    * (Xie et al., arXiv:2302.03169) — score every raw document by
    * how much more likely its hashed unigram+bigram bag is under a
    * TARGET domain's distribution than under the raw corpus's own:
    * `log w(x) = Σ_f tf_f · (ln p̂_target[f] − ln p̂_raw[f])`, add-1
    * smoothed over the B buckets. Target here = the `en` slice (the
    * classic select-in-domain-like-data demo — the synthetic sources
    * are homogeneous mixtures, but languages are genuinely distinct
    * distributions); a real pipeline swaps the target predicate.
    * Features are 60-bit-hashed into B buckets with the same
    * md5-based [[hash60]] both engines share. A doc keeps iff its
    * per-feature MEAN log-ratio beats the corpus mean — a relative
    * cut (DSIR resamples by relative weight; an absolute sign test is
    * inert when target and raw share most content vocabulary, as this
    * synthetic corpus does). The comparison is exact integer
    * cross-multiplication of the two (sum, count) pairs — no float
    * aggregation, no global sort, just a broadcast one-row total.
    *
    * Plan shape: one tokenize+explode scan into (doc, bucket, tf)
    * postings (the same intermediate `text_unigram_ll` keeps), the
    * two distribution estimates collapse to ≤ B-row frames which
    * BROADCAST back onto the postings (never a shuffle of the corpus
    * against the model), one per-doc partial-agged rollup. Per-bucket
    * log-probabilities are e6-stabilized then tf-multiplied and
    * long-summed — no float aggregation; the keep verdict
    * (mean log-ratio > 0 ⇔ likelier under target) compares exact
    * integer cross-products. */
  def dsirImportance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = dsirBuckets
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", ($"lang" === dsirTargetLang).as("is_target"),
        tokens($"text").as("w"))
    val feats = toks.select($"doc_id", $"is_target",
        explode(concat(shingles($"w", 1), shingles($"w", 2))).as("g"))
      .select($"doc_id", $"is_target", (hash60($"g") % B).as("b"))
    val postings = feats.groupBy($"doc_id", $"is_target", $"b")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    def dist(side: DataFrame): DataFrame = side.groupBy($"b")
      .agg(sum($"tf").as("cnt"))
    val tgt = dist(postings.filter($"is_target"))
      .withColumnRenamed("cnt", "tcnt")
    val raw = dist(postings).withColumnRenamed("cnt", "rcnt")
    val tots = postings.agg(
      sum(when($"is_target", $"tf").otherwise(0L)).cast("double").as("tn"),
      sum($"tf").cast("double").as("rn"))
    postings
      .join(broadcast(tgt), Seq("b"), "left")
      .join(broadcast(raw), Seq("b"))
      .crossJoin(broadcast(tots))
      .select($"doc_id", $"tf",
        ($"tf" * (
          Stab.e6(log((coalesce($"tcnt", lit(0L)).cast("double") + 1.0) / ($"tn" + B))) -
          Stab.e6(log(($"rcnt".cast("double") + 1.0) / ($"rn" + B)))
        )).as("lr_e6"))
      .groupBy($"doc_id").agg(
        sum($"tf").as("n_feats"),
        sum($"lr_e6").as("sum_lr_e6"))
      // checkpoint the doc-cardinality scores so the corpus-total
      // branch reads them instead of re-running the scoring subtree
      .localCheckpoint(true)
      .transform { perDoc =>
        val corpus = perDoc.agg(
          sum($"n_feats").as("tot_feats"), sum($"sum_lr_e6").as("tot_lr_e6"))
        perDoc.crossJoin(broadcast(corpus))
          .select($"doc_id", $"n_feats", $"sum_lr_e6",
            // decimal(38) products: the long×long cross-multiplication
            // overflows past ~1e9 docs × 1e3 feats (silently in Spark,
            // not in DuckDB's HUGEINT) and would flip keep verdicts
            // exactly at the scale the op claims to serve
            ($"sum_lr_e6".cast("decimal(38,0)") * $"tot_feats" >
              $"n_feats".cast("decimal(38,0)") * $"tot_lr_e6").as("keep"))
      }
      .orderBy($"doc_id")
  }

  val dsirImportanceSql: String = {
    val B = dsirBuckets
    s"""WITH toks AS (
       |  SELECT doc_id, lang = '$dsirTargetLang' AS is_target,
       |    $tokensSql AS w
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, is_target, ${hash60Sql("g")} % $B AS b
       |  FROM (SELECT doc_id, is_target,
       |          unnest(list_concat(${shinglesSql("w", 1)}, ${shinglesSql("w", 2)})) AS g
       |        FROM toks)),
       |posting AS (
       |  SELECT doc_id, is_target, b, count(*) AS tf
       |  FROM feats GROUP BY doc_id, is_target, b),
       |tgt AS (SELECT b, CAST(sum(tf) AS BIGINT) AS tcnt FROM posting WHERE is_target GROUP BY b),
       |raw AS (SELECT b, CAST(sum(tf) AS BIGINT) AS rcnt FROM posting GROUP BY b),
       |tots AS (
       |  SELECT CAST(sum(CASE WHEN is_target THEN tf ELSE 0 END) AS DOUBLE) AS tn,
       |    CAST(sum(tf) AS DOUBLE) AS rn
       |  FROM posting),
       |perdoc AS (
       |  SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS n_feats,
       |    CAST(sum(p.tf * (
       |      ${Stab.sqlE6(s"ln((CAST(coalesce(t.tcnt, 0) AS DOUBLE) + 1.0) / (tots.tn + $B))")} -
       |      ${Stab.sqlE6(s"ln((CAST(r.rcnt AS DOUBLE) + 1.0) / (tots.rn + $B))")}
       |    )) AS BIGINT) AS sum_lr_e6
       |  FROM posting p
       |  LEFT JOIN tgt t USING (b)
       |  JOIN raw r USING (b)
       |  CROSS JOIN tots
       |  GROUP BY p.doc_id),
       |corpus AS (
       |  SELECT CAST(sum(n_feats) AS BIGINT) AS tot_feats,
       |    CAST(sum(sum_lr_e6) AS BIGINT) AS tot_lr_e6
       |  FROM perdoc)
       |SELECT doc_id, n_feats, sum_lr_e6,
       |  sum_lr_e6 * tot_feats > n_feats * tot_lr_e6 AS keep
       |FROM perdoc CROSS JOIN corpus ORDER BY doc_id""".stripMargin
  }

  // ---- text_fingerprint (winnowing) --------------------------------------

  /** Winnowing fingerprints: char 8-grams → 60-bit rolling hash set →
    * min per 4-gram window → distinct mins per doc
    * (Schleimer/Wilkerson/Aiken, SIGMOD'03). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        explode(graft.functions.hashes.winnowFingerprints($"text", 8, 4)).as("fp"))
      .orderBy($"doc_id", $"fp")
  }

  val textFingerprintSql: String = {
    val h = hash60Sql("substr(t, i, 8)")
    s"""WITH g AS (
       |  SELECT doc_id,
       |    CASE WHEN length(t) >= 8
       |      THEN list_transform(generate_series(1, length(t) - 7), i -> $h)
       |      ELSE [] END AS g
       |  FROM (SELECT doc_id, lower(text) AS t FROM documents)
       |), w AS (
       |  SELECT doc_id,
       |    CASE WHEN len(g) >= 4
       |      THEN list_transform(generate_series(1, len(g) - 3), i -> list_min(g[i:i+3]))
       |      ELSE g END AS wins
       |  FROM g
       |)
       |SELECT DISTINCT doc_id, fp
       |FROM (SELECT doc_id, unnest(wins) AS fp FROM w)
       |ORDER BY doc_id, fp""".stripMargin
  }

  // ---- text_ngram_stats --------------------------------------------------

  /** `text_ngram_stats`: corpus-level n-gram statistics — the top-50
    * word 3-grams by document frequency (plus total occurrences).
    * This is the table contamination screens and boilerplate
    * stop-lists are DERIVED from: the spans `dedup_substring` mutes
    * via `dedup_boilerplate` start life as exactly this kind of
    * high-df report, at n-gram granularity.
    *
    * Scale shape: the explode is map-side inside the scan's codegen
    * stage; the aggregate is ONE shuffle keyed by ngram with
    * map-side partial counts (df via the standard two-phase distinct
    * expansion); the top-k cut is orderBy+limit —
    * TakeOrderedAndProject's per-partition 50-row heaps, never a
    * global window. Output order (df desc, tf desc, ngram asc) is
    * total, so the 50-row cut is deterministic and fully
    * SQL-oracled. */
  def textNgramStats(spark: SparkSession, dir: String,
      n: Int = 3, topK: Int = 50): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(shingles(tokens($"text"), n)).as("ngram"))
      .groupBy($"ngram")
      .agg(countDistinct($"doc_id").cast(LongType).as("df"),
        count(lit(1)).cast(LongType).as("tf"))
      .orderBy($"df".desc, $"tf".desc, $"ngram".asc)
      .limit(topK)
  }

  val textNgramStatsSql: String =
    s"""SELECT ngram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       |  CAST(count(*) AS BIGINT) AS tf
       |FROM (SELECT doc_id, unnest(${shinglesSql("w", 3)}) AS ngram
       |      FROM (SELECT doc_id, $tokensSql AS w FROM documents))
       |GROUP BY ngram
       |ORDER BY df DESC, tf DESC, ngram ASC
       |LIMIT 50""".stripMargin

  // ---- text_repetition ---------------------------------------------------

  /** `text_repetition`: per-document repetition signals — the
    * duplicated/top n-gram character-coverage family every
    * pre-training quality pipeline screens on (excessively repetitive
    * documents are boilerplate or generation loops, not prose). Per
    * doc: the fraction of token characters covered by words and
    * 2/3-grams that occur MORE THAN ONCE in the document, the
    * fraction covered by the single heaviest 2-gram, and a keep
    * verdict (drop when top-2-gram > 0.20 or duplicated 2-grams >
    * 0.25 of token chars — calibrated so both arms fire on this
    * corpus; compared as exact integer cross-multiplications, no
    * division).
    *
    * Scale shape: pure per-row column algebra — one scan, no shuffle
    * except the deterministic output `orderBy`. The within-document
    * counting is a SORT + run-length fold (O(len·log len) per doc,
    * never the O(distinct·len) nested filter shape that degrades
    * quadratically on long documents), all inside codegen, never a
    * corpus-wide aggregation: at 100 TB this is exactly as parallel
    * as the scan itself. The DuckDB twin keeps the simpler nested
    * counting — two different algorithms for the same integers is a
    * stronger oracle, not a weaker one.
    *
    * Cross-engine determinism: character counts are exact longs;
    * fractions are e6-stabilized quotients of exact longs; the keep
    * verdict never divides. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // chars covered by grams occurring >1 time (all occurrences):
    // sort, then fold runs of equal grams — state (prev, run, acc)
    def dupChars(arr: Column): Column =
      aggregate(array_sort(arr),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
        (s, x) => {
          val closed = s("acc") +
            when(s("run") > 1, s("run") * length(s("prev"))).otherwise(0L)
          struct(x.as("prev"),
            when(x === s("prev"), s("run") + 1L).otherwise(lit(1L)).as("run"),
            when(x === s("prev"), s("acc")).otherwise(closed).as("acc"))
        },
        s => s("acc") + when(s("run") > 1, s("run") * length(s("prev"))).otherwise(0L))
    // heaviest single gram's char coverage, same run fold with a max
    def topChars(arr: Column): Column =
      aggregate(array_sort(arr),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (s, x) => {
          val closed = greatest(s("best"), s("run") * length(s("prev")))
          struct(x.as("prev"),
            when(x === s("prev"), s("run") + 1L).otherwise(lit(1L)).as("run"),
            when(x === s("prev"), s("best")).otherwise(closed).as("best"))
        },
        s => greatest(s("best"), s("run") * length(s("prev"))))
    val t = tokens($"text")
    Tables.documents(spark, dir)
      .select($"doc_id", t.as("w"))
      .select($"doc_id", $"w", shingles($"w", 2).as("s2"), shingles($"w", 3).as("s3"),
        aggregate($"w", lit(0L), (acc, x) => acc + length(x)).as("sum_token_len"))
      .select($"doc_id",
        size($"w").cast(LongType).as("n_tokens"), $"sum_token_len",
        dupChars($"w").as("dup_word_chars"),
        dupChars($"s2").as("dup2_chars"),
        dupChars($"s3").as("dup3_chars"),
        topChars($"s2").as("top2_chars"))
      .select($"doc_id", $"n_tokens", $"sum_token_len",
        $"dup_word_chars", $"dup2_chars", $"dup3_chars", $"top2_chars",
        Stab.e6(when($"sum_token_len" > 0,
          $"dup_word_chars".cast("double") / $"sum_token_len").otherwise(0.0)).as("dup_word_frac_e6"),
        Stab.e6(when($"sum_token_len" > 0,
          $"dup2_chars".cast("double") / $"sum_token_len").otherwise(0.0)).as("dup2_frac_e6"),
        Stab.e6(when($"sum_token_len" > 0,
          $"dup3_chars".cast("double") / $"sum_token_len").otherwise(0.0)).as("dup3_frac_e6"),
        Stab.e6(when($"sum_token_len" > 0,
          $"top2_chars".cast("double") / $"sum_token_len").otherwise(0.0)).as("top2_frac_e6"),
        ($"sum_token_len" > 0 &&
          !($"top2_chars" * 5 > $"sum_token_len" || $"dup2_chars" * 4 > $"sum_token_len")).as("keep"))
      .orderBy($"doc_id")
  }

  val textRepetitionSql: String = {
    def cnts(arr: String) =
      s"list_transform(list_distinct($arr), g -> {'tf': CAST(len(list_filter($arr, x -> x = g)) AS BIGINT), 'len': CAST(length(g) AS BIGINT)})"
    def dup(c: String) =
      s"CAST(list_sum(list_prepend(0, list_transform($c, c -> CASE WHEN c.tf > 1 THEN c.tf * c.len ELSE 0 END))) AS BIGINT)"
    def top(c: String) =
      s"CAST(coalesce(list_max(list_transform($c, c -> c.tf * c.len)), 0) AS BIGINT)"
    def frac(num: String) =
      Stab.sqlE6(s"CASE WHEN sum_token_len > 0 THEN CAST($num AS DOUBLE) / sum_token_len ELSE 0.0 END")
    s"""WITH t AS (SELECT doc_id, $tokensSql AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, w, ${shinglesSql("w", 2)} AS s2, ${shinglesSql("w", 3)} AS s3,
       |    CAST(list_sum(list_prepend(0, list_transform(w, x -> length(x)))) AS BIGINT) AS sum_token_len
       |  FROM t
       |), c AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, sum_token_len,
       |    ${dup(cnts("w"))} AS dup_word_chars,
       |    ${dup(cnts("s2"))} AS dup2_chars,
       |    ${dup(cnts("s3"))} AS dup3_chars,
       |    ${top(cnts("s2"))} AS top2_chars
       |  FROM sh
       |)
       |SELECT doc_id, n_tokens, sum_token_len,
       |  dup_word_chars, dup2_chars, dup3_chars, top2_chars,
       |  ${frac("dup_word_chars")} AS dup_word_frac_e6,
       |  ${frac("dup2_chars")} AS dup2_frac_e6,
       |  ${frac("dup3_chars")} AS dup3_frac_e6,
       |  ${frac("top2_chars")} AS top2_frac_e6,
       |  (sum_token_len > 0 AND
       |    NOT (top2_chars * 5 > sum_token_len OR dup2_chars * 4 > sum_token_len)) AS keep
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---- corpus_card -------------------------------------------------------

  /** `corpus_card`: the one-row dataset summary card every corpus
    * release ships — document/token/vocabulary counts, language
    * count, exact-duplicate rate, and mean document length. All
    * integer counts plus e6-stabilized ratios, so the card is
    * hash-exact cross-engine.
    *
    * Scale shape: one corpus scan feeding three partial-agged
    * aggregations (global counts; distinct-term count through the
    * standard two-phase expansion; md5-group dup count), each
    * output-tiny. No windows, no joins against the corpus. */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", md5($"text").as("h"), tokens($"text").as("w"))
      .localCheckpoint(true)
    val base = toks.agg(
      count(lit(1)).as("n_docs"),
      countDistinct($"lang").as("n_langs"),
      sum(size($"w")).cast(LongType).as("n_tokens"))
    val vocab = toks.select(explode($"w").as("term"))
      .agg(countDistinct($"term").as("vocab_size"))
    val dups = toks.groupBy($"h").agg(count(lit(1)).as("n"))
      .agg(sum($"n" - 1).cast(LongType).as("n_dup_docs"))
    base.crossJoin(vocab).crossJoin(dups)
      .select($"n_docs", $"n_langs", $"n_tokens", $"vocab_size", $"n_dup_docs",
        Stab.e6($"n_dup_docs".cast("double") / $"n_docs").as("dup_rate_e6"),
        Stab.e6($"n_tokens".cast("double") / $"n_docs").as("mean_doc_tokens_e6"))
  }

  val corpusCardSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, md5(text) AS h, $tokensSql AS w FROM documents
       |), base AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(sum(len(w)) AS BIGINT) AS n_tokens
       |  FROM t
       |), vocab AS (
       |  SELECT CAST(count(DISTINCT term) AS BIGINT) AS vocab_size
       |  FROM (SELECT unnest(w) AS term FROM t)
       |), dups AS (
       |  SELECT CAST(sum(n - 1) AS BIGINT) AS n_dup_docs
       |  FROM (SELECT count(*) AS n FROM t GROUP BY h)
       |)
       |SELECT n_docs, n_langs, n_tokens, vocab_size, n_dup_docs,
       |  ${Stab.sqlE6("CAST(n_dup_docs AS DOUBLE) / n_docs")} AS dup_rate_e6,
       |  ${Stab.sqlE6("CAST(n_tokens AS DOUBLE) / n_docs")} AS mean_doc_tokens_e6
       |FROM base CROSS JOIN vocab CROSS JOIN dups""".stripMargin

  // ---- text_pii_scrub ----------------------------------------------------

  /** PII patterns shared by both engines: Java regex (Spark) and RE2
    * (DuckDB) agree on this subset — character classes, bounded
    * repetition, word boundaries; no lookaround, no backrefs. */
  private[graft] val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "[PHONE]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"))

  /** Scrub + count columns over any (doc_id, text) frame — the
    * factored core so the spec can drive synthetic rows carrying real
    * PII through the exact production expressions (this corpus is
    * clean, so the registry entry's oracle pins the no-match
    * behavior: counts 0, text byte-identical). */
  def piiScrubColumns(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val scrubbed = piiPatterns.foldLeft(lower($"text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    val countCols = piiPatterns.map { case (kind, pat, _) =>
      regexp_count(lower($"text"), lit(pat)).cast(LongType).as(s"n_$kind")
    }
    docs.select(Seq($"doc_id", md5(lower($"text")).as("orig_md5"),
      md5(scrubbed).as("scrubbed_md5"),
      (scrubbed =!= lower($"text")).as("changed")) ++ countCols: _*)
  }

  /** `text_pii_scrub`: per-document PII redaction (emails, phones,
    * IPv4) with match counts and a changed flag. One scan, pure
    * codegen'd per-row regex algebra, no shuffle except the output
    * order. */
  def textPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    piiScrubColumns(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  val textPiiScrubSql: String = {
    val scrubbed = piiPatterns.foldLeft("lower(text)") {
      case (e, (_, pat, repl)) =>
        s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
    val countCols = piiPatterns.map { case (kind, pat, _) =>
      s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS BIGINT) AS n_$kind"
    }.mkString(",\n  ")
    s"""SELECT doc_id, md5(lower(text)) AS orig_md5,
       |  md5($scrubbed) AS scrubbed_md5,
       |  $scrubbed <> lower(text) AS changed,
       |  $countCols
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- quality_quantiles -------------------------------------------------

  /** `quality_quantiles`: per-language token-length distribution —
    * exact interpolated quartiles + p90 (the corpus-profiling table a
    * length-filter threshold is read off), with the
    * `events_approx_users` attestation pattern applied to
    * `approx_percentile`: the exact percentile shuffles each group's
    * values (fine here, the oracle needs it; a single giant group at
    * 100 TB would not fit), the KLL-style sketch is the scale tool,
    * and the in-plan flag holds the sketch's p50 within max(2, 10%)
    * of the exact one — pinned true by the oracle, so sketch drift
    * flips the hash. */
  def qualityQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"lang", size(tokens($"text")).cast("double").as("n"))
    toks.groupBy($"lang").agg(
        Stab.e6(percentile($"n", lit(0.25))).as("p25_e6"),
        Stab.e6(percentile($"n", lit(0.5))).as("p50_e6"),
        Stab.e6(percentile($"n", lit(0.75))).as("p75_e6"),
        Stab.e6(percentile($"n", lit(0.9))).as("p90_e6"),
        percentile($"n", lit(0.5)).as("exact_p50"),
        approx_percentile($"n", lit(0.5), lit(10000)).as("approx_p50"))
      .select($"lang", $"p25_e6", $"p50_e6", $"p75_e6", $"p90_e6",
        (abs($"approx_p50" - $"exact_p50") <=
          greatest(lit(2.0), $"exact_p50" * 0.1)).as("sketch_p50_ok"))
      .orderBy($"lang")
  }

  val qualityQuantilesSql: String = {
    def q(p: String) = Stab.sqlE6(s"quantile_cont(n, $p)")
    s"""SELECT lang, ${q("0.25")} AS p25_e6, ${q("0.5")} AS p50_e6,
       |  ${q("0.75")} AS p75_e6, ${q("0.9")} AS p90_e6,
       |  true AS sketch_p50_ok
       |FROM (SELECT lang, CAST(len($tokensSql) AS DOUBLE) AS n FROM documents)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }
}
