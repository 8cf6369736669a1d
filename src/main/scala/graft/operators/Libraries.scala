package graft.operators

import graft.core.{Stab, Tables}
import graft.embed.Embedder
import graft.functions.vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's top hierarchy level and its write-path invariants,
  * re-expressed as batch DataFrame algebra:
  *
  *  - library CRUD (/root/reference/src/main.py:108-153),
  *  - referential integrity enforced on every write — library
  *    existence (main.py:159-162) and the chunk→document→library
  *    chain (main.py:221-232) — here a batch orphan-detection
  *    operator built from anti-joins,
  *  - library-scoped cascade delete (main.py:130-141 deletes a
  *    library and everything under it),
  *  - partial update with column-merge semantics — non-null fields
  *    overwrite, null fields keep the stored value, `created_at` is
  *    preserved (collection.py:134-142),
  *  - embedding auto-generation on write — content updates without a
  *    supplied embedding are re-embedded (main.py:234-238, 297-299),
  *  - the `metadata` map column every record carries
  *    (datarecord.py:17), modeled as a Spark `map<string,string>` and
  *    filtered via `element_at`.
  *
  * Libraries derive from the documents' `source` column (one library
  * per source). The reference checks integrity one record per HTTP
  * request; at 100 TB the same invariants are one scan + anti-joins —
  * linear, shuffle-partitioned on the key, no driver loops.
  */
object Libraries {

  /** `crud_library`: the libraries table with per-library stats plus
    * a CRUD batch in `crud_upsert`'s style — one library's metadata
    * updated, one new empty library inserted, rest kept. */
  def crudLibrary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val libs = Tables.documents(spark, dir)
      .groupBy($"source".as("library_id"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
    val stamped = libs.withColumn("op",
      when($"library_id" === "src0", lit("updated")).otherwise(lit("kept")))
    val inserted = spark.range(1).select(
      lit("src_new").as("library_id"), lit(0L).as("n_docs"),
      lit(0L).as("total_chars"), lit("inserted").as("op"))
    stamped.unionByName(inserted).orderBy($"library_id")
  }

  val crudLibrarySql: String =
    """SELECT library_id, n_docs, total_chars, op FROM (
      |  SELECT source AS library_id, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |    CASE WHEN source = 'src0' THEN 'updated' ELSE 'kept' END AS op
      |  FROM documents GROUP BY source
      |  UNION ALL
      |  SELECT 'src_new', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'inserted'
      |) ORDER BY library_id""".stripMargin

  /** `crud_integrity`: batch orphan detection over the 3-level chain.
    * Scenario: library `src1` was deleted without cascading (its
    * documents are orphans), and documents with `doc_id % 7 = 3` were
    * deleted without cascading (their chunks are orphans). Both
    * violations surface from one anti-join each — the set-algebra
    * form of the reference's per-write existence checks. */
  def crudIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val libs = docs.select($"source").distinct().filter($"source" =!= "src1")
    val docOrphans = docs
      .join(libs, Seq("source"), "left_anti")
      .select(lit("doc_no_library").as("kind"), $"doc_id",
        lit(-1L).as("chunk_idx"), $"source".as("parent"))
    val deletedDocs = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
    val chunkOrphans = Collections.chunkDocuments(spark, dir)
      .join(deletedDocs, Seq("doc_id"), "left_semi")
      .select(lit("chunk_no_document").as("kind"), $"doc_id",
        $"chunk_idx", $"doc_id".cast("string").as("parent"))
    docOrphans.unionByName(chunkOrphans)
      .orderBy($"kind", $"doc_id", $"chunk_idx")
  }

  val crudIntegritySql: String =
    s"""WITH chunks AS (${Collections.chunkDocumentsSql}),
       |libs AS (SELECT DISTINCT source FROM documents WHERE source <> 'src1')
       |SELECT kind, doc_id, chunk_idx, parent FROM (
       |  SELECT 'doc_no_library' AS kind, doc_id, CAST(-1 AS BIGINT) AS chunk_idx,
       |    source AS parent
       |  FROM documents WHERE source NOT IN (SELECT source FROM libs)
       |  UNION ALL
       |  SELECT 'chunk_no_document', doc_id, chunk_idx, CAST(doc_id AS VARCHAR)
       |  FROM chunks WHERE doc_id % 7 = 3
       |) ORDER BY kind, doc_id, chunk_idx""".stripMargin

  /** `crud_library_cascade`: delete libraries `src0` and `src3`; the
    * cascade drops their documents and those documents' chunks in the
    * same plan (reference main.py:130-141 loops; here two anti-joins
    * feed one aggregation). Output: surviving per-library doc/chunk
    * counts. */
  def crudLibraryCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deleted = Seq("src0", "src3")
    val surviving = Tables.documents(spark, dir)
      .filter(!$"source".isin(deleted: _*))
      .select($"doc_id", $"source")
    Collections.chunkDocuments(spark, dir)
      .join(surviving, Seq("doc_id"))
      .groupBy($"source".as("library_id"))
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_chunks"))
      .orderBy($"library_id")
  }

  val crudLibraryCascadeSql: String =
    s"""WITH chunks AS (${Collections.chunkDocumentsSql}),
       |surviving AS (
       |  SELECT doc_id, source FROM documents WHERE source NOT IN ('src0', 'src3')
       |)
       |SELECT s.source AS library_id,
       |  CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_chunks
       |FROM chunks c JOIN surviving s USING (doc_id)
       |GROUP BY s.source ORDER BY library_id""".stripMargin

  /** `crud_update_merge`: partial update with column-merge semantics.
    * The update batch carries a new `text` for `doc_id % 5 = 0` but
    * null `lang`/`source` — null means "not supplied", so the merge
    * keeps the stored values (reference collection.py:134-142 skips
    * None fields); `created_at` is preserved, `updated_at` bumps only
    * for updated rows. */
  def crudUpdateMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source",
        $"doc_id".as("created_at"), $"doc_id".as("updated_at"))
    val updates = Tables.documents(spark, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", concat($"text", lit(" v2")).as("u_text"),
        lit(null).cast("string").as("u_lang"), lit(null).cast("string").as("u_source"))
    base.join(updates, Seq("doc_id"), "left")
      .select($"doc_id",
        md5(coalesce($"u_text", $"text")).as("text_md5"),
        coalesce($"u_lang", $"lang").as("lang"),
        coalesce($"u_source", $"source").as("source"),
        $"created_at",
        when($"u_text".isNotNull, lit(1700000000L)).otherwise($"updated_at").as("updated_at"))
      .orderBy($"doc_id")
  }

  val crudUpdateMergeSql: String =
    """SELECT doc_id,
      |  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS text_md5,
      |  lang, source,
      |  doc_id AS created_at,
      |  CASE WHEN doc_id % 5 = 0 AND text IS NOT NULL
      |    THEN CAST(1700000000 AS BIGINT) ELSE doc_id END AS updated_at
      |FROM documents ORDER BY doc_id""".stripMargin

  /** `crud_upsert_embed`: embedding auto-generation on write. The
    * update batch changes content WITHOUT supplying an embedding, so
    * the write path re-embeds the new content; kept rows keep their
    * stored vectors (reference main.py:234-238 on create, 297-299 on
    * content update). Rows-only driver check (the embedder has no SQL
    * twin); `LibrariesSpec` asserts the updated rows' vectors equal a
    * fresh embed of the new content and kept rows' vectors are
    * untouched. */
  def crudUpsertEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // the "stored" state: every doc already embedded from its text
    val stored = docs.select($"doc_id", $"text",
      Embedder.embedText($"text").as("embedding"))
    // update batch: new content, embedding column absent → null
    val updates = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", upper($"text").as("u_text"))
    stored.join(updates, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"u_text".isNotNull, lit("updated")).otherwise(lit("kept")).as("op"),
        coalesce($"u_text", $"text").as("content"),
        // auto-embed fires only where content changed and no vector
        // was supplied; otherwise the stored vector is reused
        when($"u_text".isNotNull, Embedder.embedText($"u_text"))
          .otherwise($"embedding").as("embedding"))
      .select($"doc_id", $"op",
        Stab.e6(sqrt(dotProduct($"embedding", $"embedding"))).as("norm_e6"),
        Stab.e6(element_at($"embedding", 1).cast("double")).as("c0_e6"))
      .orderBy($"doc_id")
  }

  /** SQL-exact projection of [[crudUpsertEmbed]] for the driver
    * oracle: which rows re-embedded (`op` is derivable from the
    * update-batch predicate), the e6-exact unit norm every embedder
    * output must carry, and a bounded first component. The
    * value-level vector check (updated rows embed upper(text), kept
    * rows keep the stored vector) stays in LibrariesSpec. */
  def crudUpsertEmbedChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    crudUpsertEmbed(spark, dir)
      .select($"doc_id", $"op", $"norm_e6",
        $"c0_e6".between(-1000000L, 1000000L).as("c0_bounded"))
      .orderBy($"doc_id")
  }

  val crudUpsertEmbedCheckedSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 10 = 0 THEN 'updated' ELSE 'kept' END AS op,
      |  CAST(1000000 AS BIGINT) AS norm_e6, true AS c0_bounded
      |FROM documents ORDER BY doc_id""".stripMargin

  /** `sample_stratified`: deterministic per-group quota sampling —
    * the data-mixing primitive of a training pipeline (cap each
    * domain/source at N documents so no single source dominates the
    * mix). Rows are ranked within their source by a content hash (a
    * stable pseudo-random order both engines compute identically) and
    * the top `perSource` survive. Spark ≥3.5 executes the
    * row_number ≤ k window as a WindowGroupLimit: a per-partition
    * k-row heap before the single shuffle on the group key — one
    * scan, no global sort, at any scale. */
  def sampleStratified(spark: SparkSession, dir: String,
      perSource: Int = 10): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy(md5($"text"), $"doc_id")).cast("long"))
      .filter($"rn" <= perSource)
      .select($"doc_id", $"source", $"rn")
      .orderBy($"source", $"rn")
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, source, rn FROM (
      |  SELECT doc_id, source, CAST(row_number() OVER (
      |    PARTITION BY source ORDER BY md5(text), doc_id) AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn <= 10
      |ORDER BY source, rn""".stripMargin

  /** `sample_weighted`: weighted data-mixing sampler — the
    * [[sampleStratified]] quota made per-source PROPORTIONAL (mixing
    * weights: upsample src0 4×, src1 2×, rest 1×), the knob a real
    * pretraining mix turns (domain weights, not flat caps). Rows rank
    * within their source by content hash (stable pseudo-random, both
    * engines identical); the CONSTANT cut `rn <= baseQuota·maxWeight`
    * runs first so Spark still pushes a WindowGroupLimit (a bounded
    * per-partition heap, no full sort at any scale), then the
    * per-source quota trims inside that bound. */
  def sampleWeighted(spark: SparkSession, dir: String,
      baseQuota: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val weight = when($"source" === "src0", 4L)
      .when($"source" === "src1", 2L).otherwise(1L)
    val maxWeight = 4
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy(md5($"text"), $"doc_id")).cast("long"))
      .filter($"rn" <= baseQuota * maxWeight) // constant → WindowGroupLimit
      .withColumn("quota", lit(baseQuota.toLong) * weight)
      .filter($"rn" <= $"quota")
      .select($"doc_id", $"source", $"rn", $"quota")
      .orderBy($"source", $"rn")
  }

  val sampleWeightedSql: String =
    """SELECT doc_id, source, rn, quota FROM (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5(text), doc_id) AS BIGINT) AS rn,
      |    CAST(5 * (CASE WHEN source = 'src0' THEN 4
      |              WHEN source = 'src1' THEN 2 ELSE 1 END) AS BIGINT) AS quota
      |  FROM documents) t
      |WHERE rn <= quota
      |ORDER BY source, rn""".stripMargin

  /** `sample_reservoir`: weighted sampling WITHOUT replacement via
    * the exponential-keys method (Efraimidis–Spirakis A-ES,
    * doi:10.1016/j.ipl.2005.11.003): each doc draws a deterministic
    * uniform u from its md5 hash and ranks by `ln(u)/w` (equivalent
    * to u^(1/w)); the global top-k under that key IS a weighted
    * sample without replacement — the distributed-sampling primitive
    * a mixture executor uses to materialize `sample_weighted`-style
    * plans when weights are per-DOCUMENT (here w = n_chars), not
    * per-source quotas. One scan, keys map-side, the cut is a
    * deterministic `orderBy·limit` (TakeOrderedAndProject: per-
    * partition k-row heaps + one k-row driver merge — no global sort
    * at 100 TB); ties break on doc_id. u > 0 by construction
    * ((hash60+1)/2^60 ∈ (0, 1]), w ≥ 1 by the greatest() guard. */
  def sampleReservoir(spark: SparkSession, dir: String,
      k: Int = 100): DataFrame = {
    import spark.implicits._
    val h = graft.text.TextOps.hash60(concat(lit("rsv:"), $"doc_id".cast("string")))
    val u = (h.cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val w = greatest($"n_chars", lit(1L)).cast("double")
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars", Stab.e6(log(u) / w).as("key_e6"))
      .orderBy($"key_e6".desc, $"doc_id".asc)
      .limit(k)
  }

  val sampleReservoirSql: String = {
    val h = graft.text.TextOps.hash60Sql("'rsv:' || CAST(doc_id AS VARCHAR)")
    val u = s"(CAST($h AS DOUBLE) + 1.0) / 1152921504606846976.0"
    val key = s"ln($u) / CAST(greatest(n_chars, 1) AS DOUBLE)"
    s"""SELECT doc_id, n_chars, ${Stab.sqlE6(key)} AS key_e6
       |FROM documents
       |ORDER BY key_e6 DESC, doc_id ASC
       |LIMIT 100""".stripMargin
  }

  /** `pack_token_budget`: greedy sequence packing — assign each
    * document (in deterministic order within its source) to the
    * training bin where its tokens land under a fixed per-bin budget,
    * approximated as `bin = floor(running_token_count / budget)`.
    * This is the pretraining data-prep step that turns a document
    * pile into ~context-length batches; one window cumsum per source,
    * no shuffle beyond the group-key partitioning. */
  def packTokenBudget(spark: SparkSession, dir: String,
      budget: Long = 2000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // floor + clamp: integer-division truncation rounds toward zero but
    // floor rounds toward -inf, so a zero-token head document
    // (cum_tokens = 0) would land in bin 0 here and bin -1 in the
    // DuckDB twin; clamping at 0 makes both engines agree and keeps
    // empty head documents in the first bin.
    toks
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin", greatest(lit(0L),
        floor(($"cum_tokens" - lit(1)) / lit(budget.toDouble)).cast("long")))
      .select($"doc_id", $"source", $"n_tokens", $"cum_tokens", $"bin")
      .orderBy($"source", $"doc_id")
  }

  val packTokenBudgetSql: String =
    s"""SELECT doc_id, source, n_tokens, cum_tokens,
       |  greatest(CAST(0 AS BIGINT), CAST(floor((cum_tokens - 1) / 2000.0) AS BIGINT)) AS bin
       |FROM (
       |  SELECT doc_id, source,
       |    CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT) AS n_tokens,
       |    CAST(sum(len(${graft.text.TextOps.tokensSql})) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM documents) t
       |ORDER BY source, doc_id""".stripMargin

  /** `sample_temperature`: temperature-scaled language sampling — the
    * multilingual mixing rule (q_l ∝ p_l^α with α = 0.5) that
    * upsamples low-resource languages relative to their natural token
    * share, under a total token budget of half the corpus. Per
    * document: its language's sampling rate and a deterministic keep
    * decision (content-hash threshold — a seedless Bernoulli both
    * engines compute identically).
    *
    * Cross-engine determinism: the per-language token shares are
    * exact longs; q = √p is e6-stabilized per LANGUAGE (sqrt is
    * correctly rounded in IEEE, identical in both engines); the
    * normalizer Σ q_e6 is an INTEGER sum (order-free); each rate is
    * then ONE double division of long products, e6-stabilized. No
    * float aggregation anywhere.
    *
    * Scale shape: one corpus scan for token counts (checkpointed),
    * a language-keyed partial aggregation (|langs| rows), and a
    * broadcast join of the tiny rate table back onto the corpus —
    * the keep decision is map-side. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"),
        pmod(graft.text.TextOps.hash60($"text"), lit(1000000L)).as("u"))
      .localCheckpoint(true)
    val perLang = toks.groupBy($"lang").agg(sum($"n_tokens").as("t_lang"))
    val total = perLang.agg(sum($"t_lang").as("t_total"))
    val q = perLang.crossJoin(broadcast(total))
      .select($"lang", $"t_lang",
        Stab.e6(sqrt($"t_lang".cast("double") / $"t_total")).as("q_e6"))
    val denom = q.agg(sum($"q_e6").as("q_denom"))
    val rates = q.crossJoin(broadcast(denom))
      .crossJoin(broadcast(total))
      .select($"lang", $"t_lang",
        Stab.e6(least(lit(1.0),
          (floor($"t_total" / 2).cast("double") * $"q_e6") /
            ($"q_denom".cast("double") * $"t_lang"))).as("rate_e6"))
    toks.join(broadcast(rates), Seq("lang"))
      .select($"doc_id", $"lang", $"n_tokens", $"rate_e6",
        ($"u" < $"rate_e6").as("keep"))
      .orderBy($"doc_id")
  }

  val sampleTemperatureSql: String = {
    val toksLen = s"CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT)"
    s"""WITH toks AS (
       |  SELECT doc_id, lang, $toksLen AS n_tokens,
       |    ${graft.text.TextOps.hash60Sql("text")} % 1000000 AS u
       |  FROM documents
       |), perlang AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t_lang FROM toks GROUP BY lang),
       |tot AS (SELECT CAST(sum(t_lang) AS BIGINT) AS t_total FROM perlang),
       |q AS (
       |  SELECT lang, t_lang,
       |    ${Stab.sqlE6("sqrt(CAST(t_lang AS DOUBLE) / t_total)")} AS q_e6
       |  FROM perlang CROSS JOIN tot
       |), den AS (SELECT CAST(sum(q_e6) AS BIGINT) AS q_denom FROM q),
       |rates AS (
       |  SELECT lang, t_lang,
       |    ${Stab.sqlE6("least(1.0, (CAST(t_total // 2 AS DOUBLE) * q_e6) / (CAST(q_denom AS DOUBLE) * t_lang))")} AS rate_e6
       |  FROM q CROSS JOIN den CROSS JOIN tot
       |)
       |SELECT t.doc_id, t.lang, t.n_tokens, r.rate_e6, t.u < r.rate_e6 AS keep
       |FROM toks t JOIN rates r USING (lang)
       |ORDER BY t.doc_id""".stripMargin
  }

  /** `pack_shards`: GLOBAL greedy sequence packing — one shard
    * sequence over the whole corpus in doc_id order, not per-source
    * ([[packTokenBudget]]'s per-source window is the right tool for
    * source-stratified batches, but its window puts each source's
    * entire run in ONE task; a global cumsum through a plain window
    * would be worse still — an empty partition spec funnels the whole
    * corpus through one task).
    *
    * Scale shape — the textbook two-pass distributed prefix sum:
    *  1. range-partition by doc_id, sort within partitions, pin the
    *     partition ids (localCheckpoint — both passes must see the
    *     same boundaries);
    *  2. per-partition token subtotals: ONE row per partition,
    *     collected to the driver (bounded by partition count, the
    *     same ≤k-rows gather the IVF centroid collect does) and
    *     turned into running offsets;
    *  3. partition-LOCAL cumsum (window partitioned by pid — as many
    *     window groups as partitions, full parallelism) plus the
    *     broadcast offset.
    * The result is identical to a single global window cumsum —
    * prefix sums over a total order don't depend on where partition
    * boundaries fall — so the DuckDB oracle is the plain global
    * window, while the Spark plan never concentrates the corpus in
    * one task. (The plan carries one hash Exchange on pid before the
    * window: Spark cannot see the pinned range partitioning through
    * the checkpoint boundary, so rows re-co-locate once — a fully
    * parallel shuffle, as many window groups as partitions, which is
    * the point.) */
  def packShards(spark: SparkSession, dir: String,
      budget: Long = 2000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = Tables.documents(spark, dir)
      .select($"doc_id",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .repartitionByRange(parts, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val psums = ranged.groupBy($"pid").agg(sum($"n_tokens").as("psum"))
      .orderBy($"pid").collect()
    var acc = 0L
    val offsets = psums.toSeq.map { r =>
      val o = (r.getAs[Int]("pid"), acc); acc += r.getAs[Long]("psum"); o
    }
    val offDf = offsets.toDF("pid", "offset")
    val w = Window.partitionBy($"pid").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), Seq("pid"))
      .withColumn("cum_tokens", $"offset" + sum($"n_tokens").over(w))
      // same floor+clamp convention as packTokenBudget (zero-token
      // head documents land in shard 0 in both engines)
      .withColumn("shard", greatest(lit(0L),
        floor(($"cum_tokens" - lit(1)) / lit(budget.toDouble)).cast("long")))
      .select($"doc_id", $"n_tokens", $"cum_tokens", $"shard")
      .orderBy($"doc_id")
  }

  val packShardsSql: String =
    s"""SELECT doc_id, n_tokens, cum_tokens,
       |  greatest(CAST(0 AS BIGINT), CAST(floor((cum_tokens - 1) / 2000.0) AS BIGINT)) AS shard
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT) AS n_tokens,
       |    CAST(sum(len(${graft.text.TextOps.tokensSql})) OVER (
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin

  /** `curriculum_order`: the training-data ORDERING step — length-
    * based curriculum (shortest documents first, the classic
    * easy→hard proxy) with per-bucket SOURCE interleaving so
    * consecutive examples rotate across sources (batch diversity —
    * a run of same-source examples biases each optimizer step).
    * The training order is the lexicographic key (bucket, rr, source,
    * doc_id), and the op EMITS the key rather than a global sequence
    * number:
    *  - `bucket` = n_tokens div 16 — exact integer equal-width
    *    difficulty bands, map-side, no global statistic;
    *  - `rr` = the doc's round-robin round within (bucket, source) —
    *    a PARTITIONED window; at position (bucket, rr) every source
    *    still holding docs contributes exactly one before any source
    *    contributes its (rr+1)-th.
    * Emitting the key instead of a dense global rank is deliberate
    * 100 TB shape: a global row_number is a single-task window, and
    * a consumer sorts/ranges on the key anyway (the pack_shards
    * prefix-sum exists where a dense global number is truly needed).
    * One scan, one partitioned window, |corpus| rows out. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("n_tokens div 16"))
    t.withColumn("rr", row_number().over(
        Window.partitionBy($"bucket", $"source").orderBy($"doc_id")).cast("long"))
      .select($"doc_id", $"source", $"n_tokens", $"bucket", $"rr")
      .orderBy($"bucket", $"rr", $"source", $"doc_id")
  }

  val curriculumOrderSql: String =
    s"""SELECT doc_id, source, n_tokens,
       |  CAST(n_tokens // 16 AS BIGINT) AS bucket,
       |  CAST(row_number() OVER (
       |    PARTITION BY n_tokens // 16, source ORDER BY doc_id) AS BIGINT) AS rr
       |FROM (
       |  SELECT doc_id, source,
       |    CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT) AS n_tokens
       |  FROM documents) t
       |ORDER BY bucket, rr, source, doc_id""".stripMargin

  /** `export_manifest`: the training-data EXPORT step — actually
    * WRITE the packed shards (parquet `partitionBy(shard)`, the
    * layout a trainer's data loader consumes) and serve the manifest
    * recomputed FROM THE WRITTEN FILES: per shard the doc count,
    * token sum, id range, and an order-independent content
    * fingerprint (`bit_xor` of each doc's 60-bit text hash — XOR
    * never overflows and commutes, so shard-internal file order
    * can't move it). The oracle recomputes the same manifest from
    * the SOURCE table + the shard assignment, so a hash match
    * certifies the written shards carry exactly the right rows with
    * exactly the right text — a dropped row, duplicated task output,
    * or corrupted string anywhere in the write path flips it. The
    * write is a one-shuffle job (doc-keyed join of docs with their
    * assignment, then the partitioned sink); the manifest aggregation
    * reads back only (shard, n_tokens, doc_id, text-hash) columns.
    *
    * Shard-count note for scale: shards = ⌈corpus tokens / budget⌉,
    * and each shard is an output DIRECTORY — the test budget (2000
    * tokens, matching pack_shards' oracle) deliberately produces
    * many tiny shards; a 100 TB export sets budget to a real shard
    * size (≳1e9 tokens ≈ a few GB) so the directory count stays in
    * the thousands. The measured sf0.1→sf1 slope (3.8→27.6 s, 7.4×
    * for 10× docs) is exactly this small-files channel, not the
    * write volume. */
  def exportManifest(spark: SparkSession, dir: String,
      budget: Long = 2000L): DataFrame = {
    import spark.implicits._
    val assign = packShards(spark, dir, budget)
      .select($"doc_id", $"n_tokens", $"shard")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source")
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    docs.join(assign, Seq("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val manifest = spark.read.parquet(out)
      .select($"shard".cast("long").as("shard"), $"n_tokens", $"doc_id",
        graft.text.TextOps.hash60($"text").as("h"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"),
        expr("bit_xor(h)").as("fp60"))
      .orderBy($"shard")
    // materialize before the export dir is reclaimed (the frame is
    // lazy; deleting first would yank the files out from under it)
    val pinned = manifest.localCheckpoint(true)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    pinned
  }

  val exportManifestSql: String = {
    val inner =
      s"""SELECT doc_id,
         |    CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(${graft.text.TextOps.tokensSql})) OVER (
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM documents""".stripMargin
    s"""WITH a AS (
       |  SELECT doc_id, n_tokens,
       |    greatest(CAST(0 AS BIGINT), CAST(floor((cum_tokens - 1) / 2000.0) AS BIGINT)) AS shard
       |  FROM ($inner) t)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(d.doc_id) AS min_doc_id, max(d.doc_id) AS max_doc_id,
       |  CAST(bit_xor(${graft.text.TextOps.hash60Sql("text")}) AS BIGINT) AS fp60
       |FROM documents d JOIN a ON d.doc_id = a.doc_id
       |GROUP BY shard
       |ORDER BY shard""".stripMargin
  }

  /** `meta_filter`: the reference's per-record `metadata` map
    * (datarecord.py:17) as a native `map<string,string>` column,
    * filtered and projected via `element_at`. The oracle states the
    * same predicate over the flat columns, so the hash check proves
    * the map round-trips values exactly. */
  def metaFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withMeta = Tables.documents(spark, dir)
      .select($"doc_id", map(
        lit("lang"), $"lang",
        lit("source"), $"source",
        lit("n_chars"), $"n_chars".cast("string")).as("metadata"))
    withMeta
      .filter(element_at($"metadata", "lang") === "en" &&
        element_at($"metadata", "n_chars").cast("long") > 300)
      .select($"doc_id",
        element_at($"metadata", "source").as("meta_source"),
        element_at($"metadata", "n_chars").cast("long").as("meta_n_chars"))
      .orderBy($"doc_id")
  }

  val metaFilterSql: String =
    """SELECT doc_id, source AS meta_source, n_chars AS meta_n_chars
      |FROM documents WHERE lang = 'en' AND n_chars > 300
      |ORDER BY doc_id""".stripMargin

  /** `mixture_plan`: the data-mixture PLANNING report — per source:
    * its natural token share, the target share (uniform across
    * sources here; any broadcast target table slots in), the
    * upsampling factor target/actual, the epoch count an epoch-based
    * schedule needs (⌈factor⌉ passes over the source), and the
    * planned token contribution. This is the table a pretraining run
    * is configured FROM (LLaMA-style mixtures repeat small
    * high-quality sources several epochs while big crawls run < 1);
    * [[sampleTemperature]] then EXECUTES a per-record keep decision —
    * this op does the corpus-level arithmetic that precedes it.
    *
    * Cross-engine determinism: everything after the token count is
    * integer — shares and factors are e6 floor-divisions of long
    * products (`div`, never long/long through DOUBLE), the epoch
    * ceiling is (x + 999999) div 1e6. No float anywhere.
    *
    * Scale shape: one corpus scan, ONE partial-agged shuffle onto
    * source cardinality, the two-row totals broadcast back — output
    * is |sources| rows regardless of corpus size. */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .select($"source",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"source")
      .agg(count(lit(1)).as("docs"), sum($"n_tokens").as("src_tokens"))
    val tot = per.agg(sum($"src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_e6",
        expr("src_tokens * 1000000L div total_tokens"))
      .withColumn("target_share_e6", expr("1000000L div n_sources"))
      .withColumn("upsample_e6",
        expr("target_share_e6 * 1000000L div greatest(share_e6, 1L)"))
      .withColumn("epochs", expr("(upsample_e6 + 999999L) div 1000000L"))
      .withColumn("planned_tokens",
        expr("src_tokens * upsample_e6 div 1000000L"))
      .select($"source", $"docs", $"src_tokens", $"share_e6",
        $"target_share_e6", $"upsample_e6", $"epochs", $"planned_tokens")
      .orderBy($"source")
  }

  val mixturePlanSql: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS docs,
       |    CAST(sum(CAST(len(${graft.text.TextOps.tokensSql}) AS BIGINT)) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
       |    count(*) AS n_sources FROM per
       |), shares AS (
       |  SELECT source, docs, src_tokens,
       |    src_tokens * 1000000 // total_tokens AS share_e6,
       |    1000000 // n_sources AS target_share_e6
       |  FROM per CROSS JOIN tot
       |)
       |SELECT source, docs, src_tokens, share_e6, target_share_e6,
       |  target_share_e6 * 1000000 // greatest(share_e6, 1) AS upsample_e6,
       |  (target_share_e6 * 1000000 // greatest(share_e6, 1) + 999999) // 1000000 AS epochs,
       |  src_tokens * (target_share_e6 * 1000000 // greatest(share_e6, 1)) // 1000000 AS planned_tokens
       |FROM shares
       |ORDER BY source""".stripMargin

  /** `mixture_anneal`: the ANNEALING-phase mixture — the end-of-run
    * recipe that upweights high-quality sources for the final
    * training stretch (the Llama-3-style anneal; [[mixturePlan]] is
    * the base-phase table this composes with). Quality weight = the
    * per-source mean distinct-token ratio (a fully SQL-exact quality
    * signal — the trained classifier's margin would slot into the
    * same column but its scores are golden-pinned, not
    * oracle-recomputable corpus-wide), annealed share ∝ tokens ×
    * quality, boost = anneal/natural. All integer: per-doc ratios
    * e6-stabilize map-side, the source mean is a truncating integer
    * division, and every share cross-multiplies in
    * decimal(38,0)/HUGEINT (tokens×quality×1e6 passes 2⁶³ at real
    * corpus sizes). Same scale shape as mixturePlan: one scan, one
    * partial-agged shuffle onto source cardinality, totals broadcast
    * back, |sources| output rows. */
  def mixtureAnneal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = graft.text.TextOps.tokens($"text")
    val per = Tables.documents(spark, dir)
      .select($"source", w.as("w"))
      .select($"source", size($"w").cast("long").as("n_tokens"),
        size(array_distinct($"w")).cast("long").as("n_distinct"))
      .select($"source", $"n_tokens",
        Stab.e6(when($"n_tokens" > 0,
          $"n_distinct".cast("double") / $"n_tokens").otherwise(0.0))
          .as("dr_e6"))
    val src = per.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens"),
        expr("sum(dr_e6) div count(1)").as("qual_e6"))
    val tot = src.agg(sum($"tokens").as("total_tokens"),
      sum(expr("cast(tokens as decimal(38,0)) * qual_e6")).as("total_w"))
    src.crossJoin(broadcast(tot))
      .select($"source", $"n_docs", $"tokens", $"qual_e6",
        expr("cast(cast(tokens as decimal(38,0)) * 1000000 div total_tokens as long)")
          .as("natural_share_e6"),
        expr("cast(cast(tokens as decimal(38,0)) * qual_e6 * 1000000 div total_w as long)")
          .as("anneal_share_e6"))
      .select($"source", $"n_docs", $"tokens", $"qual_e6",
        $"natural_share_e6", $"anneal_share_e6",
        when($"natural_share_e6" > 0,
          expr("cast(cast(anneal_share_e6 as decimal(38,0)) * 1000000 div natural_share_e6 as long)"))
          .otherwise(0L).as("boost_e6"))
      .orderBy($"source")
  }

  val mixtureAnnealSql: String =
    s"""WITH per AS (
       |  SELECT source, CAST(len(w) AS BIGINT) AS n_tokens,
       |    ${Stab.sqlE6("CASE WHEN len(w) > 0 THEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w) ELSE 0.0 END")} AS dr_e6
       |  FROM (SELECT source, ${graft.text.TextOps.tokensSql} AS w FROM documents)
       |), src AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |    CAST(sum(dr_e6) AS BIGINT) // count(*) AS qual_e6
       |  FROM per GROUP BY source
       |), tot AS (
       |  SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
       |    sum(CAST(tokens AS HUGEINT) * qual_e6) AS total_w FROM src
       |), shares AS (
       |  SELECT source, n_docs, tokens, qual_e6,
       |    CAST(CAST(tokens AS HUGEINT) * 1000000 // total_tokens AS BIGINT) AS natural_share_e6,
       |    CAST(CAST(tokens AS HUGEINT) * qual_e6 * 1000000 // total_w AS BIGINT) AS anneal_share_e6
       |  FROM src CROSS JOIN tot)
       |SELECT source, n_docs, tokens, qual_e6, natural_share_e6,
       |  anneal_share_e6,
       |  CASE WHEN natural_share_e6 > 0
       |    THEN CAST(CAST(anneal_share_e6 AS HUGEINT) * 1000000 // natural_share_e6 AS BIGINT)
       |    ELSE 0 END AS boost_e6
       |FROM shares
       |ORDER BY source""".stripMargin
}
