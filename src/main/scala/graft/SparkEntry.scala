package graft

import graft.core.Stab
import graft.dedup.Dedup
import graft.embed.Embedder
import graft.functions.vectors
import graft.index.{IvfIndex, LshIndex, NswIndex}
import graft.operators._
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; every implemented operator has a `queries` entry and,
  * where DuckDB can express it, an `oracleSql` entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / analytics core
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join" -> (Relational.q3Join _),
    "q5_join" -> (Relational.q5Join _),
    "window_topk" -> (Relational.windowTopK _),
    "events_window_agg" -> (Relational.eventsWindowAgg _),
    "events_sessionize" -> (Relational.eventsSessionize _),
    // brute-force kNN family
    "knn_brute_cosine" -> (KnnSearch.bruteCosine _),
    "knn_brute_dot" -> (KnnSearch.bruteDot _),
    "knn_brute_l2" -> (KnnSearch.bruteL2 _),
    "knn_join_exact" -> (KnnSearch.knnJoinExact _),
    // dedup family
    "dedup_exact" -> (Dedup.exact _),
    "dedup_minhash" -> (Dedup.minhash _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_embedding" -> (Dedup.embeddingNearDup _),
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => Dedup.embeddingNearDupLsh(s, d)),
    "dedup_components" -> ((s: SparkSession, d: String) => Dedup.components(s, d)),
    "dedup_substring" -> ((s: SparkSession, d: String) => Dedup.substringSpans(s, d)),
    "contamination_check" -> (Dedup.contamination _),
    // text analysis family
    "text_tokens" -> (TextOps.textTokens _),
    "text_quality" -> (TextOps.textQuality _),
    "text_lang_id" -> (TextOps.textLangId _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    // collections / data model (reference CRUD surface)
    "chunk_documents" -> (Collections.chunkDocuments _),
    "crud_upsert" -> (Collections.crudUpsert _),
    "crud_delete_cascade" -> (Collections.crudDeleteCascade _),
    "crud_read" -> (Collections.crudRead _),
    "crud_list" -> (Collections.crudList _),
    "crud_reset" -> (Collections.crudReset _),
    // /query e2e runs through the checked single-text-query view (the
    // brute path — same embedder, corpus, top-k, tie-break as
    // queryE2E, which LibrariesSpec holds to id-level parity)
    "query_e2e" -> ((s: SparkSession, d: String) => Collections.queryTextChecked(s, d, "cosine")),
    "query_index_cosine" -> ((s: SparkSession, d: String) => Collections.queryWithIndex(s, d, "cosine")),
    // ANN /query variants run through the invariant-checked view: the
    // hit SET can't hash-match SQL, but the /query contract (k ranked
    // hits, corpus ids, correct content join, bounded scores) can —
    // recall quality is the ScalaTest bars' job
    "query_index_ivf" -> ((s: SparkSession, d: String) => Collections.queryIndexChecked(s, d, "ivf")),
    "query_index_nsw" -> ((s: SparkSession, d: String) => Collections.queryIndexChecked(s, d, "nsw")),
    // TEXT /query variants also run through invariant-checked views
    // (contract grid is SQL-exact even though the ANN hit set isn't)
    "query_text_ivf" -> ((s: SparkSession, d: String) => Collections.queryTextChecked(s, d, "ivf")),
    "query_text_nsw" -> ((s: SparkSession, d: String) => Collections.queryTextChecked(s, d, "nsw")),
    "query_text_chunks" -> ((s: SparkSession, d: String) => Collections.queryTextChunksChecked(s, d)),
    "mm_features" -> (Media.mmFeatures _),
    "mm_features_golden" -> (Media.mmFeaturesGolden _),
    "mm_frame_sample" -> (Media.mmFrameSample _),
    "embed_text" -> (embedText _),
    // libraries level + write-path invariants
    "crud_library" -> (Libraries.crudLibrary _),
    "crud_integrity" -> (Libraries.crudIntegrity _),
    "crud_library_cascade" -> (Libraries.crudLibraryCascade _),
    "crud_update_merge" -> (Libraries.crudUpdateMerge _),
    "crud_upsert_embed" -> (Libraries.crudUpsertEmbedChecked _),
    "meta_filter" -> (Libraries.metaFilter _),
    "sample_stratified" -> ((s: SparkSession, d: String) => Libraries.sampleStratified(s, d)),
    "pack_token_budget" -> ((s: SparkSession, d: String) => Libraries.packTokenBudget(s, d)),
    // ANN index family
    "ivf_build" -> (IvfIndex.ivfBuild _),
    "ivf_search" -> (IvfIndex.ivfSearch _),
    // incremental maintenance: delta add/remove against a built index
    // without a KMeans refit / graph rebuild (invariant-checked grids)
    "ivf_add_delta" -> (IvfIndex.ivfAddDelta _),
    "nsw_add_delta" -> (NswIndex.nswAddDelta _),
    "ann_lsh_bucketed" -> (LshIndex.annLshBucketed _),
    "nsw_build" -> (NswIndex.nswBuild _),
    "nsw_build_lsh" -> (NswIndex.nswBuildLsh _),
    "nsw_search" -> (NswIndex.nswSearch _),
    // composite cleaning pipeline
    "pipeline_clean" -> (Collections.pipelineClean _),
  )

  /** `embed_text`: embedder contract per doc — dimension, e6-exact
    * unit norm, and a bounded first component. DuckDB cannot compute
    * the embedder, but it CAN assert this whole projection (dim and
    * norm are constants of the contract, the component bound is a
    * flag), so the entry is fully SQL-oracled; value-level embedder
    * determinism is PropertySpec's job. */
  private def embedText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select($"doc_id", Embedder.embedText($"text").as("emb"))
      .select($"doc_id",
        size($"emb").cast("long").as("dim"),
        Stab.e6(sqrt(vectors.dotProduct($"emb", $"emb"))).as("norm_e6"),
        Stab.e6(element_at($"emb", 1).cast("double"))
          .between(-1000000L, 1000000L).as("c0_bounded"))
      .orderBy($"doc_id")
  }

  private val embedTextSql: String =
    """SELECT doc_id, CAST(64 AS BIGINT) AS dim,
      |  CAST(1000000 AS BIGINT) AS norm_e6, true AS c0_bounded
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB-runnable ANSI SQL twin for each oracle-checkable query. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q5_join" -> Relational.q5JoinSql,
    "window_topk" -> Relational.windowTopKSql,
    "events_window_agg" -> Relational.eventsWindowAggSql,
    "events_sessionize" -> Relational.eventsSessionizeSql,
    "knn_brute_cosine" -> KnnSearch.bruteCosineSql,
    "knn_brute_dot" -> KnnSearch.bruteDotSql,
    "knn_brute_l2" -> KnnSearch.bruteL2Sql,
    "knn_join_exact" -> KnnSearch.knnJoinExactSql,
    "dedup_exact" -> Dedup.exactSql,
    "dedup_minhash" -> Dedup.minhashSql,
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_embedding" -> Dedup.embeddingNearDupSql,
    "dedup_components" -> Dedup.componentsSql,
    "dedup_substring" -> Dedup.substringSpansSql,
    "contamination_check" -> Dedup.contaminationSql,
    "text_tokens" -> TextOps.textTokensSql,
    "text_quality" -> TextOps.textQualitySql,
    "text_lang_id" -> TextOps.textLangIdSql,
    "text_fingerprint" -> TextOps.textFingerprintSql,
    "chunk_documents" -> Collections.chunkDocumentsSql,
    "crud_upsert" -> Collections.crudUpsertSql,
    "crud_delete_cascade" -> Collections.crudDeleteCascadeSql,
    "crud_read" -> Collections.crudReadSql,
    "crud_list" -> Collections.crudListSql,
    "crud_reset" -> Collections.crudResetSql,
    "query_index_cosine" -> Collections.queryIndexCosineSql,
    "query_index_ivf" -> Collections.queryIndexCheckedSql,
    "query_index_nsw" -> Collections.queryIndexCheckedSql,
    "query_text_ivf" -> Collections.queryTextCheckedSql,
    "query_text_nsw" -> Collections.queryTextCheckedSql,
    "query_text_chunks" -> Collections.queryTextCheckedSql,
    "query_e2e" -> Collections.queryTextCheckedSql,
    "embed_text" -> embedTextSql,
    "crud_upsert_embed" -> Libraries.crudUpsertEmbedCheckedSql,
    "mm_features_golden" -> Media.mmFeaturesGoldenSql,
    "crud_library" -> Libraries.crudLibrarySql,
    "crud_integrity" -> Libraries.crudIntegritySql,
    "crud_library_cascade" -> Libraries.crudLibraryCascadeSql,
    "crud_update_merge" -> Libraries.crudUpdateMergeSql,
    "meta_filter" -> Libraries.metaFilterSql,
    "sample_stratified" -> Libraries.sampleStratifiedSql,
    "pack_token_budget" -> Libraries.packTokenBudgetSql,
    "nsw_build" -> NswIndex.nswBuildSql,
    "ivf_add_delta" -> IvfIndex.ivfAddDeltaSql,
    "nsw_add_delta" -> NswIndex.nswAddDeltaSql,
    "pipeline_clean" -> Collections.pipelineCleanSql(
      TextOps.textQualitySql, Dedup.minhashSql),
  )
}
