package graft

import graft.core.Stab
import graft.dedup.Dedup
import graft.embed.Embedder
import graft.functions.vectors
import graft.index.{BqIndex, IvfIndex, LshIndex, NswIndex, SqIndex}
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
    // dual-role dim join (nation enters twice) + fact-fact shuffle
    "q7_join" -> (Relational.q7Join _),
    "q8_mktshare" -> (Relational.q8Mktshare _),
    "q10_returns" -> (Relational.q10Returns _),
    // outer-join order-count distribution (zero bucket preserved)
    "q13_custdist" -> (Relational.q13Custdist _),
    // HAVING-filtered volume rollup joined back to its dimensions
    "q18_bigorders" -> (Relational.q18Bigorders _),
    // EXISTS → left-semi (q4); NOT EXISTS + integer scalar threshold (q22)
    "q4_priority" -> (Relational.q4Priority _),
    "q22_dormant" -> (Relational.q22Dormant _),
    // conditional-share by month (q14), scalar-max subquery (q15),
    // correlated per-part avg threshold (q17), disjunctive join (q19)
    "q14_promo" -> (Relational.q14Promo _),
    "q15_topsupplier" -> (Relational.q15TopSupplier _),
    "q17_smallqty" -> (Relational.q17SmallQty _),
    "q19_disjunct" -> (Relational.q19Disjunct _),
    // the remaining TPC-H shapes, schema-adapted (TpchExtra): star
    // profit rollup (q9), global-scalar HAVING (q11), count-distinct
    // + NOT-IN (q16), semi+anti self-join (q21), correlated argmin
    // (q2), nested dominance rollup (q20)
    "q9_profit" -> (TpchExtra.q9Profit _),
    "q11_important" -> (TpchExtra.q11Important _),
    "q16_suppcnt" -> (TpchExtra.q16SuppCnt _),
    "q21_waiting" -> (TpchExtra.q21Waiting _),
    "q2_mincost" -> (TpchExtra.q2MinCost _),
    "q20_excess" -> (TpchExtra.q20Excess _),
    // fact⋈fact date-span filter + CASE priority split (the last shape)
    "q12_shipmode" -> (TpchExtra.q12Shipmode _),
    // TPC-H Q6-style scan-pushdown revenue filter (no join, no keys)
    "q6_filter" -> (Relational.q6Filter _),
    "window_topk" -> (Relational.windowTopK _),
    "events_window_agg" -> (Relational.eventsWindowAgg _),
    "events_sessionize" -> (Relational.eventsSessionize _),
    // ordered-sequence funnel + HLL sketch with in-plan error attestation
    "events_funnel" -> (Relational.eventsFunnel _),
    "events_approx_users" -> (Relational.eventsApproxUsers _),
    "events_retention" -> (Relational.eventsRetention _),
    // as-of join: purchase ← most recent at-or-prior view per user
    "events_asof" -> (Relational.eventsAsof _),
    // interval-join attribution (batch twin of streaming.AttributionStream)
    "events_attribution" -> (graft.streaming.AttributionStream.eventsAttribution _),
    // daily-volume z-score outliers from integer aggregates
    "events_anomaly" -> (Relational.eventsAnomaly _),
    // salted-join skew rewrite certified as an identity by the oracle
    "join_salted" -> (SkewJoin.joinSalted _),
    // RANGE-frame 7-day moving volume; ROLLUP grouping sets; PIVOT
    "events_rolling" -> (AnalyticsExtra.eventsRolling _),
    "q1_rollup" -> (AnalyticsExtra.q1Rollup _),
    "pivot_lang" -> (AnalyticsExtra.pivotLang _),
    // one-pass Pearson moments over per-doc integer features
    "stats_corr" -> (AnalyticsExtra.statsCorr _),
    // fixed-width length histogram with cumulative shares
    "doc_len_hist" -> (AnalyticsExtra.docLenHist _),
    // rolling distinct users via dedup-then-scatter (no window distinct)
    "events_dau_wau" -> (AnalyticsExtra.eventsDauWau _),
    // dataset-card composition: source × lang token volumes + shares
    "corpus_mix" -> (AnalyticsExtra.corpusMix _),
    // first-order Markov journey matrix (all observed next-steps)
    "events_transitions" -> (AnalyticsExtra.eventsTransitions _),
    // per-doc top-3 TF-IDF keywords (integer score contract)
    "text_keywords" -> (AnalyticsExtra.textKeywords _),
    // per-language token-length distribution, exact + sketch-attested
    "quality_quantiles" -> (TextOps.qualityQuantiles _),
    // brute-force kNN family
    "knn_brute_cosine" -> (KnnSearch.bruteCosine _),
    "knn_brute_dot" -> (KnnSearch.bruteDot _),
    "knn_brute_l2" -> (KnnSearch.bruteL2 _),
    "knn_join_exact" -> (KnnSearch.knnJoinExact _),
    // the scale path for the same question: IVF-probed approximate
    // all-pairs top-k (invariant grid; recall bar in RetrievalOpsSpec)
    "knn_join_ivf" -> (IvfIndex.knnJoinIvfChecked _),
    // the compressed batch twin: SDC pre-rank over the code sidecar
    // (no full-width floats on the co-location exchange, no driver
    // LUT state) + exact rerank of the shortlist (same grid oracle)
    "knn_join_pq" -> ((s: SparkSession, d: String) => IvfIndex.knnJoinPqChecked(s, d)),
    // the OPQ-rotated sidecar variant: both join sides quantize, so
    // rotation's decorrelation can pay more in the SDC batch shape
    // than in serving — promoted to its own key so the head-to-head
    // is driver-checked, the pq_opq/nsw_pq_opq precedent
    "knn_join_pq_opq" -> ((s: SparkSession, d: String) => IvfIndex.knnJoinPqChecked(s, d, sub = "pqr")),
    // radius (range) search, BM25 lexical leg, hybrid fusion, and the
    // MMR diversity rerank — the retrieval surface around the ANN core
    "range_search" -> ((s: SparkSession, d: String) => KnnSearch.rangeSearch(s, d)),
    "knn_filtered" -> ((s: SparkSession, d: String) => KnnSearch.knnFiltered(s, d)),
    // (anchor, positive, hard-negative) triplet mining with margin
    // violation flags — the contrastive-training data op
    "mine_triplets" -> ((s: SparkSession, d: String) => KnnSearch.mineTriplets(s, d)),
    // leave-one-out kNN label-prediction accuracy per label — the
    // embedding-space quality eval
    "label_knn_eval" -> ((s: SparkSession, d: String) => KnnSearch.labelKnnEval(s, d)),
    // per-dimension embedding distribution table (dead dims, scale
    // drift, SQ8 ranges) — exact integer stats, one partial-agged pass
    // slice-vs-slice per-dim drift (Welch z on exact integer moments)
    "embedding_drift" -> ((s: SparkSession, d: String) =>
      graft.operators.EmbeddingStats.embeddingDrift(s, d)),
    "embedding_dim_stats" -> ((s: SparkSession, d: String) =>
      graft.operators.EmbeddingStats.embeddingDimStats(s, d)),
    // PCA whitening (16 of 64 dims) served as its contract grid
    "embedding_whiten" -> (graft.operators.Whiten.embeddingWhitenGrid _),
    "ivf_search_filtered" -> (IvfIndex.ivfSearchFiltered _),
    // filtered NSW: the graph index's metadata path — pre-filter
    // semantics threaded through the beam walk (accepted-set top-k)
    "nsw_search_filtered" -> (NswIndex.nswSearchFiltered _),
    // versioned posting layout: serve "as of batch B" + rollback —
    // crud_asof's discipline composed with the persisted IVF layout
    "ivf_search_asof" -> (graft.index.SnapshotLayout.ivfSearchAsof _),
    "ivf_search_asof_pq" -> (graft.index.SnapshotLayout.ivfSearchAsofPq _),
    "knn_join_pq_asof" -> (graft.index.SnapshotLayout.knnJoinPqAsofChecked _),
    "knn_join_pq_gen" -> (graft.index.SnapshotLayout.knnJoinPqGenChecked _),
    "ivf_search_asof_filtered" -> (graft.index.SnapshotLayout.ivfSearchAsofFiltered _),
    "nsw_search_asof_filtered" -> (graft.index.NswSnapshotLayout.nswSearchAsofFiltered _),
    "nsw_search_asof" -> (graft.index.NswSnapshotLayout.nswSearchAsof _),
    // compaction invariance, driver-checked per round for both index
    // families: serve-identical at >= upTo, history truncated below,
    // rollback guard refuses unrestorable targets
    "ivf_compact" -> (graft.index.SnapshotLayout.ivfCompactChecked _),
    "nsw_compact" -> (graft.index.NswSnapshotLayout.nswCompactChecked _),
    // generation cutover: the drift-envelope ACTION on the versioned
    // layouts — re-fit from the head reconstruction into generation
    // N+1, atomic pointer swap, old generations readable for as-of
    "ivf_generation" -> (graft.index.SnapshotLayout.ivfGeneration _),
    "nsw_generation" -> (graft.index.NswSnapshotLayout.nswGeneration _),
    // the graph cutover's one-time lifecycle under its own build
    // label (VERDICT r14 #3 — the serve key above floors the steady
    // state; this one owns the 54 s-class scenario build)
    "nsw_generation_build" -> (graft.index.NswSnapshotLayout.nswGenerationBuild _),
    // the versioned layouts' change-data feed: added/deleted/updated
    // between two as-of points, identical for both index families
    "index_asof_diff" -> (graft.index.SnapshotLayout.indexAsofDiff _),
    // merge-on-read debt gauge: the counts a compaction scheduler
    // reads (batches, live vs superseded rows, dead ids, tombstones)
    "index_layout_stats" -> (graft.index.SnapshotLayout.indexLayoutStats _),
    // the CDC feed as a readStream: per-manifested-batch diffs with
    // exactly-once discovery via the file-source checkpoint
    "index_changes_stream" ->
      (graft.streaming.IndexStream.indexChangesStream _),
    // the automated lifecycle: a drift-tripping batch makes the
    // generational sink cut over on its own, both families
    "index_generation_stream" ->
      (graft.streaming.IndexStream.indexGenerationStream _),
    "text_bm25" -> (graft.text.Bm25.textBm25 _),
    "text_unigram_ll" -> (TextOps.textUnigramLl _),
    // bigram-LM fluency (word ORDER, which a unigram bag can't see)
    "text_bigram_ll" -> (TextOps.textBigramLl _),
    // DSIR-style hashed-ngram importance weights vs a target domain
    "dsir_importance" -> (TextOps.dsirImportance _),
    "hybrid_rrf" -> (Hybrid.hybridRrfChecked _),
    "mmr_rerank" -> (Rerank.mmrRerankEntry _),
    // dedup family
    "dedup_exact" -> (Dedup.exact _),
    "dedup_minhash" -> (Dedup.minhash _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    // asymmetric containment (quote/subset detection, directional)
    "dedup_containment" -> (Dedup.containment _),
    // PageRank hub scores over the near-dup candidate graph
    "graph_pagerank" -> (GraphOps.graphPagerank _),
    "dedup_embedding" -> (Dedup.embeddingNearDup _),
    "dedup_embedding_lsh" -> (Dedup.embeddingNearDupLshChecked _),
    "dedup_components" -> ((s: SparkSession, d: String) => Dedup.components(s, d)),
    // component dedup electing the LONGEST member as survivor
    "dedup_keep_best" -> (Dedup.keepBest _),
    // cluster-size histogram + removal share of the component dedup
    "dedup_cluster_stats" -> (Dedup.clusterStats _),
    // SemDeDup: k-means clusters bound the pairwise prune (checked grid)
    "dedup_semantic" -> ((s: SparkSession, d: String) => Dedup.semanticDedupChecked(s, d)),
    "dedup_semantic_pq" -> ((s: SparkSession, d: String) => Dedup.semanticDedupPqChecked(s, d)),
    "dedup_substring" -> ((s: SparkSession, d: String) => Dedup.substringSpans(s, d)),
    // the spans dedup_substring excludes, reported as a stopspan list
    "dedup_boilerplate" -> ((s: SparkSession, d: String) => Dedup.boilerplateSpans(s, d)),
    "contamination_check" -> (Dedup.contamination _),
    // per-pair method-agreement bitmask across minhash/simhash/spans
    "dedup_ensemble" -> (Dedup.ensemble _),
    // pair/doc counts at five Jaccard thresholds from one pair pass
    "dedup_threshold_sweep" -> (Dedup.thresholdSweep _),
    // text analysis family
    "text_tokens" -> (TextOps.textTokens _),
    // unigram token entropy (integer-stabilized; diversity signal)
    "text_entropy" -> (TextOps.textEntropy _),
    "text_quality" -> (TextOps.textQuality _),
    "text_lang_id" -> (TextOps.textLangId _),
    // lang-id confusion matrix: the classifier measured, not asserted
    "lang_id_eval" -> (TextOps.langIdEval _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    // corpus n-gram stats: the high-df report boilerplate stop-lists
    // and contamination screens derive from
    "text_ngram_stats" -> ((s: SparkSession, d: String) => TextOps.textNgramStats(s, d)),
    // per-doc duplicated/top n-gram char coverage + keep verdict
    "text_repetition" -> (TextOps.textRepetition _),
    // distributed BPE merge training over the word-frequency table
    "bpe_train" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.bpeTrain(s, d)),
    "bpe_train_batched" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.bpeTrainBatched(s, d)),
    // BPE ENCODE: segment the whole corpus with the trained merges —
    // golden-pinned doc rows + a corpus-total row forcing full encode
    "bpe_apply" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.bpeApply(s, d)),
    // per-language fertility under the trained tokenizer
    "tok_fertility" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.tokFertility(s, d)),
    // fasttext-style linear quality gate: integer perceptron over
    // hashed uni+bigrams (golden-pinned train head + scored corpus)
    "quality_train" -> ((s: SparkSession, d: String) => graft.text.Quality.qualityTrain(s, d)),
    "quality_score" -> ((s: SparkSession, d: String) => graft.text.Quality.qualityScore(s, d)),
    // the gate's operating points measured (golden-pinned P/R sweep)
    "quality_pr_curve" -> ((s: SparkSession, d: String) => graft.text.Quality.qualityPrCurve(s, d)),
    // PII redaction + match counts (spec drives real PII through the
    // same expressions; this corpus is clean so the oracle pins the
    // no-match identity)
    "text_pii_scrub" -> (TextOps.textPiiScrub _),
    // one-row dataset summary card (docs/tokens/vocab/langs/dup rate)
    "corpus_card" -> (TextOps.corpusCard _),
    // collections / data model (reference CRUD surface)
    "chunk_documents" -> (Collections.chunkDocuments _),
    // chunk-embedding mean-pool to document vectors (unit-renormed)
    "doc_embed_pool" -> (Collections.docEmbedPool _),
    "crud_upsert" -> (Collections.crudUpsert _),
    // the same contract driven through a REAL CollectionStore mutation
    // round-trip (temp dir), sharing crud_upsert's oracle verbatim
    "crud_upsert_store" -> (Collections.crudUpsertStore _),
    // MVCC snapshot-as-of reconstruction from a change log
    "crud_asof" -> (Collections.crudAsof _),
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
    // ColBERT-style late-interaction (MaxSim) document retrieval
    "query_text_maxsim" -> ((s: SparkSession, d: String) => Collections.queryTextMaxsimChecked(s, d)),
    // MaxSim served entirely from the durable persistChunks layout
    "query_maxsim_persisted" -> ((s: SparkSession, d: String) => Collections.queryTextMaxsimPersistedChecked(s, d)),
    "query_chunks_persisted_ivf" -> ((s: SparkSession, d: String) =>
      Collections.queryTextChunksPersistedChecked(s, d, "ivf")),
    "query_chunks_persisted_nsw" -> ((s: SparkSession, d: String) =>
      Collections.queryTextChunksPersistedChecked(s, d, "nsw")),
    // chunk /query over a GENERATIONAL root: the dispatch survives a
    // cutover via the pointer, old as-ofs route to their generation
    "query_chunks_gen" -> ((s: SparkSession, d: String) =>
      Collections.queryChunksGenChecked(s, d)),
    // the persisted layout's one-time batch build, as its own labeled
    // entry (so serve entries above never carry hidden build cost)
    "persist_chunks_build" -> (Collections.persistChunksBuild _),
    // round 11: both served as golden pins + a corpus-total row, so
    // the driver hash-checks the full decode pass (the mm_phash
    // convention); the full per-doc dumps stay library calls
    "mm_features" -> (Media.mmFeaturesChecked _),
    "mm_features_golden" -> (Media.mmFeaturesGolden _),
    "mm_frame_sample" -> (Media.mmFrameSampleChecked _),
    // payload-level media dedup summary; oracle re-derives every
    // number analytically from the documented GRFT1 byte layout
    "mm_dedup" -> (Media.mmDedup _),
    // perceptual-hash (aHash) image near-dup summary, simhash-banded
    "mm_phash" -> (Media.mmPhash _),
    // per-frame hash steps → scene boundaries (golden-pinned)
    "mm_scene_cuts" -> (Media.mmSceneCuts _),
    "embed_text" -> (embedText _),
    "embed_text_golden" -> (embedTextGolden _),
    // libraries level + write-path invariants
    "crud_library" -> (Libraries.crudLibrary _),
    "crud_integrity" -> (Libraries.crudIntegrity _),
    "crud_library_cascade" -> (Libraries.crudLibraryCascade _),
    "crud_update_merge" -> (Libraries.crudUpdateMerge _),
    "crud_upsert_embed" -> (Libraries.crudUpsertEmbedChecked _),
    "meta_filter" -> (Libraries.metaFilter _),
    "sample_stratified" -> ((s: SparkSession, d: String) => Libraries.sampleStratified(s, d)),
    // proportional mixing weights (the data-mixing knob, not a flat cap)
    "sample_weighted" -> ((s: SparkSession, d: String) => Libraries.sampleWeighted(s, d)),
    // A-ES weighted sampling w/o replacement (per-doc weights)
    "sample_reservoir" -> ((s: SparkSession, d: String) => Libraries.sampleReservoir(s, d)),
    "pack_token_budget" -> ((s: SparkSession, d: String) => Libraries.packTokenBudget(s, d)),
    // temperature-scaled (q ∝ p^0.5) multilingual sampling rates +
    // deterministic per-doc keep draws
    "sample_temperature" -> (Libraries.sampleTemperature _),
    // corpus-level mixture planning: shares, upsample factors, epochs
    "mixture_plan" -> (Libraries.mixturePlan _),
    // GLOBAL sequence packing via two-pass distributed prefix sum —
    // no single-task window anywhere in the plan
    "pack_shards" -> ((s: SparkSession, d: String) => Libraries.packShards(s, d)),
    // curriculum ordering: length-bucketed easy->hard with per-bucket
    // source round-robin (the key is emitted, not a global rank)
    "curriculum_order" -> ((s: SparkSession, d: String) => Libraries.curriculumOrder(s, d)),
    // real shard EXPORT with a write-path-certifying manifest oracle
    "export_manifest" -> ((s: SparkSession, d: String) => Libraries.exportManifest(s, d)),
    // annealing-phase quality-upweighted mixture (Llama-3-style)
    "mixture_anneal" -> (Libraries.mixtureAnneal _),
    // ANN index family
    "ivf_build" -> (graft.index.ContractGrids.ivfBuildChecked _),
    "index_scale_knobs" -> (graft.index.IvfIndex.scaleKnobs _),
    "ivf_search" -> (graft.index.ContractGrids.ivfSearchChecked _),
    // coverage-adaptive probing (round 15): probe-until-centroid-mass
    // behind spark.graft.ivf.probeMass; the grid pins the contract,
    // the clustered-slice measurement (SURVEY §20) pins the value
    "ivf_search_mass" -> (graft.index.ContractGrids.ivfSearchMassChecked _),
    // the tau autotuner: sweep the mass grid on a held-out sample vs
    // the exact baseline, choose the cheapest bar-clearing tau (the
    // value a deployment sets the probeMass conf to)
    "probe_mass_tune" -> ((s, d) => graft.index.RecallEval.probeMassTune(s, d)),
    // round 16: the tuner IS the default policy — conf unset (or
    // `auto`) resolves each layout's probe coverage to its memoized
    // tuner choice; this grid pins the precedence rules and the
    // zero-conf ≡ explicit-tuned-τ serve identity
    "probe_mass_auto" -> (graft.index.RecallEval.probeMassAutoChecked _),
    // SparkSessionExtensions optimizer rule: brute cosine top-k → IVF probe
    "ann_rewrite" -> (graft.plans.AnnRewrite.annRewriteChecked _),
    // filtered shape through the same rule: WHERE pred + top-k →
    // pre-filtered probe of the meta build
    "ann_rewrite_filtered" -> (graft.plans.AnnRewrite.annRewriteFilteredChecked _),
    // injected-SQL surface: same semantics as knn_brute_cosine, via spark.sql
    "sql_knn_cosine" -> (KnnSearch.sqlKnnCosine _),
    // incremental maintenance: delta add/remove against a built index
    // without a KMeans refit / graph rebuild (invariant-checked grids)
    "ivf_add_delta" -> (IvfIndex.ivfAddDelta _),
    "nsw_add_delta" -> (NswIndex.nswAddDelta _),
    "ann_lsh_bucketed" -> (graft.index.ContractGrids.annLshBucketedChecked _),
    "nsw_build" -> (NswIndex.nswBuild _),
    // degree/reciprocity observability over the exact graph
    "nsw_graph_stats" -> (NswIndex.nswGraphStats _),
    "nsw_build_lsh" -> (graft.index.ContractGrids.nswBuildLshChecked _),
    "nsw_search" -> (graft.index.ContractGrids.nswSearchChecked _),
    // IVF-PQ: product-quantized posting lists (8-byte codes, ADC probe
    // + exact rerank) over the persisted cluster layout
    "pq_build" -> (IvfIndex.pqBuild _),
    "ivf_search_pq" -> (IvfIndex.ivfSearchPq _),
    "ivf_search_pq_filtered" -> (IvfIndex.ivfSearchPqFiltered _),
    // the graph family's compressed tier: ADC-scored beam walk over
    // the m-byte codes sidecar + exact rerank of the shortlist
    "nsw_search_pq" -> (NswIndex.nswSearchPq _),
    // the same tier composed with time travel: as-of ADC walk over
    // the versioned graph layout's code sidecar
    "nsw_search_asof_pq" ->
      (graft.index.NswSnapshotLayout.nswSearchAsofPq _),
    // ...and with metadata filtering: pre-filter ADC walk on the
    // label-bearing code rows
    "nsw_search_pq_filtered" -> (NswIndex.nswSearchPqFiltered _),
    // SQ8: zero-training int8 scalar quantization — per-dim bounds +
    // the compressed brute scan (integer-exact, fully SQL-oracled)
    "sq_build" -> (SqIndex.sqBuild _),
    "knn_brute_sq" -> ((s: SparkSession, d: String) => SqIndex.knnBruteSq(s, d)),
    // binary (1-bit) quantization: packed sign-bit signatures, Hamming
    // pre-rank + exact rerank — the tier below SQ8, fully hash-oracled
    "bq_build" -> (BqIndex.bqBuild _),
    "knn_brute_bq" -> ((s: SparkSession, d: String) => BqIndex.knnBruteBq(s, d)),
    // BQ pre-rank composed inside the IVF probe (checked serve grid)
    "ivf_search_bq" -> ((s: SparkSession, d: String) => BqIndex.ivfSearchBqChecked(s, d)),
    // corpus cartography: deterministic exemplar assignment card +
    // per-cluster distinguishing-term topics (integer ratio scoring)
    "cluster_assign" -> (Clusters.clusterAssign _),
    // greedy k-center coreset (diverse-subset data pruning)
    "sample_kcenter" -> (Coreset.sampleKcenter _),
    "cluster_topics" -> (Clusters.clusterTopics _),
    // unified index accountability: recall@k of every approximate
    // family vs the exact scan, served as a checked grid (round 16 —
    // family list, bounded recall and per-family bars all oracled;
    // the measured values stay the ScalaTest gate in RecallEvalSpec)
    "index_recall_eval" -> (graft.index.RecallEval.indexRecallEvalChecked _),
    // recall@10 vs nProbe sweep from one cached build (checked grid)
    "ivf_probe_curve" -> (graft.index.RecallEval.ivfProbeCurveChecked _),
    // filtered-ANN recall vs selectivity (checked grid; values in spec)
    "ann_filtered_curve" -> (graft.index.RecallEval.annFilteredCurveChecked _),
    // recall@5 vs beam width from one cached graph (checked grid;
    // exhaustive seed-everything point pinned exactly 1e6)
    "nsw_beam_curve" -> (graft.index.RecallEval.nswBeamCurveChecked _),
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

  /** `embed_text_golden`: the embedder's cross-implementation VALUE
    * oracle (the mm_features_golden pattern applied to the last
    * meaningful no-oracle gap): every e6-stabilized component of three
    * documents' embeddings, hash-compared against values computed by
    * an INDEPENDENT Python reimplementation of the hashing-trick
    * algorithm (tools/golden_embed.py). Silent drift anywhere in the
    * path -- tokenization, polynomial hash, splitmix64, sign bit,
    * bucket mod, normalization, float32 cast -- flips the hash.
    * Values are pinned to the sf0.01 corpus (the SF the driver's
    * oracle evaluates), like mm_features_golden. */
  private def embedTextGolden(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .filter($"doc_id".isin(0L, 7L, 123L))
      .select($"doc_id", posexplode(Embedder.embedText($"text")).as(Seq("i0", "c")))
      .select($"doc_id", ($"i0" + 1).cast("long").as("idx"),
        Stab.e6($"c".cast("double")).as("comp_e6"))
      .orderBy($"doc_id", $"idx")
  }

  private val embedTextGoldenSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(idx AS BIGINT) AS idx,
      |  CAST(comp_e6 AS BIGINT) AS comp_e6
      |FROM (VALUES
      |(0, 1, 344124),
      |(0, 2, 0),
      |(0, 3, 0),
      |(0, 4, 0),
      |(0, 5, 0),
      |(0, 6, 0),
      |(0, 7, 114708),
      |(0, 8, 229416),
      |(0, 9, 0),
      |(0, 10, -114708),
      |(0, 11, 0),
      |(0, 12, 0),
      |(0, 13, -114708),
      |(0, 14, 0),
      |(0, 15, 0),
      |(0, 16, 229416),
      |(0, 17, 0),
      |(0, 18, -229416),
      |(0, 19, 0),
      |(0, 20, 0),
      |(0, 21, -229416),
      |(0, 22, 0),
      |(0, 23, -114708),
      |(0, 24, 0),
      |(0, 25, 0),
      |(0, 26, 0),
      |(0, 27, 0),
      |(0, 28, 0),
      |(0, 29, 0),
      |(0, 30, 0),
      |(0, 31, -114708),
      |(0, 32, 0),
      |(0, 33, 114708),
      |(0, 34, 0),
      |(0, 35, 0),
      |(0, 36, 0),
      |(0, 37, 0),
      |(0, 38, 0),
      |(0, 39, 0),
      |(0, 40, 0),
      |(0, 41, 0),
      |(0, 42, 0),
      |(0, 43, -573539),
      |(0, 44, 0),
      |(0, 45, -114708),
      |(0, 46, 0),
      |(0, 47, -114708),
      |(0, 48, 0),
      |(0, 49, 0),
      |(0, 50, -344124),
      |(0, 51, 0),
      |(0, 52, 0),
      |(0, 53, 0),
      |(0, 54, 0),
      |(0, 55, 0),
      |(0, 56, 0),
      |(0, 57, 0),
      |(0, 58, 0),
      |(0, 59, 0),
      |(0, 60, 0),
      |(0, 61, 0),
      |(0, 62, 0),
      |(0, 63, -344124),
      |(0, 64, 0),
      |(7, 1, 111803),
      |(7, 2, 0),
      |(7, 3, 0),
      |(7, 4, 0),
      |(7, 5, 0),
      |(7, 6, 0),
      |(7, 7, 55902),
      |(7, 8, -55902),
      |(7, 9, 0),
      |(7, 10, -111803),
      |(7, 11, 55902),
      |(7, 12, 0),
      |(7, 13, -670820),
      |(7, 14, 0),
      |(7, 15, 0),
      |(7, 16, 167705),
      |(7, 17, 0),
      |(7, 18, -167705),
      |(7, 19, 0),
      |(7, 20, 0),
      |(7, 21, -55902),
      |(7, 22, 0),
      |(7, 23, -167705),
      |(7, 24, -111803),
      |(7, 25, -111803),
      |(7, 26, 0),
      |(7, 27, 0),
      |(7, 28, 0),
      |(7, 29, 0),
      |(7, 30, 0),
      |(7, 31, -447214),
      |(7, 32, 0),
      |(7, 33, 55902),
      |(7, 34, -279509),
      |(7, 35, 0),
      |(7, 36, 0),
      |(7, 37, 0),
      |(7, 38, -167705),
      |(7, 39, 0),
      |(7, 40, 0),
      |(7, 41, 0),
      |(7, 42, 0),
      |(7, 43, 0),
      |(7, 44, 0),
      |(7, 45, -111803),
      |(7, 46, 0),
      |(7, 47, -111803),
      |(7, 48, 0),
      |(7, 49, 0),
      |(7, 50, 0),
      |(7, 51, 0),
      |(7, 52, 0),
      |(7, 53, 0),
      |(7, 54, 0),
      |(7, 55, 0),
      |(7, 56, 0),
      |(7, 57, 0),
      |(7, 58, 55902),
      |(7, 59, -223607),
      |(7, 60, 0),
      |(7, 61, 55902),
      |(7, 62, 0),
      |(7, 63, -111803),
      |(7, 64, 0),
      |(123, 1, 363803),
      |(123, 2, 0),
      |(123, 3, 0),
      |(123, 4, 0),
      |(123, 5, 0),
      |(123, 6, 0),
      |(123, 7, 242536),
      |(123, 8, -121268),
      |(123, 9, 0),
      |(123, 10, -121268),
      |(123, 11, 121268),
      |(123, 12, 0),
      |(123, 13, -606339),
      |(123, 14, 0),
      |(123, 15, 0),
      |(123, 16, 0),
      |(123, 17, 0),
      |(123, 18, 0),
      |(123, 19, 0),
      |(123, 20, 0),
      |(123, 21, -242536),
      |(123, 22, 0),
      |(123, 23, 0),
      |(123, 24, -121268),
      |(123, 25, 0),
      |(123, 26, 0),
      |(123, 27, 0),
      |(123, 28, 0),
      |(123, 29, 242536),
      |(123, 30, 0),
      |(123, 31, 0),
      |(123, 32, 0),
      |(123, 33, -121268),
      |(123, 34, -121268),
      |(123, 35, 0),
      |(123, 36, 0),
      |(123, 37, 0),
      |(123, 38, -121268),
      |(123, 39, 0),
      |(123, 40, 0),
      |(123, 41, 0),
      |(123, 42, 0),
      |(123, 43, 0),
      |(123, 44, 0),
      |(123, 45, 0),
      |(123, 46, 0),
      |(123, 47, -121268),
      |(123, 48, 0),
      |(123, 49, 0),
      |(123, 50, 0),
      |(123, 51, 0),
      |(123, 52, 0),
      |(123, 53, 0),
      |(123, 54, 0),
      |(123, 55, 0),
      |(123, 56, 0),
      |(123, 57, 0),
      |(123, 58, 121268),
      |(123, 59, -242536),
      |(123, 60, 0),
      |(123, 61, 363803),
      |(123, 62, 0),
      |(123, 63, 0),
      |(123, 64, 0)
      |) AS t(doc_id, idx, comp_e6)
      |ORDER BY doc_id, idx""".stripMargin

  /** DuckDB-runnable ANSI SQL twin for each oracle-checkable query. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q5_join" -> Relational.q5JoinSql,
    "q7_join" -> Relational.q7JoinSql,
    "q8_mktshare" -> Relational.q8MktshareSql,
    "q10_returns" -> Relational.q10ReturnsSql,
    "q13_custdist" -> Relational.q13CustdistSql,
    "q18_bigorders" -> Relational.q18BigordersSql,
    "q4_priority" -> Relational.q4PrioritySql,
    "q22_dormant" -> Relational.q22DormantSql,
    "q14_promo" -> Relational.q14PromoSql,
    "q15_topsupplier" -> Relational.q15TopSupplierSql,
    "q17_smallqty" -> Relational.q17SmallQtySql,
    "q19_disjunct" -> Relational.q19DisjunctSql,
    "q9_profit" -> TpchExtra.q9ProfitSql,
    "q11_important" -> TpchExtra.q11ImportantSql,
    "q16_suppcnt" -> TpchExtra.q16SuppCntSql,
    "q21_waiting" -> TpchExtra.q21WaitingSql,
    "q2_mincost" -> TpchExtra.q2MinCostSql,
    "q20_excess" -> TpchExtra.q20ExcessSql,
    "q12_shipmode" -> TpchExtra.q12ShipmodeSql,
    "q6_filter" -> Relational.q6FilterSql,
    "window_topk" -> Relational.windowTopKSql,
    "events_window_agg" -> Relational.eventsWindowAggSql,
    "events_sessionize" -> Relational.eventsSessionizeSql,
    "events_funnel" -> Relational.eventsFunnelSql,
    "events_approx_users" -> Relational.eventsApproxUsersSql,
    "events_retention" -> Relational.eventsRetentionSql,
    "events_asof" -> Relational.eventsAsofSql,
    "events_attribution" -> graft.streaming.AttributionStream.eventsAttributionSql,
    "events_anomaly" -> Relational.eventsAnomalySql,
    "join_salted" -> SkewJoin.joinSaltedSql,
    "events_rolling" -> AnalyticsExtra.eventsRollingSql,
    "q1_rollup" -> AnalyticsExtra.q1RollupSql,
    "pivot_lang" -> AnalyticsExtra.pivotLangSql,
    "stats_corr" -> AnalyticsExtra.statsCorrSql,
    "doc_len_hist" -> AnalyticsExtra.docLenHistSql,
    "events_dau_wau" -> AnalyticsExtra.eventsDauWauSql,
    "corpus_mix" -> AnalyticsExtra.corpusMixSql,
    "events_transitions" -> AnalyticsExtra.eventsTransitionsSql,
    "text_keywords" -> AnalyticsExtra.textKeywordsSql,
    "quality_quantiles" -> TextOps.qualityQuantilesSql,
    "knn_brute_cosine" -> KnnSearch.bruteCosineSql,
    "knn_brute_dot" -> KnnSearch.bruteDotSql,
    "knn_brute_l2" -> KnnSearch.bruteL2Sql,
    "knn_join_exact" -> KnnSearch.knnJoinExactSql,
    "knn_join_ivf" -> IvfIndex.knnJoinIvfSql,
    "knn_join_pq" -> IvfIndex.knnJoinPqSql,
    "knn_join_pq_opq" -> IvfIndex.knnJoinPqSql,
    "range_search" -> KnnSearch.rangeSearchSql,
    "knn_filtered" -> KnnSearch.knnFilteredSql,
    "mine_triplets" -> KnnSearch.mineTripletsSql,
    "label_knn_eval" -> KnnSearch.labelKnnEvalSql,
    "embedding_dim_stats" -> graft.operators.EmbeddingStats.embeddingDimStatsSql,
    "embedding_drift" -> graft.operators.EmbeddingStats.embeddingDriftSql,
    "embedding_whiten" -> graft.operators.Whiten.embeddingWhitenSql,
    "ivf_search_filtered" -> IvfIndex.ivfSearchFilteredSql,
    "nsw_search_filtered" -> NswIndex.nswSearchFilteredSql,
    "ivf_search_asof" -> graft.index.SnapshotLayout.ivfSearchAsofSql,
    "ivf_search_asof_pq" -> graft.index.SnapshotLayout.ivfSearchAsofPqSql,
    "knn_join_pq_asof" -> graft.index.SnapshotLayout.knnJoinPqAsofSql,
    "knn_join_pq_gen" -> graft.index.SnapshotLayout.knnJoinPqGenSql,
    "ivf_search_asof_filtered" -> graft.index.SnapshotLayout.ivfSearchAsofFilteredSql,
    "nsw_search_asof_filtered" -> graft.index.NswSnapshotLayout.nswSearchAsofFilteredSql,
    "nsw_search_asof" -> graft.index.NswSnapshotLayout.nswSearchAsofSql,
    "ivf_compact" -> graft.index.SnapshotLayout.ivfCompactCheckedSql,
    "nsw_compact" -> graft.index.NswSnapshotLayout.nswCompactCheckedSql,
    "ivf_generation" -> graft.index.SnapshotLayout.ivfGenerationSql,
    "nsw_generation" -> graft.index.NswSnapshotLayout.nswGenerationSql,
    "nsw_generation_build" -> graft.index.NswSnapshotLayout.nswGenerationBuildSql,
    "index_asof_diff" -> graft.index.SnapshotLayout.indexAsofDiffSql,
    "index_layout_stats" -> graft.index.SnapshotLayout.indexLayoutStatsSql,
    "index_changes_stream" ->
      graft.streaming.IndexStream.indexChangesStreamSql,
    "index_generation_stream" ->
      graft.streaming.IndexStream.indexGenerationStreamSql,
    "text_bm25" -> graft.text.Bm25.textBm25Sql,
    "text_unigram_ll" -> TextOps.textUnigramLlSql,
    "text_bigram_ll" -> TextOps.textBigramLlSql,
    "dsir_importance" -> TextOps.dsirImportanceSql,
    "hybrid_rrf" -> Hybrid.hybridRrfCheckedSql,
    "mmr_rerank" -> Rerank.mmrRerankSql,
    "dedup_exact" -> Dedup.exactSql,
    "dedup_minhash" -> Dedup.minhashSql,
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_containment" -> Dedup.containmentSql,
    "graph_pagerank" -> GraphOps.graphPagerankSql,
    "dedup_embedding" -> Dedup.embeddingNearDupSql,
    "dedup_components" -> Dedup.componentsSql,
    "dedup_keep_best" -> Dedup.keepBestSql,
    "dedup_cluster_stats" -> Dedup.clusterStatsSql,
    "dedup_semantic" -> Dedup.semanticDedupSql,
    "dedup_semantic_pq" -> Dedup.semanticDedupPqSql,
    "dedup_substring" -> Dedup.substringSpansSql,
    "dedup_boilerplate" -> Dedup.boilerplateSpansSql,
    "contamination_check" -> Dedup.contaminationSql,
    "dedup_ensemble" -> Dedup.ensembleSql,
    "dedup_threshold_sweep" -> Dedup.thresholdSweepSql,
    "text_tokens" -> TextOps.textTokensSql,
    "text_entropy" -> TextOps.textEntropySql,
    "text_quality" -> TextOps.textQualitySql,
    "text_lang_id" -> TextOps.textLangIdSql,
    "lang_id_eval" -> TextOps.langIdEvalSql,
    "text_fingerprint" -> TextOps.textFingerprintSql,
    "text_ngram_stats" -> TextOps.textNgramStatsSql,
    "text_repetition" -> TextOps.textRepetitionSql,
    "text_pii_scrub" -> TextOps.textPiiScrubSql,
    "corpus_card" -> TextOps.corpusCardSql,
    // golden-pin oracle (the embed_text_golden pattern): the merge
    // table from the INDEPENDENT Python BPE (tools/golden_bpe.py) on
    // the driver's verify corpus, pinned as literals — DuckDB cannot
    // express the iterative merge loop itself
    "tok_fertility" -> graft.text.BpeTrain.tokFertilitySql,
    // golden-pin oracle: the BATCHED trainer's merge table from the
    // independent Python BPE run with the identical conflict-filtered
    // selection rule (tools/golden_bpe.py batched <dir> 64 8)
    "bpe_train_batched" ->
      """SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, merged,
        |  CAST(pair_count AS BIGINT) AS pair_count
        |FROM (VALUES
        |(1, 'e', 'r', 'er', 4568),
        |(2, 'i', 'n', 'in', 2760),
        |(3, 'o', 'w', 'ow', 2747),
        |(4, 's', 't', 'st', 2676),
        |(5, 'l', 'u', 'lu', 1831),
        |(6, 'p', 'a', 'pa', 1758),
        |(7, 'c', 'h', 'ch', 937),
        |(8, 'g', 'g', 'gg', 901),
        |(9, 'o', 'r', 'or', 2696),
        |(10, 'm', 'er', 'mer', 1852),
        |(11, 'a', 't', 'at', 1845),
        |(12, 's', 'h', 'sh', 947),
        |(13, 'c', 'u', 'cu', 934),
        |(14, 'f', 'i', 'fi', 933),
        |(15, 'l', 'l', 'll', 928),
        |(16, 'g', 'e', 'ge', 918),
        |(17, 'pa', 'r', 'par', 1758),
        |(18, 'j', 'o', 'jo', 964),
        |(19, 'a', 'sh', 'ash', 947),
        |(20, 'at', 'ch', 'atch', 937),
        |(21, 's', 'c', 'sc', 936),
        |(22, 'cu', 'st', 'cust', 934),
        |(23, 'lu', 'm', 'lum', 934),
        |(24, 'fi', 'l', 'fil', 933),
        |(25, 'jo', 'in', 'join', 964),
        |(26, 'h', 'ash', 'hash', 947),
        |(27, 'r', 'ow', 'row', 943),
        |(28, 'b', 'atch', 'batch', 937),
        |(29, 'a', 'n', 'an', 936),
        |(30, 'c', 'o', 'co', 934),
        |(31, 'fil', 't', 'filt', 933),
        |(32, 's', 'm', 'sm', 928),
        |(33, 'sc', 'an', 'scan', 936),
        |(34, 'co', 'lum', 'colum', 934),
        |(35, 'cust', 'o', 'custo', 934),
        |(36, 'filt', 'er', 'filter', 933),
        |(37, 'a', 'll', 'all', 928),
        |(38, 'l', 'ow', 'low', 918),
        |(39, 'mer', 'ge', 'merge', 918),
        |(40, 'c', 't', 'ct', 912),
        |(41, 'colum', 'n', 'column', 934),
        |(42, 'custo', 'mer', 'customer', 934),
        |(43, 'sm', 'all', 'small', 928),
        |(44, 's', 'low', 'slow', 918),
        |(45, 'ct', 'or', 'ctor', 912),
        |(46, 'd', 'er', 'der', 912),
        |(47, 'v', 'e', 've', 912),
        |(48, 'l', 'in', 'lin', 910),
        |(49, 'or', 'der', 'order', 912),
        |(50, 've', 'ctor', 'vector', 912),
        |(51, 'lin', 'e', 'line', 910),
        |(52, 'a', 'b', 'ab', 908),
        |(53, 'd', 'at', 'dat', 908),
        |(54, 'u', 'p', 'up', 904),
        |(55, 'st', 'r', 'str', 888),
        |(56, 'w', 'in', 'win', 886),
        |(57, 'ab', 'l', 'abl', 908),
        |(58, 'dat', 'a', 'data', 908),
        |(59, 'lu', 'e', 'lue', 897),
        |(60, 'd', 'ow', 'dow', 886),
        |(61, 'par', 'k', 'park', 880),
        |(62, 'g', 'r', 'gr', 878),
        |(63, 'o', 'up', 'oup', 878),
        |(64, 'b', 'i', 'bi', 876)
        |) t(rank, lhs, rhs, merged, pair_count)
        |ORDER BY rank""".stripMargin,
    "bpe_train" ->
      """SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, merged,
        |  CAST(pair_count AS BIGINT) AS pair_count
        |FROM (VALUES
        |(1, 'e', 'r', 'er', 4568),
        |(2, 'i', 'n', 'in', 2760),
        |(3, 'o', 'w', 'ow', 2747),
        |(4, 'o', 'r', 'or', 2696),
        |(5, 's', 't', 'st', 2676),
        |(6, 'm', 'er', 'mer', 1852),
        |(7, 'a', 't', 'at', 1845),
        |(8, 'l', 'u', 'lu', 1831),
        |(9, 'a', 'r', 'ar', 1758),
        |(10, 'p', 'ar', 'par', 1758),
        |(11, 'j', 'o', 'jo', 964),
        |(12, 'jo', 'in', 'join', 964),
        |(13, 'a', 's', 'as', 947),
        |(14, 'as', 'h', 'ash', 947),
        |(15, 'h', 'ash', 'hash', 947),
        |(16, 'r', 'ow', 'row', 943),
        |(17, 'at', 'c', 'atc', 937),
        |(18, 'atc', 'h', 'atch', 937),
        |(19, 'b', 'atch', 'batch', 937),
        |(20, 'a', 'n', 'an', 936)
        |) t(rank, lhs, rhs, merged, pair_count)
        |ORDER BY rank""".stripMargin,
    // golden-pin oracle: per-doc encode stats under the trained merge
    // table from the independent Python BPE (tools/golden_bpe.py
    // apply) — pinned docs + the doc_id=-1 corpus-total row
    "bpe_apply" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
        |  CAST(cpt_e6 AS BIGINT) AS cpt_e6, head_toks
        |FROM (VALUES
        |(7, 72, 331, 231, 1432900, 'batch w in d ow v e c t or'),
        |(58, 72, 318, 246, 1292682, 'c o lu m n st r e a m s par k'),
        |(123, 28, 131, 95, 1378947, 't h e st r e a m or d er'),
        |(250, 44, 204, 141, 1446808, 'v a lu e s par k or d er'),
        |(487, 59, 263, 192, 1369791, 'k e y w in d ow s m a l l'),
        |(490, 50, 222, 156, 1423076, 'w in d ow q u er y a'),
        |(-1, 27165, 122509, 88559, 1383360, '')
        |) t(doc_id, n_words, n_chars, n_bpe_tokens, cpt_e6, head_toks)
        |ORDER BY doc_id""".stripMargin,
    // golden-pin oracle (the bpe_train pattern): the weight head from
    // the INDEPENDENT Python perceptron (tools/golden_quality.py) on
    // the driver's verify corpus — integer training makes the pin
    // exact, not ulp-lucky
    "quality_train" ->
      """SELECT CAST(rank AS BIGINT) AS rank, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(weight AS BIGINT) AS weight, CAST(mistakes AS BIGINT) AS mistakes
        |FROM (VALUES
        |(0, -1, -11, 633),
        |(1, 559, 25, -1),
        |(2, 772, -23, -1),
        |(3, 1124, -23, -1),
        |(4, 1519, 23, -1),
        |(5, 1954, 22, -1),
        |(6, 1173, 21, -1),
        |(7, 2160, 21, -1),
        |(8, 220, -20, -1),
        |(9, 1465, 20, -1),
        |(10, 4071, 20, -1),
        |(11, 247, -19, -1),
        |(12, 577, 19, -1),
        |(13, 1873, 19, -1),
        |(14, 2606, 19, -1),
        |(15, 2917, -19, -1),
        |(16, 2928, 19, -1),
        |(17, 3549, 19, -1),
        |(18, 1950, -18, -1),
        |(19, 3086, -18, -1),
        |(20, 361, 17, -1),
        |(21, 901, 17, -1),
        |(22, 1175, -17, -1),
        |(23, 1228, 17, -1),
        |(24, 1741, 17, -1),
        |(25, 2071, 17, -1),
        |(26, 1749, -16, -1),
        |(27, 2228, 16, -1),
        |(28, 2380, 16, -1),
        |(29, 2789, 16, -1),
        |(30, 3960, -16, -1),
        |(31, 233, 15, -1),
        |(32, 539, -15, -1)
        |) t(rank, bucket, weight, mistakes)
        |ORDER BY rank""".stripMargin,
    // golden-pinned head rows + the doc_id=-1 corpus-total row forcing
    // the full scoring pass (the bpe_apply pattern)
    "quality_score" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_feats AS BIGINT) AS n_feats,
        |  CAST(score AS BIGINT) AS score, keep
        |FROM (VALUES
        |(0, 63, 131, true),
        |(1, 143, 221, true),
        |(2, 89, 99, true),
        |(3, 53, -6, false),
        |(4, 89, 21, true),
        |(5, 111, 80, true),
        |(6, 29, -47, false),
        |(7, 143, -11, false),
        |(-1, 53830, 51960, true)
        |) t(doc_id, n_feats, score, keep)
        |ORDER BY doc_id""".stripMargin,
    // golden-pin oracle (the quality_train pattern): the full P/R
    // sweep from the INDEPENDENT Python scorer
    // (tools/golden_quality.py pr) on the driver's verify corpus —
    // integer scores and truncating cross-multiplies make it exact
    "quality_pr_curve" ->
      """SELECT CAST(thresh AS BIGINT) AS thresh, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(precision_e6 AS BIGINT) AS precision_e6,
        |  CAST(recall_e6 AS BIGINT) AS recall_e6
        |FROM (VALUES
        |(-40, 215, 240, 3, 472527, 986238),
        |(-20, 210, 213, 8, 496453, 963302),
        |(0, 204, 186, 14, 523076, 935779),
        |(20, 195, 164, 23, 543175, 894495),
        |(40, 184, 142, 34, 564417, 844036)
        |) t(thresh, tp, fp, fn, precision_e6, recall_e6)
        |ORDER BY thresh""".stripMargin,
    "chunk_documents" -> Collections.chunkDocumentsSql,
    "doc_embed_pool" -> Collections.docEmbedPoolSql,
    "crud_upsert" -> Collections.crudUpsertSql,
    "crud_upsert_store" -> Collections.crudUpsertSql,
    "crud_asof" -> Collections.crudAsofSql,
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
    "query_text_maxsim" -> Collections.queryTextCheckedSql,
    "query_maxsim_persisted" -> Collections.queryTextCheckedSql,
    "query_chunks_persisted_ivf" -> Collections.queryTextCheckedSql,
    "query_chunks_persisted_nsw" -> Collections.queryTextCheckedSql,
    "query_chunks_gen" -> Collections.queryChunksGenSql,
    "persist_chunks_build" -> Collections.persistChunksBuildSql,
    "query_e2e" -> Collections.queryTextCheckedSql,
    "embed_text" -> embedTextSql,
    "embed_text_golden" -> embedTextGoldenSql,
    "crud_upsert_embed" -> Libraries.crudUpsertEmbedCheckedSql,
    "mm_features" -> Media.mmFeaturesCheckedSql,
    "mm_frame_sample" -> Media.mmFrameSampleCheckedSql,
    "mm_features_golden" -> Media.mmFeaturesGoldenSql,
    "mm_dedup" -> Media.mmDedupSql,
    "mm_phash" -> Media.mmPhashSql,
    "mm_scene_cuts" -> Media.mmSceneCutsSql,
    "crud_library" -> Libraries.crudLibrarySql,
    "crud_integrity" -> Libraries.crudIntegritySql,
    "crud_library_cascade" -> Libraries.crudLibraryCascadeSql,
    "crud_update_merge" -> Libraries.crudUpdateMergeSql,
    "meta_filter" -> Libraries.metaFilterSql,
    "sample_stratified" -> Libraries.sampleStratifiedSql,
    "sample_weighted" -> Libraries.sampleWeightedSql,
    "sample_reservoir" -> Libraries.sampleReservoirSql,
    "pack_token_budget" -> Libraries.packTokenBudgetSql,
    "sample_temperature" -> Libraries.sampleTemperatureSql,
    "mixture_plan" -> Libraries.mixturePlanSql,
    "pack_shards" -> Libraries.packShardsSql,
    "curriculum_order" -> Libraries.curriculumOrderSql,
    "export_manifest" -> Libraries.exportManifestSql,
    "mixture_anneal" -> Libraries.mixtureAnnealSql,
    "nsw_build" -> NswIndex.nswBuildSql,
    "nsw_graph_stats" -> NswIndex.nswGraphStatsSql,
    "ivf_add_delta" -> IvfIndex.ivfAddDeltaSql,
    "pq_build" -> IvfIndex.pqBuildSql,
    "ivf_search_pq" -> IvfIndex.ivfSearchPqSql,
    "ivf_search_pq_filtered" -> IvfIndex.ivfSearchPqFilteredSql,
    "nsw_search_pq" -> NswIndex.nswSearchPqSql,
    "nsw_search_asof_pq" ->
      graft.index.NswSnapshotLayout.nswSearchAsofPqSql,
    "nsw_search_pq_filtered" -> NswIndex.nswSearchPqFilteredSql,
    "ivf_probe_curve" -> graft.index.RecallEval.ivfProbeCurveSql,
    "ann_filtered_curve" -> graft.index.RecallEval.annFilteredCurveSql,
    "nsw_beam_curve" -> graft.index.RecallEval.nswBeamCurveSql,
    "sq_build" -> SqIndex.sqBuildSql,
    "knn_brute_sq" -> SqIndex.knnBruteSqSql,
    "bq_build" -> BqIndex.bqBuildSql,
    "knn_brute_bq" -> BqIndex.knnBruteBqSql,
    "ivf_search_bq" -> BqIndex.ivfSearchBqCheckedSql,
    "cluster_assign" -> Clusters.clusterAssignSql,
    "sample_kcenter" -> Coreset.sampleKcenterSql,
    "cluster_topics" -> Clusters.clusterTopicsSql,
    "nsw_add_delta" -> NswIndex.nswAddDeltaSql,
    // serve/build contract grids over the approximate indexes (the
    // all-true grid is SQL-exact; recall stays the ScalaTest bars)
    "ivf_build" -> graft.index.ContractGrids.ivfBuildCheckedSql,
    "index_scale_knobs" -> graft.index.IvfIndex.scaleKnobsSql,
    "ivf_search" -> graft.index.ContractGrids.ivfSearchCheckedSql,
    "ivf_search_mass" -> graft.index.ContractGrids.ivfSearchMassCheckedSql,
    "probe_mass_tune" -> graft.index.RecallEval.probeMassTuneSql,
    "probe_mass_auto" -> graft.index.RecallEval.probeMassAutoSql,
    "index_recall_eval" -> graft.index.RecallEval.indexRecallEvalSql,
    "ann_rewrite" -> graft.plans.AnnRewrite.annRewriteCheckedSql,
    "ann_rewrite_filtered" -> graft.plans.AnnRewrite.annRewriteFilteredCheckedSql,
    "sql_knn_cosine" -> KnnSearch.sqlKnnCosineSql,
    "nsw_search" -> graft.index.ContractGrids.nswSearchCheckedSql,
    "nsw_build_lsh" -> graft.index.ContractGrids.nswBuildLshCheckedSql,
    "ann_lsh_bucketed" -> graft.index.ContractGrids.annLshBucketedCheckedSql,
    "dedup_embedding_lsh" -> Dedup.embeddingNearDupLshCheckedSql,
    "pipeline_clean" -> Collections.pipelineCleanSql(
      TextOps.textQualitySql, Dedup.minhashSql),
  )
}
