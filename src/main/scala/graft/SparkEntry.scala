package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every (query, oracle) pair so the driver's
  * column-sorted value-hash compare is deterministic:
  *  - computed integers are BIGINT on both sides (Spark `.cast("long")`,
  *    DuckDB `CAST(.. AS BIGINT)`);
  *  - timestamps surface as epoch MICROSECONDS (unix_micros/epoch_us);
  *  - doubles whose value depends on FP association order are rounded
  *    identically on both sides; raw stored doubles pass through;
  *  - top-N orderings always carry a unique-key tie-break.
  */
object SparkEntry {

  /** Flagship: the reference pipeline's batch twin on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    EditAnalytics.editSizeByWindow(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/§2.2 reference surface + batch core
    "q_edit_window" -> ((s, d) => EditAnalytics.editSizeByWindow(s, d)),
    "q_filter_project" -> ((s, d) => EditAnalytics.filterProject(s, d)),
    "q_sliding_window" -> ((s, d) => EditAnalytics.slidingWindow(s, d)),
    "q_session_window" -> ((s, d) => EditAnalytics.sessionWindow(s, d)),
    "q1_pricing_agg" -> ((s, d) => BatchQueries.pricingSummary(s, d)),
    "q_topn_join" -> ((s, d) => BatchQueries.topRevenueOrders(s, d)),
    "q_multijoin" -> ((s, d) => BatchQueries.regionalVolume(s, d)),
    "q_broadcast_join" -> ((s, d) => BatchQueries.supplierByRegion(s, d)),
    "q_semi_anti_join" -> ((s, d) => BatchQueries.customersWithWithoutOrders(s, d)),
    "q_distinct_agg" -> ((s, d) => BatchQueries.distinctUsers(s, d)),
    "q_approx_distinct" -> ((s, d) => BatchQueries.approxDistinctUsers(s, d)),
    "q_window_rank" -> ((s, d) => BatchQueries.topOrdersPerPriority(s, d)),
    "q_window_running" -> ((s, d) => BatchQueries.runningQuantity(s, d)),
    "q_rollup" -> ((s, d) => BatchQueries.rollupQuantities(s, d)),
    "q_union_dedup" -> ((s, d) => BatchQueries.unionDistinctUsers(s, d)),
    "q_json_extract" -> ((s, d) => BatchQueries.jsonExtractAgg(s, d)),
    "q_groupby_having" -> ((s, d) => BatchQueries.repeatCustomers(s, d)),
    "q_minmax_by" -> ((s, d) => BatchQueries.topEventPerType(s, d)),
    "q_conditional_agg" -> ((s, d) => BatchQueries.userActivity(s, d)),
    "q_asof_join" -> ((s, d) => AsOf.eventsAsOfOrders(s, d)),
    "q_asof_forward" -> ((s, d) => AsOf.eventsAsOfNextOrders(s, d)),
    "q_pivot" -> ((s, d) => BatchQueries.pivotUserActivity(s, d)),
    "q_percentile" -> ((s, d) => BatchQueries.pricePercentiles(s, d)),
    "q_cube" -> ((s, d) => BatchQueries.cubeQuantities(s, d)),
    "q_above_avg" -> ((s, d) => BatchQueries.aboveAverageOrders(s, d)),
    "q_string_funcs" -> ((s, d) => BatchQueries.customerNameFacts(s, d)),
    "q_date_funcs" -> ((s, d) => BatchQueries.ordersByMonth(s, d)),
    "q_scalar_agg" -> ((s, d) => BatchQueries.lineitemStats(s, d)),
    "q_outer_join" -> ((s, d) => BatchQueries.ordersPerCustomerOuter(s, d)),
    "q_exists_sql" -> ((s, d) => BatchQueries.latePriorityOrders(s, d)),
    "q_set_ops" -> ((s, d) => BatchQueries.userSetOps(s, d)),
    "q_funnel" -> ((s, d) => BatchQueries.signupPurchaseFunnel(s, d)),
    "q_lag_delta" -> ((s, d) => BatchQueries.dailyDeltas(s, d)),
    "q_histogram" -> ((s, d) => BatchQueries.valueHistogram(s, d)),
    "q_range_frame" -> ((s, d) => BatchQueries.trailing30dQuantity(s, d)),
    "q_rank_stats" -> ((s, d) => BatchQueries.orderRankStats(s, d)),
    "q_promo_share" -> ((s, d) => BatchQueries.promoRevenueShare(s, d)),
    "q_heavy_hitters" -> ((s, d) => BatchQueries.heavyHitterUsers(s, d)),
    "q_grouping_sets" -> ((s, d) => BatchQueries.quantityGroupingSets(s, d)),
    "q_range_join" -> ((s, d) => RangeJoin.errorNeighborhood(s, d)),
    "q_array_agg" -> ((s, d) => BatchQueries.ordersPerCustomerArray(s, d)),
    "q_ntile" -> ((s, d) => BatchQueries.priceQuartiles(s, d)),
    "q_latest_per_key" -> ((s, d) => BatchQueries.latestEventPerUser(s, d)),
    "q_stats_agg" -> ((s, d) => BatchQueries.priceStats(s, d)),
    "q_lateral" -> ((s, d) => BatchQueries.topOrdersLateral(s, d)),
    "q_explode_lateral" -> ((s, d) => BatchQueries.tokenLengthHistogram(s, d)),
    "q_sequence_fill" -> ((s, d) => BatchQueries.denseDailySeries(s, d)),
    "q_unpivot" -> ((s, d) => BatchQueries.unpivotQuantities(s, d)),
    "q_multiset_ops" -> ((s, d) => BatchQueries.userMultisetOps(s, d)),
    "q_snapshot_diff" -> ((s, d) => BatchQueries.snapshotDiff(s, d)),
    // §2.3 LLM-pipeline operators
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "dedup_components" -> ((s, d) => Dedup.nearDupComponents(s, d)),
    "q_recursive_cte" -> ((s, d) => Dedup.recursiveCanonicalIds(s, d)),
    // md5-60 lane: oracle-checkable (DuckDB computes identical sigs);
    // production default is the xxhash64/64-bit lane (spec-tested)
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairsOracle(s, d)),
    "dedup_embedding" -> ((s, d) => Similarity.embeddingNearDupPairs(s, d)),
    // SemDeDup-shaped cluster-then-prune (no_oracle: k-means FP in the
    // cluster assignment); the hard signal is the deterministic
    // survivor count + planted-cluster semantics spec
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(s, d)),
    // planted-exact-copy catch rate as ONE deterministic row — the
    // hard per-round signal for the no_oracle SemDeDup lane (the
    // ann_*_recall pattern; catch_rate is 1.0 by construction)
    "dedup_semantic_effect" -> ((s, d) => Similarity.semanticDedupEffect(s, d)),
    "ann_bruteforce" -> ((s, d) => Similarity.annBruteForce(s, d)),
    // dims0 = 64 is the embeddings-table schema constant (TESTDATA.md):
    // threading it through skips the per-call head() inference job.
    "ann_lsh" -> ((s, d) =>
      Similarity.annLshSearch(graft.sources.Tables.embeddings(s, d),
        dims0 = 64)),
    "ann_ivf" -> ((s, d) =>
      Similarity.annIvfSearch(graft.sources.Tables.embeddings(s, d),
        dims0 = 64)),
    // recall@10 of each sketch lane vs the exact lane — the hard
    // per-round signal for the two no_oracle ANN components (one
    // deterministic summary row each; rows-checked)
    "ann_lsh_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      Similarity.annRecallSummary(
        Similarity.annLshSearch(e, nQueries = 10, k = 10, dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    "ann_ivf_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      Similarity.annRecallSummary(
        Similarity.annIvfSearch(e, nQueries = 10, k = 10, dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    // PQ retrieval lane: ADC over pqEncode codes + exact refine of the
    // bounded shortlist (rows-only — codebooks carry k-means FP); its
    // recall row is the hard per-round signal, like the LSH/IVF twins
    "ann_pq" -> ((s, d) =>
      Similarity.annPqSearch(graft.sources.Tables.embeddings(s, d),
        dims0 = 64)),
    "ann_pq_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      Similarity.annRecallSummary(
        Similarity.annPqSearch(e, nQueries = 10, k = 10, dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    // graph-ANN lane (4th index family): layered navigable graph,
    // LSH-candidate kNN build + ring connectivity, beam search.
    // rows-only like the other sketch families; its recall row is
    // the hard per-round signal
    "ann_hnsw" -> ((s, d) => Hnsw.searchLane(s, d)),
    "ann_hnsw_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      Similarity.annRecallSummary(
        Hnsw.searchLane(s, d, nQueries = 10, k = 10),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    // FILTERED retrieval (r13 stretch item 9): a 50 %-selectivity
    // predicate applied DURING search — IVF pushes it into the
    // list scan before top-k; HNSW navigates unfiltered with the
    // beam widened by 1/selectivity and filters the final beam.
    // rows-only like the other sketch lanes; the recall rows against
    // the FILTERED brute force are the hard per-round signals
    "ann_ivf_filtered" -> ((s, d) =>
      Similarity.annIvfSearchFiltered(graft.sources.Tables.embeddings(s, d),
        pmod(xxhash64(col("vec_id")), lit(2L)) === 0, dims0 = 64)),
    "ann_ivf_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0
      Similarity.annRecallSummary(
        Similarity.annIvfSearchFiltered(e, pred, nQueries = 10, k = 10,
          dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    "ann_hnsw_filtered" -> ((s, d) =>
      Hnsw.searchLaneFiltered(s, d,
        pmod(xxhash64(col("vec_id")), lit(2L)) === 0)),
    "ann_hnsw_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0
      Similarity.annRecallSummary(
        Hnsw.searchLaneFiltered(s, d, pred, nQueries = 10, k = 10),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    // filtered retrieval, remaining two families (r14): LSH pushes
    // the predicate into the corpus side of the bucket join and
    // widens probes to Hamming ≤ 2 (multi-probe; radius 1 measured
    // 0.56/0.69 vs 0.95/0.96 at radius 2 under the 50 % predicate);
    // PQ's ADC is exhaustive over the passing set so no widening is
    // needed (measured 0.99/1.00). Same rows-only + recall-signal
    // convention as the IVF/HNSW pair.
    "ann_lsh_filtered" -> ((s, d) =>
      Similarity.annLshSearchFiltered(graft.sources.Tables.embeddings(s, d),
        pmod(xxhash64(col("vec_id")), lit(2L)) === 0, dims0 = 64)),
    "ann_lsh_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0
      Similarity.annRecallSummary(
        Similarity.annLshSearchFiltered(e, pred, nQueries = 10, k = 10,
          dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    "ann_pq_filtered" -> ((s, d) =>
      Similarity.annPqSearchFiltered(graft.sources.Tables.embeddings(s, d),
        pmod(xxhash64(col("vec_id")), lit(2L)) === 0, dims0 = 64)),
    "ann_pq_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0
      Similarity.annRecallSummary(
        Similarity.annPqSearchFiltered(e, pred, nQueries = 10, k = 10,
          dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    // IVF-PQ composite (5th index entry — the two parents composed,
    // the FAISS IndexIVFPQ workhorse): nprobe pruning AND residual-
    // code compression in one layout. rows-only like the other
    // sketch families; the recall rows are the hard per-round signals
    "ann_ivfpq" -> ((s, d) =>
      Similarity.annIvfPqSearch(graft.sources.Tables.embeddings(s, d),
        dims0 = 64)),
    "ann_ivfpq_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      Similarity.annRecallSummary(
        Similarity.annIvfPqSearch(e, nQueries = 10, k = 10, dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    "ann_ivfpq_filtered" -> ((s, d) =>
      Similarity.annIvfPqSearchFiltered(
        graft.sources.Tables.embeddings(s, d),
        pmod(xxhash64(col("vec_id")), lit(2L)) === 0, dims0 = 64)),
    "ann_ivfpq_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0
      Similarity.annRecallSummary(
        Similarity.annIvfPqSearchFiltered(e, pred, nQueries = 10,
          k = 10, dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    // SQ8 — the sixth index family (scalar int8 quantization, no
    // training): FULL oracle, unique among the ANN families (the
    // scale and codes are engine-exact integers)
    "ann_sq8" -> ((s, d) =>
      Similarity.annSq8Search(graft.sources.Tables.embeddings(s, d),
        dims0 = 64)),
    "ann_sq8_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      Similarity.annRecallSummary(
        Similarity.annSq8Search(e, nQueries = 10, k = 10, rerank = 50,
          dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
    }),
    // filtered SQ8 uses a SQL-expressible predicate (vec_id % 2 = 0)
    // instead of the family's xxhash gate, so BOTH filtered lanes stay
    // FULL oracle — the hash gate exists to prove pushdown shapes,
    // which the PQ-placement filtered spec already pins for this
    // family's plan
    "ann_sq8_filtered" -> ((s, d) =>
      Similarity.annSq8SearchFiltered(
        graft.sources.Tables.embeddings(s, d),
        pmod(col("vec_id"), lit(2L)) === 0, dims0 = 64)),
    "ann_sq8_filtered_recall" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      val pred = pmod(col("vec_id"), lit(2L)) === 0
      Similarity.annRecallSummary(
        Similarity.annSq8SearchFiltered(e, pred, nQueries = 10, k = 10,
          rerank = 50, dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10)
    }),
    "text_tokencount" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.qualityScores(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "text_fingerprint_fast" -> ((s, d) =>
      TextAnalysis.fingerprintsFast(graft.sources.Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextAnalysis.languageId(s, d)),
    "text_top_ngrams" -> ((s, d) => TextAnalysis.topNgrams(s, d)),
    // FULL oracle since r17 (integer micro-bits Shannon costs — no
    // float crosses the engine boundary)
    "text_fluency" -> ((s, d) =>
      TextAnalysis.fluencyScores(graft.sources.Tables.documents(s, d))),
    // planted-gibberish margin as ONE summary row — kept as the
    // belt-and-braces signal alongside the now-oracled base lane
    "text_fluency_margin" -> ((s, d) => TextAnalysis.fluencyMargin(s, d)),
    "text_chunk" -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionScores(s, d)),
    "text_normalize" -> ((s, d) => TextAnalysis.normalizeDocs(s, d)),
    "text_pii" -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "decontaminate" -> ((s, d) => TextAnalysis.contamination(s, d)),
    "embed_norms" -> ((s, d) => Similarity.embeddingNorms(s, d)),
    // PQ calibration summary — rows-checked (k-means averages carry
    // partition-order FP; the shape is the signal, see pqCalibration)
    "embed_pq" -> ((s, d) => Similarity.pqCalibration(s, d)),
    // codebook drift detector — the retrain-cadence trigger; two
    // scenario rows whose retrain_recommended 0/1 are the hard signal
    // (rows-checked: k-means FP rides the ratios)
    "pq_drift" -> ((s, d) => Similarity.pqDriftLane(s, d)),
    // SQ8's recalibration signal — clamp-saturation fraction under
    // the stored scale; FULL oracle (max-based scale + integer
    // saturation counts — no k-means FP, unlike pq_drift)
    "sq8_drift" -> ((s, d) => Similarity.sq8DriftLane(s, d)),
    "embed_quantize" -> ((s, d) => Similarity.quantizationError(s, d)),
    "embed_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "embed_mrl" -> ((s, d) => Similarity.mrlRecall(s, d)),
    "curate_corpus" -> ((s, d) => Curation.curateCorpus(s, d)),
    "curate_corpus_v2" -> ((s, d) => Curation.curateCorpusV2(s, d)),
    "sample_hash" -> ((s, d) => Sampling.sampleDocuments(s, d)),
    "sample_split" -> ((s, d) => Sampling.splitCounts(s, d)),
    "sample_stratified" -> ((s, d) => Sampling.stratifiedCounts(s, d)),
    "mm_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_audio_window" -> ((s, d) => Multimodal.audioWindows(s, d)),
    "dedup_segment" -> ((s, d) => Segments.segmentDedup(s, d)),
    "text_boilerplate" -> ((s, d) => Segments.boilerplateScrub(s, d)),
    "seq_pack" -> ((s, d) => Packing.packDocs(s, d)),
    "profile_table" -> ((s, d) => Profile.profileOrders(s, d)),
    // the 100 TB-shaped default lane (HLL++ ndv — no Expand); estimates
    // are engine-specific so this is rows/schema-checked only
    "profile_table_approx" -> ((s, d) => Profile.profileOrdersApprox(s, d)),
    // round 7: temporal/state family + mixture/layout/patch ops
    "q_scd2" -> ((s, d) => Temporal.scd2Intervals(s, d)),
    "q_transition" -> ((s, d) => Temporal.transitionMatrix(s, d)),
    "q_retention" -> ((s, d) => Temporal.cohortRetention(s, d)),
    "q_rolling_distinct" -> ((s, d) => Temporal.rollingDistinctUsers(s, d)),
    "q_merge_upsert" -> ((s, d) => Temporal.mergeUpsert(s, d)),
    "mix_compose" -> ((s, d) => Mixture.composeMixture(s, d)),
    "contamination_report" -> ((s, d) => TextAnalysis.contaminationReport(s, d)),
    "q_zorder" -> ((s, d) => Layout.zorderCells(s, d)),
    "mm_image_patch" -> ((s, d) => Multimodal.patchGrid(s, d)),
    "mm_phash_dedup" -> ((s, d) => Multimodal.phashDedup(s, d)),
    "mm_phash_effect" -> ((s, d) => Multimodal.phashEffect(s, d)),
    // round 7b: retrieval/relevance family + outlier detection
    "text_tfidf" -> ((s, d) => Relevance.tfidfKeywords(s, d)),
    "text_search_bm25" -> ((s, d) => Relevance.bm25Search(s, d)),
    // hybrid retrieval: BM25 top-20 + cosine top-20 fused by
    // reciprocal-rank fusion (rank-only, so the arms' incomparable
    // score scales never meet) — full oracle
    "search_hybrid_rrf" -> ((s, d) => Relevance.hybridSearchRrf(s, d)),
    "search_mmr" -> ((s, d) => Relevance.mmrDiversify(s, d)),
    // the composed serving stack: arms -> RRF -> proximity rerank ->
    // MMR, one lane whose oracle crosses every stage seam
    "search_pipeline" -> ((s, d) => Relevance.searchPipeline(s, d)),
    // the probe-backed twin: postings-index lex arm + IVF-PQ sem arm
    // (no_oracle — approximate sem arm; parity floors spec'd)
    "search_pipeline_indexed" -> ((s, d) =>
      Relevance.searchPipelineIndexedLane(s, d)),
    "search_rerank" -> ((s, d) => Relevance.rerankProximity(s, d)),
    "idx_postings" -> ((s, d) => Relevance.postings(s, d)),
    "q_outlier" -> ((s, d) => BatchQueries.valueOutliers(s, d)),
    // round 7c: governance + affinity family
    "q_purge_cascade" -> ((s, d) => Governance.purgeAudit(s, d)),
    "split_cluster_safe" -> ((s, d) => Governance.clusterSafeSplitDocs(s, d)),
    "dedup_keep_best" -> ((s, d) => Governance.keepBestDocs(s, d)),
    "dedup_incremental" -> ((s, d) => Governance.incrementalDedupDocs(s, d)),
    "q_basket_pairs" -> ((s, d) => Affinity.partPairs(s, d)),
    "q_robust_scale" -> ((s, d) => BatchQueries.robustScaledPrices(s, d)),
    "q_skyline" -> ((s, d) => Skyline.partFrontier(s, d)),
    "q_path_topk" -> ((s, d) => Temporal.pathTopK(s, d)),
    // round 7d: data-quality gates + fuzzy matching + OLS fit
    "dq_expectations" -> ((s, d) => QualityChecks.lineitemExpectations(s, d)),
    "dq_key_skew" -> ((s, d) => QualityChecks.lineitemKeySkew(s, d)),
    "dq_join_cardinality" ->
      ((s, d) => QualityChecks.lineitemOrdersJoinCard(s, d)),
    "dq_referential" -> ((s, d) => QualityChecks.referentialGate(s, d)),
    "dq_profile_drift" -> ((s, d) => QualityChecks.ordersProfileDrift(s, d)),
    "graph_triangles" -> ((s, d) => Graph.supplierTriangles(s, d)),
    "graph_jaccard" -> ((s, d) => Graph.supplierLinkPrediction(s, d)),
    "graph_kcore" -> ((s, d) => Graph.nearDupCore(s, d)),
    "q_decay_sum" -> ((s, d) => Temporal.decayedActivity(s, d)),
    "q_attribution" -> ((s, d) => Temporal.lastTouchAttribution(s, d)),
    "text_simpson" -> ((s, d) => TextAnalysis.simpsonDiversity(s, d)),
    "text_collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    "sample_fixed" -> ((s, d) => Sampling.fixedDocuments(s, d)),
    "q_linreg" -> ((s, d) => BatchQueries.linearFit(s, d)),
    "dedup_fuzzy" -> ((s, d) => Fuzzy.customerNamePairs(s, d)),
    "graph_pagerank" -> ((s, d) => Graph.transactionPageRank(s, d)),
    "graph_degree" -> ((s, d) => Graph.degreeHistogram(s, d)),
    "sample_weighted" -> ((s, d) => Sampling.weightedDocuments(s, d)),
    "dedup_fuzzy_scored" -> ((s, d) => Fuzzy.scoredCustomerNamePairs(s, d)),
    "q_interval_merge" -> ((s, d) => Temporal.intervalCoverage(s, d)),
    "curate_dsir" -> ((s, d) => Importance.dsirSelect(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringProfile(s, d)),
    "embed_pca" -> ((s, d) => Similarity.pcaSummary(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containedDocuments(s, d)),
    "curate_gopher" -> ((s, d) => TextAnalysis.gopherSummary(s, d)),
    "text_entropy" -> ((s, d) => TextAnalysis.tokenEntropy(s, d)),
    "mix_token_budget" -> ((s, d) => Mixture.tokenBudgetMixture(s, d)),
    "sample_temperature" -> ((s, d) => Mixture.temperatureSample(s, d)),
    // DoReMi-style multiplicative-weights domain reweight (linearized
    // MW form -- exp is transcendental, the T=2 sqrt precedent);
    // loss proxied by token count, full oracle
    "mix_doremi" -> ((s, d) => Mixture.doremiMixture(s, d)),
    "graph_lpa" -> ((s, d) => Graph.supplierCommunities(s, d)),
    "curate_dsir_hashed" -> ((s, d) => Importance.dsirSelectHashed(s, d)),
    "dedup_substring_scrub" -> ((s, d) => Dedup.substringScrubbed(s, d)),
    "graph_lpa_modularity" -> ((s, d) => Graph.lpaModularity(s, d)),
    // incremental SEMANTIC dedup (delta-vs-persisted-IVF probe): the
    // dedup_semantic_effect pattern — planted exact copies MUST tag
    // semantic_dup (catch rate 1.0 by construction, spec'd); rows-
    // checked (no_oracle: k-means FP in the coarse assignment)
    "dedup_semantic_inc" -> ((s, d) => Similarity.semanticDeltaEffect(s, d)),
    "mix_epochs" -> ((s, d) => Mixture.epochMixture(s, d)),
    "mix_shard_shuffle" -> ((s, d) => Mixture.shardShuffleAssign(s, d)),
    // curriculum (sequence-length warmup) sharding: phase-major order,
    // shuffled within phase — full oracle via a global row_number
    "mix_curriculum" -> ((s, d) => Mixture.curriculumAssign(s, d)),
    "mix_anneal" -> ((s, d) => Mixture.annealMixture(s, d)),
    "curate_c4" -> ((s, d) => TextAnalysis.c4Summary(s, d)),
    "dedup_embedding_audit" -> ((s, d) => Similarity.embeddingAuditRate(s, d)),
    "curate_ppl_buckets" -> ((s, d) => Curation.pplBuckets(s, d)),
    "curate_ppl_buckets_v2" -> ((s, d) => Curation.pplBucketsV2(s, d)),
    "curate_classifier" -> ((s, d) => Classifier.classifierSelect(s, d)),
    "curate_classifier_hashed" ->
      ((s, d) => Classifier.classifierSelectHashed(s, d)),
    "text_readability" -> ((s, d) => TextAnalysis.readabilityScores(s, d)),
    "dedup_priority" -> ((s, d) => Governance.priorityDedupDocs(s, d)),
    // benchmark-vs-corpus semantic leakage: planted-exact-copy catch
    // rate 1.0 by construction (spec'd floor); rows-checked
    // (no_oracle: k-means FP in the benchmark index's coarse
    // assignment)
    "decontaminate_semantic" ->
      ((s, d) => Similarity.semanticDecontaminateEffect(s, d)),
    // exact high-τ cosine pairs (triangle-inequality cluster prune —
    // clustering affects cost only, the pair set is exact): planted
    // cos=1.0 copies keep the lane non-empty on the isotropic corpus
    "dedup_embedding_exact_hi" -> ((s, d) => Similarity.exactHighTauPairs(s, d)),
    "tok_bpe_train" -> ((s, d) => Bpe.trainLane(s, d)),
    "tok_count_bpe" -> ((s, d) => Bpe.countLane(s, d)),
    "mix_token_budget_bpe" -> ((s, d) => Bpe.budgetLane(s, d)),
    "seq_pack_bpe" -> ((s, d) => Packing.packDocsBpe(s, d)),
    "text_chunk_bpe" -> ((s, d) => Bpe.chunkDocsBpe(s, d)),
    // per-doc token-ID SEQUENCES (not just counts) — what a training
    // pipeline writes to disk; full oracle via the same unrolled CTEs
    "tok_encode_bpe" -> ((s, d) => Bpe.encodeLane(s, d)),
    // GPT-2-shape byte-level BPE (byte remap + regex pre-tokenizer)
    "tok_encode_bpe_bytes" -> ((s, d) => BpeBytes.encodeLane(s, d)),
    // unigram-LM (SentencePiece-shape) family: the MDL (Shannon-bit)
    // vocab + Viterbi encode are FULL oracle (integer costs via exact
    // bit algebra); the EM trainer is FP-iterative -> no_oracle with
    // spec'd recovery/monotonicity signals
    "tok_unigram_vocab" -> ((s, d) => Unigram.vocabLane(s, d)),
    "tok_encode_unigram" -> ((s, d) => Unigram.encodeLane(s, d)),
    "tok_unigram_train" -> ((s, d) => Unigram.trainLane(s, d)))

  /** DuckDB oracle twins. Keys absent here (approx sketches, LSH
    * buckets, simhash) get rows-only checks — their semantics are
    * engine-specific by design (see SURVEY §2 [s] rows).
    */
  def oracleSql: Map[String, String] = Map(
    // countOcc is pure integer string-length algebra, so the marker
    // heuristic has an exact cross-engine twin. Spark's
    // greatest(struct(score, lang)) = max by (score, lang) ⟹
    // ORDER BY score DESC, lang DESC picks the same winner.
    "text_langid" ->
      """WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS t
                    FROM documents),
         s AS (SELECT doc_id, lang AS lang_label, unnest([
           {'score': CAST((length(t)-length(replace(t,' the ','')))/5 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' and ','')))/5 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' of ','')))/4 AS BIGINT),
            'lang': 'en'},
           {'score': CAST((length(t)-length(replace(t,' el ','')))/4 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' la ','')))/4 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' de ','')))/4 AS BIGINT),
            'lang': 'es'},
           {'score': CAST((length(t)-length(replace(t,' der ','')))/5 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' und ','')))/5 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' die ','')))/5 AS BIGINT),
            'lang': 'de'},
           {'score': CAST((length(t)-length(replace(t,' le ','')))/4 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' et ','')))/4 AS BIGINT)
                   + CAST((length(t)-length(replace(t,' les ','')))/5 AS BIGINT),
            'lang': 'fr'},
           {'score': CAST((length(t)-length(replace(t,'的','')))/1 AS BIGINT)
                   + CAST((length(t)-length(replace(t,'是','')))/1 AS BIGINT)
                   + CAST((length(t)-length(replace(t,'了','')))/1 AS BIGINT),
            'lang': 'zh'}]) AS sc FROM p),
         r AS (SELECT doc_id, lang_label, sc.lang AS lang_pred,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY sc.score DESC, sc.lang DESC) AS rk FROM s)
         SELECT doc_id, lang_label, lang_pred FROM r WHERE rk = 1""",
    // Integer-bits fluency (TextAnalysis.fluencyScoresAgainst): the
    // whole chain is integer algebra — ceil-div + bin() bit lengths
    // for profile costs, bitlen(T)+8 floor, and a round-half-up
    // integer division for the micro-bit mean — so Spark and DuckDB
    // agree bit-for-bit. Bigram extraction mirrors CharBigramSet's
    // short-text contract (len 0 -> [''], len 1 -> [text]); per-doc
    // DISTINCT; profile ties break on binary collation (lane corpora
    // are ASCII by contract). generate_series is inclusive, so
    // greatest(len-1, 1) yields exactly one i for short docs.
    "text_fluency" ->
      """WITH bgall AS MATERIALIZED (
           SELECT DISTINCT doc_id,
             CASE WHEN length(text) < 2 THEN text
                  ELSE substr(text, CAST(i AS INT), 2) END AS bg
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1,
                     greatest(length(text) - 1, 1))) AS i
                 FROM documents)),
         cnts AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n
                  FROM bgall GROUP BY bg),
         tt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnts),
         prof AS (SELECT bg,
             CAST(CASE WHEN q <= 1 THEN 0
                  ELSE length(bin(q - 1)) END AS BIGINT) AS cost_bits
           FROM (SELECT bg, (t + n - 1) // n AS q,
                   row_number() OVER (ORDER BY n DESC, bg) AS rk
                 FROM cnts, tt)
           WHERE rk <= 2000),
         fl AS (SELECT CAST(length(bin(t)) + 8 AS BIGINT) AS fcost
                FROM tt)
         SELECT b.doc_id,
           CAST(-((2 * 1000000 * SUM(COALESCE(p.cost_bits, fl.fcost))
              + COUNT(*)) // (2 * COUNT(*))) AS BIGINT) AS fluency_micro,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams
         FROM bgall b LEFT JOIN prof p USING (bg), fl
         GROUP BY b.doc_id""",
    "q_edit_window" ->
      """SELECT event_type,
         epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS win_start,
         epoch_us(time_bucket(INTERVAL '5 minutes', ts)) + 300000000 AS win_end,
         ROUND(SUM(ABS(value)), 2) AS edit_size,
         COUNT(*) AS n_edits
         FROM events WHERE lower(event_type) <> 'error'
         GROUP BY 1, 2, 3""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey,
         ROUND(l_extendedprice * (1.0 - l_discount), 4) AS net_price,
         CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem
         WHERE l_discount > 0.05
           AND l_shipdate >= TIMESTAMP '1999-01-01'
           AND l_shipdate < TIMESTAMP '1999-04-01'""",
    "q_sliding_window" ->
      """SELECT event_type,
         epoch_us(time_bucket(INTERVAL '5 minutes', ts)) - s.off AS win_start,
         ROUND(SUM(ABS(value)), 2) AS edit_size, COUNT(*) AS n_edits
         FROM events, (SELECT unnest([0, 300000000]) AS off) s
         WHERE lower(event_type) <> 'error'
         GROUP BY 1, 2""",
    "q_session_window" ->
      """WITH g AS (
           SELECT user_id, event_id, value, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         s AS (
           SELECT user_id, t_us, value,
             SUM(CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
           MIN(t_us) AS session_start, MAX(t_us) AS session_end,
           ROUND(SUM(value), 2) AS session_value
         FROM s GROUP BY user_id, sid""",
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q_topn_join" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_multijoin" ->
      """SELECT n_name,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_supp, ROUND(SUM(s_acctbal), 2) AS total_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q_semi_anti_join" ->
      """SELECT 'with_orders' AS grp, COUNT(*) AS n FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)
         UNION ALL
         SELECT 'no_orders' AS grp, COUNT(*) AS n FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "q_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
         COUNT(*) AS n_events FROM events GROUP BY event_type""",
    "q_window_rank" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
         FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING), 1) AS running_qty
         FROM lineitem""",
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         COALESCE(l_linestatus, 'ALL') AS linestatus,
         ROUND(SUM(l_quantity), 1) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q_union_dedup" ->
      """SELECT user_id FROM events WHERE event_type = 'error'
         UNION
         SELECT user_id FROM events WHERE event_type = 'purchase'""",
    "q_json_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         COUNT(json_extract_string(props, '$.k')) AS n_k
         FROM events GROUP BY event_type""",
    "q_groupby_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS total_spent
         FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5""",
    "q_minmax_by" ->
      """SELECT event_type, event_id AS top_event, value AS top_value
         FROM (SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type
             ORDER BY value DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",
    "q_conditional_agg" ->
      """SELECT user_id,
         ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         COUNT(*) AS n
         FROM events GROUP BY user_id""",
    "q_asof_join" ->
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
           SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           FROM events e LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
         WHERE rn = 1""",
    "q_asof_forward" ->
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
           SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
           FROM events e LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts) t
         WHERE rn = 1""",
    "q_pivot" ->
      """SELECT user_id,
         ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
         ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
         ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
         ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
         ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 2) AS view
         FROM events GROUP BY user_id""",
    "q_percentile" ->
      """SELECT o_orderpriority,
         ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median,
         ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
         FROM orders GROUP BY o_orderpriority""",
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         COALESCE(l_linestatus, 'ALL') AS linestatus,
         ROUND(SUM(l_quantity), 1) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q_above_avg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above,
         ROUND(MAX(o_totalprice), 2) AS max_price
         FROM orders o JOIN (SELECT o_custkey AS ck, AVG(o_totalprice) AS cust_avg
                             FROM orders GROUP BY o_custkey) a
           ON o.o_custkey = a.ck
         WHERE o.o_totalprice > a.cust_avg
         GROUP BY o_orderpriority""",
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_mktsegment) AS segment_u,
         substring(c_name, 1, 8) AS name_prefix,
         c_name || '#' || CAST(c_nationkey AS VARCHAR) AS tagged,
         CAST(length(c_name) AS BIGINT) AS name_len
         FROM customer WHERE c_name LIKE '%7%'""",
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1, 2""",
    "q_scalar_agg" ->
      """SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT l_orderkey) AS n_orders,
         ROUND(MIN(l_extendedprice), 2) AS min_price,
         ROUND(MAX(l_extendedprice), 2) AS max_price,
         ROUND(AVG(l_quantity), 4) AS avg_qty
         FROM lineitem""",
    "q_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         ROUND(SUM(COALESCE(o_totalprice, 0.0)), 2) AS spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q_funnel" ->
      """WITH fs AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us
                     FROM events WHERE event_type = 'signup' GROUP BY user_id),
         p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
               WHERE event_type = 'purchase'),
         per_user AS (
           SELECT fs.user_id, fs.signup_us,
             CAST(SUM(CASE WHEN p.p_us > fs.signup_us THEN 1 ELSE 0 END)
               AS BIGINT) AS n_after
           FROM fs LEFT JOIN p ON fs.user_id = p.user_id
           GROUP BY fs.user_id, fs.signup_us)
         SELECT CAST(floor(signup_us / 86400000000) AS BIGINT) AS cohort_day,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN n_after > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted
         FROM per_user GROUP BY 1""",
    "q_lag_delta" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             ROUND(SUM(value), 2) AS total
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, total,
           ROUND(total - COALESCE(lag(total) OVER (PARTITION BY event_type
             ORDER BY day), 0.0), 2) AS delta
         FROM daily""",
    "q_histogram" ->
      """SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bucket,
         COUNT(*) AS n FROM events GROUP BY 1, 2""",
    "q_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY epoch_us(l_shipdate)
           RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW), 1)
           AS qty_30d
         FROM lineitem""",
    "q_rank_stats" ->
      """SELECT o_orderpriority, o_orderkey,
         ROUND(percent_rank() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
         ROUND(cume_dist() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey), 6) AS cume
         FROM orders""",
    "q_promo_share" ->
      """SELECT ship_month, promo_revenue, total_revenue,
         ROUND(promo_revenue * 100.0 / total_revenue, 4) AS promo_share
         FROM (
           SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             ROUND(SUM(CASE WHEN p_type = 'PROMO'
               THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
               AS promo_revenue,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4)
               AS total_revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1)""",
    "q_heavy_hitters" ->
      """SELECT user_id, n_rows,
         ROUND(n_rows * 100.0 / (SELECT COUNT(*) FROM events), 4) AS share_pct
         FROM (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1)
         ORDER BY n_rows DESC, user_id LIMIT 15""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())""",
    "q_range_join" ->
      """SELECT e.event_id AS err_id,
         COUNT(*) AS n_nearby,
         ROUND(SUM(p.value), 2) AS sum_value
         FROM events e JOIN events p
           ON p.user_id = e.user_id
          AND epoch_us(p.ts) >= epoch_us(e.ts) - 600000000
          AND epoch_us(p.ts) <  epoch_us(e.ts) + 600000000
         WHERE lower(e.event_type) = 'error'
           AND lower(p.event_type) <> 'error'
         GROUP BY 1""",
    "q_stats_agg" ->
      """SELECT l_returnflag,
         ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
         ROUND(var_samp(l_quantity), 4) AS var_qty,
         ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1""",
    "q_array_agg" ->
      """SELECT o_custkey,
         array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
         COUNT(*) AS n_orders
         FROM orders GROUP BY 1""",
    "q_ntile" ->
      """SELECT o_orderpriority, quartile,
         COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
         FROM (SELECT o_orderpriority, o_totalprice,
                 ntile(4) OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS quartile
               FROM orders)
         GROUP BY 1, 2""",
    "q_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1""",
    "q_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         FROM customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         WHERE c.c_mktsegment = 'BUILDING'""",
    "q_explode_lateral" ->
      """SELECT lang, CAST(length(tok) AS BIGINT) AS tok_len, COUNT(*) AS n
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
               FROM documents) u
         GROUP BY 1, 2""",
    "q_sequence_fill" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             ROUND(SUM(value), 2) AS total, COUNT(*) AS n_events
           FROM events GROUP BY 1, 2),
         spans AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
                   FROM daily GROUP BY 1),
         cal AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day
                 FROM spans)
         SELECT c.event_type, c.day, COALESCE(d.total, 0.0) AS total,
           COALESCE(d.n_events, 0) AS n_events
         FROM cal c LEFT JOIN daily d
           ON c.event_type = d.event_type AND c.day = d.day""",
    "text_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
         p AS (SELECT doc_id, t,
             CASE WHEN len(t) > 32 THEN (len(t) - 32 + 23) // 24
                  ELSE 0 END AS n_extra FROM d),
         u AS (SELECT doc_id, t, unnest(range(0, n_extra + 1)) AS s FROM p)
         SELECT doc_id, CAST(s AS BIGINT) AS chunk_id,
           CAST(len(t[s*24+1 : s*24+32]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[s*24+1 : s*24+32], ' ')) AS chunk_md5
         FROM u""",
    "text_repetition" ->
      """WITH g AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             i -> array_to_string(t[i:i+1], ' '))) AS gram
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 2) d),
         c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
           CAST(MAX(c) AS BIGINT) AS top_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_share
         FROM c GROUP BY 1""",
    "decontaminate" ->
      """WITH s AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' ')))) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         b AS (SELECT DISTINCT g FROM s WHERE doc_id % 20 = 0)
         SELECT doc_id, COUNT(*) AS n_shared
         FROM s JOIN b USING (g) WHERE doc_id % 20 <> 0 GROUP BY 1""",
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
         UNION ALL
         SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a""",
    "q_multiset_ops" ->
      """SELECT 'intersect_all' AS op, user_id, COUNT(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           INTERSECT ALL
           SELECT user_id FROM events WHERE event_type = 'purchase') t
         GROUP BY 2
         UNION ALL
         SELECT 'except_all' AS op, user_id, COUNT(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           EXCEPT ALL
           SELECT user_id FROM events WHERE event_type = 'purchase') t2
         GROUP BY 2""",
    "q_snapshot_diff" ->
      """WITH a AS (SELECT o_orderkey AS k,
           md5(CAST(o_orderpriority AS VARCHAR) ||
               CAST(o_totalprice AS VARCHAR)) AS sig
           FROM orders WHERE o_orderkey % 10 <> 0),
         b0 AS (SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN ROUND(o_totalprice + 1.0, 2)
                ELSE o_totalprice END AS o_totalprice, o_orderpriority
           FROM orders WHERE o_orderkey % 10 <> 1),
         b AS (SELECT o_orderkey AS k,
           md5(CAST(o_orderpriority AS VARCHAR) ||
               CAST(o_totalprice AS VARCHAR)) AS sig FROM b0)
         SELECT o_orderkey, status FROM (
           SELECT COALESCE(a.k, b.k) AS o_orderkey,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.sig <> b.sig THEN 'changed' END AS status
           FROM a FULL OUTER JOIN b ON a.k = b.k) d
         WHERE status IS NOT NULL""",
    "embed_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(r - 1 AS BIGINT) AS dim,
         ROUND(AVG(embedding[r]::DOUBLE), 6) AS mean_v, COUNT(*) AS n
         FROM (SELECT label, embedding,
                 unnest(range(1, len(embedding) + 1)) AS r
               FROM embeddings) t
         GROUP BY 1, 2""",
    "text_normalize" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5,
         CAST(len(string_split(trim(regexp_replace(regexp_replace(
           lower(text), '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g')),
           ' ')) AS BIGINT) AS n_norm_tokens
         FROM documents""",
    "text_pii" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text,
           '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
         CAST(len(regexp_extract_all(text,
           '\+?\d[\d()\- ]{7,}\d')) AS BIGINT) AS n_phones,
         md5(regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
           '\+?\d[\d()\- ]{7,}\d', '<PHONE>', 'g')) AS scrubbed_md5
         FROM documents""",
    "embed_quantize" ->
      """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS e,
           GREATEST(list_max(embedding::DOUBLE[]),
             -list_min(embedding::DOUBLE[])) / 127.0 AS scale
           FROM embeddings)
         SELECT vec_id, ROUND(scale, 6) AS q_scale,
           CASE WHEN scale = 0 THEN 0.0 ELSE
             ROUND(list_aggregate(list_transform(e,
               v -> abs(v - round(v/scale)*scale)), 'sum') / len(e), 6)
           END AS mean_abs_err
         FROM s""",
    "embed_norms" ->
      """SELECT vec_id,
         ROUND(sqrt(list_inner_product(embedding::DOUBLE[],
           embedding::DOUBLE[])), 4) AS l2_norm,
         ROUND(GREATEST(list_max(embedding::DOUBLE[]),
           -list_min(embedding::DOUBLE[])), 6) AS max_abs,
         CAST(len(embedding) AS BIGINT) AS dims
         FROM embeddings""",
    "text_top_ngrams" ->
      """SELECT gram, COUNT(*) AS df FROM (
           SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' ')))) AS gram
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d)
         GROUP BY 1 ORDER BY df DESC, gram LIMIT 20""",
    "q_exists_sql" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority""",
    "q_set_ops" ->
      """SELECT 'both' AS grp, COUNT(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           INTERSECT
           SELECT user_id FROM events WHERE event_type = 'purchase') t
         UNION ALL
         SELECT 'click_only' AS grp, COUNT(*) AS n FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           EXCEPT
           SELECT user_id FROM events WHERE event_type = 'purchase') t2""",
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
         COUNT(*) AS n_copies FROM documents GROUP BY md5(text)""",
    "dedup_ngram_jaccard" ->
      """WITH s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d)
         SELECT id_a, id_b, jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
           FROM s a JOIN s b ON a.doc_id < b.doc_id) p
         WHERE jaccard >= 0.5""",
    // identical near-dup pair graph (the dedup_ngram_jaccard CTE),
    // then the SAME peeling recurrence unrolled 6 rounds: drop nodes
    // with < 2 surviving neighbors, restrict edges, repeat. Rounds
    // past the fixpoint are idempotent, so the fixed unrolling equals
    // the Spark side's early-exit loop for ANY input, and the final
    // degree >= k filter makes even a non-converged bound coincide.
    // MATERIALIZED is load-bearing: DuckDB 1.0 inlines a CTE at each
    // reference, and every round references the prior round 3 times,
    // so the plain form expands to ~3^6 scans of the base pair join
    // and dies on fd exhaustion (the r8 "Too many open files").
    "graph_kcore" ->
      """WITH s AS MATERIALIZED (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         e0 AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
           FROM s a JOIN s b ON a.doc_id < b.doc_id) p
           WHERE jaccard >= 0.5),
         d1 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e0
           UNION ALL SELECT v AS node FROM e0) GROUP BY 1),
         e1 AS MATERIALIZED (SELECT u, v FROM e0
           WHERE u IN (SELECT node FROM d1 WHERE d >= 2)
             AND v IN (SELECT node FROM d1 WHERE d >= 2)),
         d2 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e1
           UNION ALL SELECT v AS node FROM e1) GROUP BY 1),
         e2 AS MATERIALIZED (SELECT u, v FROM e1
           WHERE u IN (SELECT node FROM d2 WHERE d >= 2)
             AND v IN (SELECT node FROM d2 WHERE d >= 2)),
         d3 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e2
           UNION ALL SELECT v AS node FROM e2) GROUP BY 1),
         e3 AS MATERIALIZED (SELECT u, v FROM e2
           WHERE u IN (SELECT node FROM d3 WHERE d >= 2)
             AND v IN (SELECT node FROM d3 WHERE d >= 2)),
         d4 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e3
           UNION ALL SELECT v AS node FROM e3) GROUP BY 1),
         e4 AS MATERIALIZED (SELECT u, v FROM e3
           WHERE u IN (SELECT node FROM d4 WHERE d >= 2)
             AND v IN (SELECT node FROM d4 WHERE d >= 2)),
         d5 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e4
           UNION ALL SELECT v AS node FROM e4) GROUP BY 1),
         e5 AS MATERIALIZED (SELECT u, v FROM e4
           WHERE u IN (SELECT node FROM d5 WHERE d >= 2)
             AND v IN (SELECT node FROM d5 WHERE d >= 2)),
         d6 AS MATERIALIZED (SELECT node, COUNT(*) d FROM (SELECT u AS node FROM e5
           UNION ALL SELECT v AS node FROM e5) GROUP BY 1),
         e6 AS MATERIALIZED (SELECT u, v FROM e5
           WHERE u IN (SELECT node FROM d6 WHERE d >= 2)
             AND v IN (SELECT node FROM d6 WHERE d >= 2))
         SELECT node AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
         FROM (SELECT u AS node FROM e6 UNION ALL SELECT v AS node FROM e6)
         GROUP BY 1 HAVING COUNT(*) >= 2""",
    "dedup_minhash_lsh" ->
      """WITH s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d)
         SELECT id_a, id_b, jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
           FROM s a JOIN s b ON a.doc_id < b.doc_id) p
         WHERE jaccard >= 0.8""",
    // Identical md5-60 SimHash recomputed from scratch: per token the
    // first 15 hex chars of md5 are an exact 60-bit integer on both
    // engines; bit i lives in hex char 15 - i//4 at in-digit bit i%4.
    // Brute-force all pairs at Hamming <= 3 — the Spark side's
    // 4x15-bit block LSH is EXHAUSTIVE at that distance by pigeonhole,
    // so the row sets coincide (no recall gap to excuse).
    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents),
         h AS (SELECT doc_id, md5(t) AS h FROM tok),
         bt AS (SELECT doc_id, h, unnest(range(0, 60)) AS bit FROM h),
         sgn AS (SELECT doc_id, bit,
             CASE WHEN ((strpos('0123456789abcdef',
                 substr(h, CAST(15 - bit // 4 AS INTEGER), 1)) - 1)
                 >> (bit % 4)) & 1 = 1 THEN 1 ELSE -1 END AS sg
           FROM bt),
         s AS (SELECT doc_id, bit, SUM(sg) AS s FROM sgn GROUP BY 1, 2),
         sig AS (SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit)
                           ELSE 0 END) AS BIGINT) AS sig
           FROM s GROUP BY 1)
         SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b2.sig)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b2 ON a.doc_id < b2.doc_id
         WHERE bit_count(xor(a.sig, b2.sig)) <= 3""",
    "dedup_components" ->
      """WITH RECURSIVE
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
             AS canonical_id
         FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
         GROUP BY d.doc_id""",
    "q_recursive_cte" ->
      """WITH RECURSIVE
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v, d) AS (
           SELECT u, v, 1 FROM edges
           UNION ALL
           SELECT r.u, e.v, r.d + 1 FROM reach r JOIN edges e ON r.v = e.u
           WHERE r.d < 6),
         canon AS (SELECT u, MIN(v) AS mn FROM reach GROUP BY u)
         SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(c.mn, d.doc_id)) AS BIGINT)
             AS canonical_id
         FROM documents d LEFT JOIN canon c ON d.doc_id = c.u""",
    "dedup_embedding" ->
      """SELECT id_a, id_b, cos_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
         WHERE cos_sim >= 0.45""",
    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos_sim
           FROM q, embeddings e WHERE e.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rank FROM c) t
         WHERE rank <= 5""",
    "text_tokencount" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_re_tokens
         FROM documents""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROUND(CAST(len(list_filter(string_split(text, ' '),
           t -> list_contains(['the','a','of','and','to','in','is','it','on','for'], t))) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS stop_ratio,
         ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS uniq_ratio,
         ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS mean_tok_len,
         ROUND((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' '))) *
           (1.0 - CAST(len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','a','of','and','to','in','is','it','on','for'], t))) AS DOUBLE)
             / len(string_split(text, ' '))), 6) AS quality_score
         FROM documents""",
    "text_fingerprint" ->
      """SELECT doc_id,
         list_min(list_transform(range(1, len(t) - 6),
           i -> md5(array_to_string(t[i:i+7], ' ')))) AS fingerprint
         FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
               WHERE len(string_split(text, ' ')) >= 8) d""",
    "curate_corpus" ->
      """WITH RECURSIVE
         exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents
                        GROUP BY md5(text)),
         d AS (SELECT doc_id, text, lang FROM documents
               WHERE doc_id IN (SELECT doc_id FROM exact_keep)),
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM d
                 WHERE len(string_split(text, ' ')) >= 4) dd),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         canon AS (SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS canonical
           FROM d LEFT JOIN reach r ON d.doc_id = r.u
           GROUP BY d.doc_id),
         q AS (SELECT d.doc_id, d.lang,
             len(string_split(d.text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE) /
               len(string_split(d.text, ' ')) AS uniq_ratio
           FROM d JOIN canon c ON d.doc_id = c.doc_id
           WHERE c.doc_id = c.canonical)
         SELECT doc_id, lang,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  IN ('0','1','2','3','4','5','6','7','8','9','a','b','c','d')
                THEN 'train' ELSE 'val' END AS split,
           CAST(n_tokens AS BIGINT) AS n_tokens
         FROM q WHERE uniq_ratio >= 0.2 AND n_tokens >= 20""",
    "curate_corpus_v2" ->
      """WITH RECURSIVE
         exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents
                        GROUP BY md5(text)),
         d AS (SELECT doc_id, text, lang FROM documents
               WHERE doc_id IN (SELECT doc_id FROM exact_keep)),
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM d
                 WHERE len(string_split(text, ' ')) >= 4) dd),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         canon AS (SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS canonical
           FROM d LEFT JOIN reach r ON d.doc_id = r.u
           GROUP BY d.doc_id),
         q AS (SELECT d.doc_id, d.lang,
             len(string_split(d.text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE) /
               len(string_split(d.text, ' ')) AS uniq_ratio
           FROM d JOIN canon c ON d.doc_id = c.doc_id
           WHERE c.doc_id = c.canonical),
         curated AS (
           SELECT doc_id, lang,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('0','1','2','3','4','5','6','7','8','9','a','b','c','d')
                  THEN 'train' ELSE 'val' END AS split,
             n_tokens
           FROM q WHERE uniq_ratio >= 0.2 AND n_tokens >= 20)
         SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         FROM curated
         WHERE strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
               < (CASE lang WHEN 'en' THEN 8 WHEN 'es' THEN 12 ELSE 16 END)
         GROUP BY 1, 2""",
    "sample_hash" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')""",
    "mm_audio_window" ->
      """SELECT doc_id, n_samples, win_idx,
         win_idx * 40 AS start_sample, win_idx * 10 AS start_ms
         FROM (SELECT doc_id, n_samples, unnest(range(0, nw)) AS win_idx
               FROM (SELECT doc_id, strlen(text) // 2 AS n_samples,
                       (strlen(text) // 2 - 100) // 40 + 1 AS nw
                     FROM documents WHERE strlen(text) // 2 >= 100) a) b""",
    "sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_docs FROM documents
         WHERE strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
               < (CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 16
                            WHEN 'es' THEN 8 ELSE 16 END)
         GROUP BY 1""",
    "sample_split" ->
      """SELECT lang,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7','8','9','a','b','c','d')
              THEN 'train' ELSE 'val' END AS split,
         COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1, 2""",
    "mm_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS payload_md5,
         CAST((doc_id % 64 + 1) * 8 AS BIGINT) AS width,
         CAST((doc_id % 48 + 1) * 8 AS BIGINT) AS height,
         CAST((doc_id % 64 + 1) * 8 * ((doc_id % 48 + 1) * 8) AS BIGINT) AS n_pixels
         FROM documents""",
    "dedup_segment" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         segs AS (SELECT doc_id, g.i AS seg_idx,
             array_to_string(t[(g.i*10+1):(g.i*10+10)], ' ') AS seg
           FROM toks,
             LATERAL (SELECT unnest(range((len(t)+9)//10)) AS i) g),
         win AS (SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg
               ORDER BY doc_id, seg_idx) AS rn
           FROM segs)
         SELECT doc_id, COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END,
             ' ' ORDER BY seg_idx), '')) AS dedup_md5
         FROM win GROUP BY doc_id""",
    "text_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
         segs AS (SELECT doc_id, g.i AS seg_idx,
             array_to_string(t[(g.i*10+1):(g.i*10+10)], ' ') AS seg
           FROM toks,
             LATERAL (SELECT unnest(range((len(t)+9)//10)) AS i) g),
         freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS seg_df
                  FROM segs GROUP BY 1)
         SELECT s.doc_id, COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN f.seg_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           md5(COALESCE(string_agg(CASE WHEN f.seg_df < 2 THEN s.seg END,
             ' ' ORDER BY s.seg_idx), '')) AS clean_md5
         FROM segs s JOIN freq f ON s.seg = f.seg
         GROUP BY s.doc_id""",
    "seq_pack" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_off
           FROM t)
         SELECT doc_id, shard, n_tokens, start_off,
           start_off // 256 AS bin FROM o""",
    "profile_table" ->
      """SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM orders
         UNION ALL
         SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE),
           CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderpriority), MAX(o_orderpriority) FROM orders""",
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
           CAST(floor(length(text) / 100) AS BIGINT) AS n_frames
           FROM documents WHERE length(text) >= 100)
         SELECT doc_id, n_frames,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 100 AS BIGINT) AS byte_offset,
           md5(substring(text, CAST(frame_idx * 100 + 1 AS INT), 100)) AS frame_md5
         FROM (SELECT doc_id, text, n_frames,
                 unnest(range(0, n_frames, 10)) AS frame_idx FROM f) u""",
    // SCD2 gaps-and-islands: identical change-flag + running-version
    // construction; DuckDB's running SUM is HUGEINT, cast back.
    "q_scd2" ->
      """WITH st AS (
           SELECT user_id, event_id, epoch_us(ts) AS t_us,
             event_type AS state,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id)),
         v AS (
           SELECT user_id, state, t_us,
             CAST(SUM(chg) OVER (PARTITION BY user_id
               ORDER BY t_us, event_id) AS BIGINT) AS version
           FROM st),
         iv AS (
           SELECT user_id, version, state, MIN(t_us) AS valid_from_us,
             COUNT(*) AS n_events
           FROM v GROUP BY 1, 2, 3)
         SELECT user_id, version, state, valid_from_us, n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id
             ORDER BY version) AS valid_to_us
         FROM iv""",
    "q_transition" ->
      """WITH o AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
           FROM events),
         c AS (SELECT prev_type, event_type, COUNT(*) AS n FROM o
               WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, event_type, n,
           ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER
             (PARTITION BY prev_type) AS DOUBLE), 6) AS p
         FROM c""",
    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
           FROM events),
         c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1)
         SELECT c.cohort_wk, uw.wk - c.cohort_wk AS offset_wk,
           COUNT(*) AS n_users
         FROM uw JOIN c USING (user_id) GROUP BY 1, 2""",
    "q_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
           FROM events),
         cov AS (SELECT DISTINCT user_id, day + o AS day
                 FROM ud CROSS JOIN range(0, 7) t(o)),
         m AS (SELECT MAX(day) AS max_day FROM ud)
         SELECT cov.day, COUNT(*) AS n_active_7d FROM cov, m
         WHERE cov.day <= m.max_day GROUP BY 1""",
    // latest-per-key twin of Spark's max(struct(t_us, event_id, v)):
    // row_number DESC on the same compound key picks the same winner.
    "q_merge_upsert" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
             ROUND(value, 2) AS v FROM events),
         b AS (SELECT user_id, v AS base_value FROM (
             SELECT user_id, v, row_number() OVER (PARTITION BY user_id
               ORDER BY t_us DESC, event_id DESC) AS rn
             FROM e WHERE t_us < 1705363200000000) x WHERE rn = 1),
         d AS (SELECT user_id, v AS delta_value FROM (
             SELECT user_id, v, row_number() OVER (PARTITION BY user_id
               ORDER BY t_us DESC, event_id DESC) AS rn
             FROM e WHERE t_us >= 1705363200000000) y WHERE rn = 1)
         SELECT COALESCE(b.user_id, d.user_id) AS user_id,
           COALESCE(d.delta_value, b.base_value) AS value,
           CASE WHEN b.user_id IS NULL THEN 'insert'
                WHEN d.user_id IS NULL THEN 'unchanged'
                WHEN d.delta_value = b.base_value THEN 'unchanged'
                ELSE 'update' END AS op
         FROM b FULL OUTER JOIN d ON b.user_id = d.user_id""",
    "mix_compose" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_obs FROM documents
                    GROUP BY 1),
         t AS (SELECT COUNT(*) AS n_total FROM documents),
         r AS (SELECT lang, n_obs,
             LEAST(16, CAST(floor(16.0 * (CASE lang
                 WHEN 'en' THEN 0.2 WHEN 'de' THEN 0.2 WHEN 'es' THEN 0.2
                 WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.2 ELSE 0.0 END)
               * (n_total * 0.5) / n_obs) AS BIGINT)) AS rate_sixteenths
           FROM c, t)
         SELECT r.lang, r.n_obs, r.rate_sixteenths,
           CAST(SUM(CASE WHEN strpos('0123456789abcdef',
                 substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1
               < r.rate_sixteenths THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM documents d JOIN r ON d.lang = r.lang
         GROUP BY 1, 2, 3""",
    "contamination_report" ->
      """WITH s AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' ')))) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) dd),
         bm AS (SELECT DISTINCT g FROM s WHERE doc_id % 20 = 0),
         h AS (SELECT doc_id, COUNT(*) AS n_shared FROM s JOIN bm USING (g)
               WHERE doc_id % 20 <> 0 GROUP BY 1),
         rep AS (
           SELECT d.lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN h.n_shared IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_contaminated,
             CAST(COALESCE(SUM(h.n_shared), 0) AS BIGINT) AS n_shared_total
           FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
           WHERE d.doc_id % 20 <> 0 GROUP BY 1)
         SELECT lang, n_docs, n_contaminated, n_shared_total,
           ROUND(CAST(n_contaminated AS DOUBLE) / n_docs, 6) AS rate
         FROM rep""",
    "q_zorder" -> {
      val terms = (0 until 16).map { i =>
        s"((l_partkey >> $i) & 1) * ${1L << (2 * i)}" +
          s" + ((l_suppkey >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH z AS (SELECT l_partkey, l_suppkey, $terms AS zval
            FROM lineitem),
          m AS (SELECT MAX(zval) AS z_max FROM z)
          SELECT CAST(floor(zval * 64.0 / (z_max + 1)) AS BIGINT) AS cell,
            COUNT(*) AS n,
            MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
            MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
          FROM z, m GROUP BY 1"""
    },
    "mm_image_patch" ->
      """WITH m AS (SELECT doc_id, ((doc_id % 64) + 1) * 8 AS w,
             ((doc_id % 48) + 1) * 8 AS h FROM documents),
         g AS (SELECT doc_id, w, h, (w + 15) // 16 AS nx,
             (h + 15) // 16 AS ny FROM m),
         g1 AS (SELECT doc_id, w, nx, unnest(range(0, ny, 4)) AS py FROM g),
         g2 AS (SELECT doc_id, w, py, unnest(range(0, nx, 4)) AS px FROM g1)
         SELECT doc_id, CAST(px AS BIGINT) AS px, CAST(py AS BIGINT) AS py,
           CAST((py * 16 * w + px * 16) * 3 AS BIGINT) AS byte_offset
         FROM g2""",
    // Relevance family: idf is the RATIONAL RSJ form (N-df+0.5)/(df+0.5)
    // — integer inputs + correctly-rounded IEEE ops only, so scores are
    // bit-identical across engines when parenthesized the same way
    // (no ln whose last ulp differs between libm and java.lang.Math).
    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t
                WHERE tok <> '' GROUP BY 1, 2),
         df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM documents),
         s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) *
               ((CAST(n.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
                (CAST(df.df AS DOUBLE) + 0.5)) AS score
           FROM tf JOIN df USING (tok) CROSS JOIN n),
         r AS (SELECT doc_id, tok, tf, df, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, tok) AS rk FROM s)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df,
           ROUND(score, 6) AS tfidf
         FROM r WHERE rk <= 3""",
    // k1=1.5, b=0.75: every scoring constant (1.5, 2.5, 0.75, 0.25) is
    // exact in binary; two query terms ⇒ the per-doc sum is ONE
    // commutative IEEE add — no association-order hazard.
    "text_search_bm25" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         tok AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
         st AS (SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
         df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         q AS (SELECT unnest(['spark', 'window']) AS tok),
         per AS (SELECT tf.doc_id,
             ((CAST(st.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
              (CAST(df.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * 2.5)
               / (CAST(tf.tf AS DOUBLE) +
                  1.5 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl))
               AS contrib
           FROM tf JOIN q USING (tok) JOIN dl USING (doc_id)
             JOIN df USING (tok) CROSS JOIN st),
         sc AS (SELECT doc_id, SUM(contrib) AS score,
             COUNT(*) AS n_terms_hit FROM per GROUP BY 1)
         SELECT doc_id, ROUND(score, 6) AS bm25, n_terms_hit
         FROM sc ORDER BY score DESC, doc_id LIMIT 10""",
    "idx_postings" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t
                WHERE tok <> '' GROUP BY 1, 2),
         st AS (SELECT tok, COUNT(*) AS df,
             CAST(SUM(tf) AS BIGINT) AS tf_total FROM tf GROUP BY 1),
         h AS (SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY doc_id) AS postings_head
           FROM (SELECT tok, doc_id, ROW_NUMBER() OVER (PARTITION BY tok
                   ORDER BY doc_id) AS rk FROM tf) x
           WHERE rk <= 10 GROUP BY tok)
         SELECT st.tok, st.df, st.tf_total, h.postings_head
         FROM st JOIN h USING (tok)""",
    "q_outlier" ->
      """WITH s AS (SELECT event_type, AVG(value) AS m,
             stddev_samp(value) AS sd FROM events GROUP BY 1)
         SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 4) AS z
         FROM events e JOIN s USING (event_type)
         WHERE abs((e.value - s.m) / s.sd) > 2.5""",
    "q_purge_cascade" ->
      """WITH tomb AS (SELECT c_custkey FROM customer
           WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'),
         po AS (SELECT o_orderkey FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM tomb))
         SELECT 'customer' AS tbl, (SELECT COUNT(*) FROM customer) AS n_rows,
           (SELECT COUNT(*) FROM tomb) AS n_purged
         UNION ALL
         SELECT 'orders', (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM po)
         UNION ALL
         SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM po))""",
    "split_cluster_safe" ->
      """WITH RECURSIVE
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         canon AS (SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
             AS canonical_id
           FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
           GROUP BY d.doc_id)
         SELECT doc_id, canonical_id,
           CASE WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 1) IN
             ('0','1','2','3','4','5','6','7','8','9','a','b','c','d')
           THEN 'train' ELSE 'val' END AS split
         FROM canon""",
    "dedup_keep_best" ->
      """WITH RECURSIVE
         s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
           WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8),
         edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         canon AS (SELECT d.doc_id,
           CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
             AS canonical_id
           FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
           GROUP BY d.doc_id),
         q AS (SELECT doc_id,
           ROUND((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' '))) *
             (1.0 - CAST(len(list_filter(string_split(text, ' '),
               t -> list_contains(['the','a','of','and','to','in','is','it','on','for'], t))) AS DOUBLE)
               / len(string_split(text, ' '))), 6) AS quality_score
           FROM documents)
         SELECT canonical_id, CAST(doc_id AS BIGINT) AS keep_id,
           quality_score, n_members
         FROM (
           SELECT c.canonical_id, c.doc_id, q.quality_score,
             COUNT(*) OVER (PARTITION BY c.canonical_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY c.canonical_id
               ORDER BY q.quality_score DESC, c.doc_id) AS rn
           FROM canon c JOIN q USING (doc_id)) t
         WHERE rn = 1""",
    "dedup_incremental" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
           WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'),
         delta AS (SELECT doc_id, text FROM documents
           WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f'),
         ex AS (SELECT DISTINCT d.doc_id FROM delta d
                JOIN corpus c ON md5(d.text) = md5(c.text)),
         sd AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM delta
                 WHERE len(string_split(text, ' ')) >= 4) x),
         sc AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus
                 WHERE len(string_split(text, ' ')) >= 4) x),
         nr AS (SELECT DISTINCT a.doc_id FROM sd a JOIN sc b ON
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5)
         SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS status
         FROM delta d LEFT JOIN ex e ON d.doc_id = e.doc_id
                      LEFT JOIN nr n ON d.doc_id = n.doc_id""",
    "q_basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS basket,
             l_partkey AS item FROM lineitem),
         n AS (SELECT COUNT(*) AS n_total
               FROM (SELECT DISTINCT basket FROM it)),
         ic AS (SELECT item, COUNT(*) AS cnt FROM it GROUP BY item),
         p AS (SELECT a.item AS item_a, b.item AS item_b,
             COUNT(*) AS n_baskets
           FROM it a JOIN it b ON a.basket = b.basket AND a.item < b.item
           GROUP BY 1, 2)
         SELECT item_a, item_b, n_baskets,
           ROUND(CAST(n_baskets AS DOUBLE) / ca.cnt * n.n_total / cb.cnt, 6)
             AS lift
         FROM p JOIN ic ca ON p.item_a = ca.item
                JOIN ic cb ON p.item_b = cb.item, n
         ORDER BY n_baskets DESC, item_a, item_b LIMIT 50""",
    "q_robust_scale" ->
      """WITH s AS (SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.5) AS med,
             quantile_cont(l_extendedprice, 0.75) AS q3
           FROM lineitem GROUP BY l_returnflag),
         f AS (SELECT l_returnflag, ROUND(med, 6) AS median,
             ROUND(q3 - q1, 6) AS iqr,
             ROUND(q1 - (q3 - q1) * 1.5, 6) AS lo_fence,
             ROUND(q3 + (q3 - q1) * 1.5, 6) AS hi_fence
           FROM s)
         SELECT f.l_returnflag, f.median, f.iqr, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < f.lo_fence
             OR l.l_extendedprice > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
         FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
         GROUP BY 1, 2, 3""",
    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
         FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM part q
           WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
             AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""",
    "q_path_topk" ->
      """WITH h AS (SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
               FROM h WHERE rn <= 8 GROUP BY user_id)
         SELECT path, COUNT(*) AS n_users FROM p
         GROUP BY path ORDER BY n_users DESC, path LIMIT 20""",
    "dq_expectations" ->
      """WITH t AS (SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
             AS BIGINT) AS v_qty,
           CAST(SUM(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)
             AS BIGINT) AS v_price,
           CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.11 THEN 0 ELSE 1
             END) AS BIGINT) AS v_disc,
           CAST(SUM(CASE WHEN l_tax >= 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS v_tax,
           CAST(SUM(CASE WHEN l_shipdate BETWEEN DATE '1992-01-01'
             AND DATE '1998-12-31' THEN 0 ELSE 1 END) AS BIGINT) AS v_ship,
           CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1
             END) AS BIGINT) AS v_flag
           FROM lineitem)
         SELECT r.rule, t.n_rows, r.n_violations,
           ROUND(CAST(r.n_violations AS DOUBLE) / t.n_rows, 6)
             AS violation_rate
         FROM t, LATERAL (VALUES
           ('quantity_range', v_qty), ('price_positive', v_price),
           ('discount_range', v_disc), ('tax_nonneg', v_tax),
           ('shipdate_range', v_ship), ('returnflag_domain', v_flag))
           AS r(rule, n_violations)
         ORDER BY rule""",
    "dq_key_skew" ->
      """WITH c AS (SELECT l_partkey, COUNT(*) AS cnt
                    FROM lineitem GROUP BY 1)
         SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(AVG(cnt), 4) AS avg_cnt,
           ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top1_share,
           ROUND(CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt), 4)
             AS skew_ratio,
           ROUND(LN(CAST(SUM(cnt) AS DOUBLE)) -
             SUM(cnt * LN(cnt)) / SUM(cnt), 4) AS entropy
         FROM c""",
    "dq_referential" ->
      """SELECT 'lineitem_orders' AS fk, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans,
           ROUND(CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS orphan_rate
         FROM lineitem c LEFT JOIN
           (SELECT DISTINCT o_orderkey AS k FROM orders) p
           ON c.l_orderkey = p.k
         UNION ALL
         SELECT 'orders_customer', COUNT(*),
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6)
         FROM orders c LEFT JOIN
           (SELECT DISTINCT c_custkey AS k FROM customer) p
           ON c.o_custkey = p.k
         UNION ALL
         SELECT 'lineitem_part', COUNT(*),
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6)
         FROM lineitem c LEFT JOIN
           (SELECT DISTINCT p_partkey AS k FROM part) p
           ON c.l_partkey = p.k
         UNION ALL
         SELECT 'events_customer', COUNT(*),
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6)
         FROM events c LEFT JOIN
           (SELECT DISTINCT c_custkey AS k FROM customer) p
           ON c.user_id = p.k""",
    // the same synthetic version pair as q_snapshot_diff, profiled
    // exactly on both engines and differenced
    "dq_profile_drift" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                    FROM orders WHERE o_orderkey % 10 <> 0),
         b AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0
                   THEN ROUND(o_totalprice + 1.0, 2)
                   ELSE o_totalprice END AS o_totalprice,
                 o_orderpriority
               FROM orders WHERE o_orderkey % 10 <> 1),
         pa AS (
           SELECT 'o_orderkey' AS col_name,
             COUNT(*) - COUNT(o_orderkey) AS n_nulls,
             COUNT(DISTINCT o_orderkey) AS ndv,
             CAST(MIN(o_orderkey) AS DOUBLE) AS mn,
             CAST(MAX(o_orderkey) AS DOUBLE) AS mx,
             CAST(NULL AS VARCHAR) AS mns, CAST(NULL AS VARCHAR) AS mxs
           FROM a
           UNION ALL
           SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
             COUNT(DISTINCT o_totalprice),
             MIN(o_totalprice), MAX(o_totalprice), NULL, NULL FROM a
           UNION ALL
           SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority), NULL, NULL,
             MIN(o_orderpriority), MAX(o_orderpriority) FROM a),
         pb AS (
           SELECT 'o_orderkey' AS col_name,
             COUNT(*) - COUNT(o_orderkey) AS n_nulls,
             COUNT(DISTINCT o_orderkey) AS ndv,
             CAST(MIN(o_orderkey) AS DOUBLE) AS mn,
             CAST(MAX(o_orderkey) AS DOUBLE) AS mx,
             CAST(NULL AS VARCHAR) AS mns, CAST(NULL AS VARCHAR) AS mxs
           FROM b
           UNION ALL
           SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
             COUNT(DISTINCT o_totalprice),
             MIN(o_totalprice), MAX(o_totalprice), NULL, NULL FROM b
           UNION ALL
           SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority), NULL, NULL,
             MIN(o_orderpriority), MAX(o_orderpriority) FROM b)
         SELECT pa.col_name,
           CAST(pb.n_nulls - pa.n_nulls AS BIGINT) AS d_nulls,
           CAST(pb.ndv - pa.ndv AS BIGINT) AS d_ndv,
           ROUND(pb.mn - pa.mn, 6) AS d_min_num,
           ROUND(pb.mx - pa.mx, 6) AS d_max_num,
           CAST(CASE WHEN pa.mns IS DISTINCT FROM pb.mns
                  OR pa.mxs IS DISTINCT FROM pb.mxs
                THEN 1 ELSE 0 END AS BIGINT) AS str_bounds_changed
         FROM pa JOIN pb ON pa.col_name = pb.col_name""",
    // identical deterministic sample (key mod) + min-shared floor +
    // brute-force triple join — the Spark side's degree-ordered
    // orientation is an exact algorithm, so the counts coincide
    "graph_triangles" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                     WHERE l_orderkey % 5 = 0),
         e AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v
               FROM sl a JOIN sl b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         deg AS (SELECT node, COUNT(*) AS d FROM
                   (SELECT u AS node FROM e UNION ALL SELECT v FROM e) t
                 GROUP BY 1),
         tri AS (SELECT COUNT(*) AS n_tri
                 FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
                 FROM deg)
         SELECT agg.n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           CAST(tri.n_tri AS BIGINT) AS n_triangles, agg.n_wedges,
           CASE WHEN agg.n_wedges > 0
             THEN ROUND(3.0 * tri.n_tri / agg.n_wedges, 6)
             ELSE 0.0 END AS clustering
         FROM agg, tri""",
    // unconnected pairs ranked by neighbor-set Jaccard; all-integer
    // rationals so the round(6) compare is exact
    "graph_jaccard" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                     WHERE l_orderkey % 5 = 0),
         e AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v
               FROM sl a JOIN sl b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         adj AS (SELECT u AS node, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e),
         deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY 1),
         cm AS (SELECT x.nbr AS a, y.nbr AS b, COUNT(*) AS n_common
                FROM adj x JOIN adj y
                  ON x.node = y.node AND x.nbr < y.nbr
                GROUP BY 1, 2),
         unc AS (SELECT cm.* FROM cm
                 LEFT JOIN e ON e.u = cm.a AND e.v = cm.b
                 WHERE e.u IS NULL)
         SELECT a AS a, b AS b, n_common,
           ROUND(CAST(n_common AS DOUBLE) /
             (da.d + db.d - n_common), 6) AS jaccard
         FROM unc JOIN deg da ON da.node = unc.a
           JOIN deg db ON db.node = unc.b
         ORDER BY jaccard DESC, a, b LIMIT 20""",
    // decay quantized to whole half-life periods clamped at 30:
    // 0.5^k is a dyadic rational, values become exact integer cents,
    // so the sum is EXACT in any order on any IEEE engine — no FP
    // association freedom at all (see Temporal.decayedActivity doc)
    "q_decay_sum" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS t_us, value
                     FROM events),
         a AS (SELECT MAX(t_us) AS anchor FROM ev)
         SELECT event_type, COUNT(*) AS n_events,
           ROUND(SUM(ROUND(value * 100) * POWER(0.5,
             LEAST((a.anchor - t_us) // 604800000000, 30))) / 100, 4)
             AS decayed_sum,
           ROUND(SUM(POWER(0.5,
             LEAST((a.anchor - t_us) // 604800000000, 30))), 4)
             AS decayed_count
         FROM ev, a GROUP BY event_type""",
    // per purchase: latest touch at-or-before within lookback, ties
    // broken (t_us, event_id) — identical argmax on both engines
    "q_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS t_us, value FROM events),
         p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
         t AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
         att AS (SELECT p.event_id AS pid, p.value,
             (SELECT t.event_type FROM t
              WHERE t.user_id = p.user_id AND t.t_us <= p.t_us
                AND t.t_us >= p.t_us - 604800000000
              ORDER BY t.t_us DESC, t.event_id DESC LIMIT 1) AS touch_type
           FROM p)
         SELECT COALESCE(touch_type, '(none)') AS touch_type,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value), 2) AS attributed_value,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
             (SELECT COUNT(*) FROM p), 6) AS share
         FROM att GROUP BY 1""",
    // Simpson index is a pure rational of integer counts — the
    // oracle-friendly member of the entropy family
    "text_simpson" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
         c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(CAST(SUM(c * (c - 1)) AS DOUBLE) /
             (SUM(c) * (SUM(c) - 1)), 6) AS simpson
         FROM c GROUP BY 1""",
    "sample_fixed" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
         FROM documents ORDER BY h LIMIT 25""",
    // lift (exp PMI) stays a pure product/quotient of counts with the
    // multiplication order written identically on both engines
    "text_collocations" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
         uni AS (SELECT unnest(t) AS tok FROM d),
         u AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY 1),
         n1 AS (SELECT COUNT(*) AS n FROM uni),
         big AS (SELECT unnest(list_transform(range(1, len(t)),
                   i -> array_to_string(t[i:i+1], ' '))) AS gram
                 FROM d WHERE len(t) >= 2),
         nb AS (SELECT COUNT(*) AS n FROM big),
         bc AS (SELECT gram, COUNT(*) AS n_pair FROM big GROUP BY 1
                HAVING COUNT(*) >= 5)
         SELECT gram, bc.n_pair,
           ROUND(CAST(bc.n_pair AS DOUBLE) * n1.n * n1.n /
             (CAST(nb.n AS DOUBLE) * ua.c1 * ub.c1), 6) AS lift
         FROM bc CROSS JOIN n1 CROSS JOIN nb
         JOIN u ua ON ua.tok = split_part(gram, ' ', 1)
         JOIN u ub ON ub.tok = split_part(gram, ' ', 2)
         ORDER BY lift DESC, gram LIMIT 20""",
    "q_linreg" ->
      """SELECT l_returnflag,
         ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
         ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
         ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
         CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_points
         FROM lineitem GROUP BY 1""",
    "dedup_fuzzy" ->
      """WITH n AS (SELECT DISTINCT c_name AS name FROM customer)
         SELECT a.name AS name_a, b.name AS name_b
         FROM n a JOIN n b ON a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 1
         ORDER BY name_a, name_b""",
    // the identical unrolled recurrence, per-iteration ROUND(9) on
    // both engines so partition-order FP drift can't compound
    "graph_pagerank" ->
      """WITH p AS (SELECT DISTINCT 'c#' || CAST(o_custkey AS VARCHAR) AS c,
             's#' || CAST(l_suppkey AS VARCHAR) AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
         outd AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         pr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         r0 AS (SELECT node, CAST(1 AS DOUBLE) / pr.n AS rank
                FROM nodes, pr),
         c1 AS (SELECT e.dst AS node, SUM(r.rank / o.outdeg) AS contrib
                FROM e JOIN outd o USING (src) JOIN r0 r ON r.node = e.src
                GROUP BY 1),
         r1 AS (SELECT nd.node, ROUND(CAST(0.15 AS DOUBLE) / pr.n +
                  CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, 0), 9) AS rank
                FROM nodes nd LEFT JOIN c1 c USING (node), pr),
         c2 AS (SELECT e.dst AS node, SUM(r.rank / o.outdeg) AS contrib
                FROM e JOIN outd o USING (src) JOIN r1 r ON r.node = e.src
                GROUP BY 1),
         r2 AS (SELECT nd.node, ROUND(CAST(0.15 AS DOUBLE) / pr.n +
                  CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, 0), 9) AS rank
                FROM nodes nd LEFT JOIN c2 c USING (node), pr),
         c3 AS (SELECT e.dst AS node, SUM(r.rank / o.outdeg) AS contrib
                FROM e JOIN outd o USING (src) JOIN r2 r ON r.node = e.src
                GROUP BY 1),
         r3 AS (SELECT nd.node, ROUND(CAST(0.15 AS DOUBLE) / pr.n +
                  CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, 0), 9) AS rank
                FROM nodes nd LEFT JOIN c3 c USING (node), pr)
         SELECT node, ROUND(rank, 6) AS rank FROM r3""",
    "graph_degree" ->
      """WITH p AS (SELECT DISTINCT 'c#' || CAST(o_custkey AS VARCHAR) AS c,
             's#' || CAST(l_suppkey AS VARCHAR) AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s, c FROM p),
         d AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY 1)
         SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_nodes
         FROM d GROUP BY 1 ORDER BY 1""",
    "sample_weighted" ->
      """WITH u AS (SELECT doc_id, lang, n_chars,
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
           FROM documents)
         SELECT doc_id, lang, n_chars FROM u
         WHERE u16 < LEAST(CAST(1 AS DOUBLE),
           GREATEST(CAST(0 AS DOUBLE), CAST(n_chars AS DOUBLE) / 2000.0))
           * 65536.0""",
    // graft.functions.StringAlgs mirrors the RapidFuzz arithmetic
    // DuckDB embeds (integer transposition halving, fixed-order ratio
    // accumulation, 0.7-gated prefix boost) — exact cross-engine match
    "dedup_fuzzy_scored" ->
      """WITH n AS (SELECT DISTINCT c_name AS name FROM customer)
         SELECT a.name AS name_a, b.name AS name_b,
           ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
         FROM n a JOIN n b ON a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 1
         ORDER BY name_a, name_b""",
    "q_interval_merge" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e FROM events),
         m AS (SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           FROM ev),
         b AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END
                 AS brk FROM m),
         i AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                 ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
               FROM b),
         g AS (SELECT user_id, island, MIN(s) AS is_s, MAX(e) AS is_e
               FROM i GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(is_e - is_s) AS BIGINT) AS covered_us,
           CAST(MAX(is_e - is_s) AS BIGINT) AS longest_us
         FROM g GROUP BY 1""",
    // DSIR (Xie et al. 2023): the ratio inside ln is a quotient of
    // EXACT integer products, so the double entering ln is identical
    // cross-engine; ROUND(SUM,4) absorbs ln's last-ulp divergence
    // (the q1_pricing_agg convention). Ranking is on the ROUNDED
    // score with doc_id tie-break — deterministic top-100.
    "curate_dsir" ->
      """WITH toks0 AS (SELECT doc_id, lang,
           unnest(string_split(text, ' ')) AS tok FROM documents),
         tk AS (SELECT * FROM toks0 WHERE tok <> ''),
         bc AS (SELECT tok, COUNT(*) AS b_cnt FROM tk GROUP BY tok),
         tc AS (SELECT tok, COUNT(*) AS t_cnt FROM tk
                WHERE lang = 'en' GROUP BY tok),
         vocab AS (SELECT bc.tok, b_cnt, COALESCE(t_cnt, 0) AS t_cnt
                   FROM bc LEFT JOIN tc ON bc.tok = tc.tok),
         tot AS (SELECT SUM(b_cnt) AS b_tot, SUM(t_cnt) AS t_tot,
                        COUNT(*) AS v FROM vocab),
         w AS (SELECT tok,
                 ln(CAST((t_cnt + 1) * (b_tot + v) AS DOUBLE) /
                    CAST((b_cnt + 1) * (t_tot + v) AS DOUBLE)) AS w
               FROM vocab CROSS JOIN tot),
         sc AS (SELECT tk.doc_id, ROUND(SUM(w.w), 4) AS dsir_score
                FROM tk JOIN w ON tk.tok = w.tok GROUP BY tk.doc_id),
         top AS (SELECT doc_id, dsir_score FROM sc
                 ORDER BY dsir_score DESC, doc_id LIMIT 100)
         SELECT d.doc_id, d.lang, t.dsir_score
         FROM top t JOIN documents d ON d.doc_id = t.doc_id
         ORDER BY t.dsir_score DESC, d.doc_id""",
    // hashed-feature DSIR: same FP argument as curate_dsir, with the
    // token replaced by its 12-bit md5 bucket (first 3 hex chars —
    // the mix_token_budget strpos convention) — md5 is byte-identical
    // cross-engine, so the bucketed counts are exact integers
    "curate_dsir_hashed" ->
      """WITH toks0 AS (SELECT doc_id, lang,
           unnest(string_split(text, ' ')) AS tok FROM documents),
         tk0 AS (SELECT * FROM toks0 WHERE tok <> ''),
         tk AS (SELECT doc_id, lang,
           (strpos('0123456789abcdef',
              substring(md5(tok), 1, 1)) - 1) * 256 +
           (strpos('0123456789abcdef',
              substring(md5(tok), 2, 1)) - 1) * 16 +
           (strpos('0123456789abcdef',
              substring(md5(tok), 3, 1)) - 1) AS bucket
           FROM tk0),
         bc AS (SELECT bucket, COUNT(*) AS b_cnt FROM tk GROUP BY bucket),
         tc AS (SELECT bucket, COUNT(*) AS t_cnt FROM tk
                WHERE lang = 'en' GROUP BY bucket),
         vocab AS (SELECT bc.bucket, b_cnt, COALESCE(t_cnt, 0) AS t_cnt
                   FROM bc LEFT JOIN tc ON bc.bucket = tc.bucket),
         tot AS (SELECT SUM(b_cnt) AS b_tot, SUM(t_cnt) AS t_tot,
                        COUNT(*) AS v FROM vocab),
         w AS (SELECT bucket,
                 ln(CAST((t_cnt + 1) * (b_tot + v) AS DOUBLE) /
                    CAST((b_cnt + 1) * (t_tot + v) AS DOUBLE)) AS w
               FROM vocab CROSS JOIN tot),
         sc AS (SELECT tk.doc_id, ROUND(SUM(w.w), 4) AS dsir_score
                FROM tk JOIN w ON tk.bucket = w.bucket GROUP BY tk.doc_id),
         top AS (SELECT doc_id, dsir_score FROM sc
                 ORDER BY dsir_score DESC, doc_id LIMIT 100)
         SELECT d.doc_id, d.lang, t.dsir_score
         FROM top t JOIN documents d ON d.doc_id = t.doc_id
         ORDER BY t.dsir_score DESC, d.doc_id""",
    // dyadic weights × integer budget ⟹ every double here is either
    // exact or the result of ONE correctly-rounded division; ×65536
    // is a power-of-two multiply (exact) — membership is
    // cross-engine bit-reproducible (the sample_weighted doctrine)
    "mix_token_budget" ->
      """WITH tok AS (SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
         agg AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS toks_obs
                 FROM tok GROUP BY source),
         rates AS (SELECT source, toks_obs,
           CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
             (CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
               WHEN 'src2' THEN 0.125 WHEN 'src3' THEN 0.125
               ELSE 0.0 END)
             * 2000.0 / CAST(toks_obs AS DOUBLE)) * 65536.0) AS BIGINT)
             AS rate_u16
           FROM agg),
         r2 AS (SELECT * FROM rates WHERE rate_u16 > 0),
         u AS (SELECT source, n_toks,
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
           FROM tok)
         SELECT r2.source, r2.toks_obs, r2.rate_u16,
           CAST(SUM(CASE WHEN u.u16 < r2.rate_u16 THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_kept,
           CAST(SUM(CASE WHEN u.u16 < r2.rate_u16 THEN u.n_toks ELSE 0 END)
             AS BIGINT) AS toks_kept
         FROM u JOIN r2 ON u.source = r2.source
         GROUP BY 1, 2, 3 ORDER BY r2.source""",
    // epoch upsampling: per-doc multiplicity k = floor(r) +
    // (u16 < floor(frac(r)*65536)) — identical IEEE literals,
    // subtract/multiply/floor land the same on both engines; the
    // oracle sums the closed form the explode realizes
    "mix_epochs" ->
      """WITH tok AS (SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
         u AS (SELECT source, doc_id, n_toks,
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
           FROM tok),
         m AS (SELECT source, doc_id, n_toks, u16,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.25
             WHEN 'src2' THEN 0.75 ELSE 0.0 END AS r FROM u),
         c AS (SELECT source, doc_id, n_toks,
           CAST(FLOOR(r) AS BIGINT) +
             (CASE WHEN u16 < CAST(FLOOR((r - FLOOR(r)) * 65536.0)
               AS BIGINT) THEN 1 ELSE 0 END) AS k
           FROM m)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(k) AS BIGINT) AS docs_emitted,
           CAST(SUM(k * n_toks) AS BIGINT) AS toks_emitted
         FROM c WHERE k > 0 GROUP BY source ORDER BY source""",
    // T=2 temperature: sqrt is IEEE-correctly-rounded on both
    // engines; √n quantized to integer hundredths makes the
    // normalizer an exact integer sum (the cents doctrine)
    "sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_obs
                    FROM documents GROUP BY lang),
         q AS (SELECT lang, n_obs,
                 CAST(ROUND(sqrt(CAST(n_obs AS DOUBLE)) * 100.0, 0)
                   AS BIGINT) AS sqrt_c FROM c),
         t AS (SELECT CAST(SUM(sqrt_c) AS BIGINT) AS sqrt_tot FROM q),
         r AS (SELECT lang, n_obs, sqrt_c,
                 CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                   CAST(250 * sqrt_c AS DOUBLE) /
                   CAST(sqrt_tot * n_obs AS DOUBLE)) * 65536.0) AS BIGINT)
                   AS rate_u16
               FROM q CROSS JOIN t),
         u AS (SELECT lang,
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16 +
           (strpos('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
           FROM documents)
         SELECT r.lang, r.n_obs, r.sqrt_c, r.rate_u16,
           CAST(SUM(CASE WHEN u.u16 < r.rate_u16 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
         FROM u JOIN r ON u.lang = r.lang
         GROUP BY 1, 2, 3, 4 ORDER BY r.lang""",
    // Shannon entropy H = log2(N) - SUM(c*log2(c))/N: c and N exact
    // integers, per-doc sums have <= n_types terms, so the <=1-ulp
    // log2 divergence reaching ROUND(6) is ~1e-14 — exact in
    // practice (the curate_dsir FP argument at smaller magnitudes)
    "text_entropy" ->
      """WITH c AS (SELECT doc_id, tok, COUNT(*) AS c FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents) GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(log2(CAST(SUM(c) AS DOUBLE)) -
             SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) /
             CAST(SUM(c) AS DOUBLE), 6) AS entropy
         FROM c GROUP BY doc_id""",
    // containment (Broder's second measure): |A∩B| / min(|A|,|B|)
    // over 4-token shingle sets — brute-force list_intersect oracle
    // (the dedup_ngram_jaccard CTE with the asymmetric denominator)
    // the oracle MIRRORS the shipped maxDf=1000 cap (df window →
    // cold-shingle intersect over FULL-set denominators), so the
    // compare is exact at ANY df distribution — not just at driver
    // scales where the hottest shingle sits under the cap
    "dedup_containment" ->
      """WITH s AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 2),
             i -> array_to_string(t[i:i+3], ' '))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 4) d),
         ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
         df AS (SELECT g, COUNT(*) AS dfc FROM ex GROUP BY g),
         cold AS (SELECT e.doc_id, e.g FROM ex e JOIN df ON e.g = df.g
                  WHERE df.dfc > 1 AND df.dfc <= 1000),
         cm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS common
           FROM cold a JOIN cold b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, common, containment FROM (
           SELECT cm.id_a, cm.id_b, cm.common,
             ROUND(CAST(cm.common AS DOUBLE) /
               LEAST(len(sa.sh), len(sb.sh)), 6) AS containment
           FROM cm JOIN s sa ON cm.id_a = sa.doc_id
                   JOIN s sb ON cm.id_b = sb.doc_id) p
         WHERE containment >= 0.9""",
    // Gopher rules (Rae et al. 2021 A1.1): all integer/ratio
    // arithmetic; mean word length EXACTLY as
    // (chars - separators)/words — no per-token length sum needed
    "curate_gopher" ->
      """WITH b AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) - (len(string_split(text, ' ')) - 1)
             AS DOUBLE) / len(string_split(text, ' ')) AS mean_len
           FROM documents),
         e AS (SELECT doc_id,
           SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]')
             THEN 1 ELSE 0 END) AS n_alpha,
           SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is',
             'it','on','for') THEN 1 ELSE 0 END) AS n_stop
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents) GROUP BY 1),
         f AS (SELECT b.doc_id,
           (n_words >= 40 AND n_words <= 100000) AS f_wc,
           (mean_len >= 3.0 AND mean_len <= 10.0) AS f_ml,
           (CAST(n_alpha AS DOUBLE) / n_words >= 0.8) AS f_al,
           (n_stop >= 2) AS f_st
           FROM b JOIN e ON b.doc_id = e.doc_id)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN NOT f_wc THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_word_count,
           CAST(SUM(CASE WHEN NOT f_ml THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_mean_len,
           CAST(SUM(CASE WHEN NOT f_al THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_alpha,
           CAST(SUM(CASE WHEN NOT f_st THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_stop,
           CAST(SUM(CASE WHEN f_wc AND f_ml AND f_al AND f_st
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         FROM f""",
    // substring dedup (Lee et al. 2021) at window n=8: the oracle
    // joins on gram TEXT where graft joins on the 128-bit shingle
    // hash — the ~2^-128 collision basis of the hash-keyed family.
    // Span merge = interval islands (q_interval_merge pattern);
    // windows at pos p<q merge iff q-p <= 8 (overlap or adjacency)
    "dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                       FROM documents),
         pos8 AS (SELECT doc_id, tk,
                    unnest(range(0, len(tk) - 7)) AS pos
                  FROM toks WHERE len(tk) >= 8),
         wins AS (SELECT doc_id, pos,
                    array_to_string(tk[pos+1:pos+8], ' ') AS gram
                  FROM pos8),
         dup AS (SELECT gram FROM (
                   SELECT gram, COUNT(DISTINCT doc_id) AS df
                   FROM wins GROUP BY 1) WHERE df >= 2),
         mk AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (gram)),
         isl AS (SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                     (PARTITION BY doc_id ORDER BY pos) <= 8
                   THEN 0 ELSE 1 END AS brk FROM mk),
         grp AS (SELECT doc_id, pos, SUM(brk) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS g FROM isl),
         spans AS (SELECT doc_id, g, MAX(pos) + 8 - MIN(pos)
                     AS span_tokens FROM grp GROUP BY 1, 2),
         pd AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
                  CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
                FROM spans GROUP BY 1)
         SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
           COALESCE(pd.dup_tokens, 0) AS dup_tokens,
           ROUND(CAST(COALESCE(pd.dup_tokens, 0) AS DOUBLE) /
             len(string_split(d.text, ' ')), 6) AS dup_ratio
         FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""",
    // substring SCRUB: same span discovery as dedup_substring, then
    // every covered token index [p0, p1+7] is dropped and the doc
    // reassembled in order — compared as md5 of the scrubbed text
    // (the segment-dedup convention). Token extraction via
    // tk[idx+1]; kept order restored with string_agg ORDER BY idx.
    "dedup_substring_scrub" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                       FROM documents),
         pos8 AS (SELECT doc_id, tk,
                    unnest(range(0, len(tk) - 7)) AS pos
                  FROM toks WHERE len(tk) >= 8),
         wins AS (SELECT doc_id, pos,
                    array_to_string(tk[pos+1:pos+8], ' ') AS gram
                  FROM pos8),
         dup AS (SELECT gram FROM (
                   SELECT gram, COUNT(DISTINCT doc_id) AS df
                   FROM wins GROUP BY 1) WHERE df >= 2),
         mk AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (gram)),
         isl AS (SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                     (PARTITION BY doc_id ORDER BY pos) <= 8
                   THEN 0 ELSE 1 END AS brk FROM mk),
         grp AS (SELECT doc_id, pos, SUM(brk) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS g FROM isl),
         spans AS (SELECT doc_id, MIN(pos) AS p0, MAX(pos) + 7 AS p1
                   FROM grp GROUP BY doc_id, g),
         cov AS (SELECT doc_id, unnest(range(p0, p1 + 1)) AS idx
                 FROM spans),
         tokpos AS (SELECT doc_id, unnest(range(0, len(tk))) AS idx, tk
                    FROM toks),
         kept AS (SELECT t.doc_id, t.idx, t.tk[t.idx + 1] AS tok
                  FROM tokpos t LEFT JOIN cov c
                    ON t.doc_id = c.doc_id AND t.idx = c.idx
                  WHERE c.doc_id IS NULL),
         agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                   md5(string_agg(tok, ' ' ORDER BY idx)) AS scrub_md5
                 FROM kept GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.scrub_md5, md5('')) AS scrub_md5
         FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""",
    // synchronous LPA unrolled 3 rounds over the union-kNN(8) graph:
    // row_number (cnt DESC, label ASC) = Spark's
    // max(struct(cnt, -label)) argmax; MATERIALIZED stops DuckDB
    // re-inlining each round's CTE into the next
    "graph_lpa" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                     WHERE l_orderkey % 5 = 0),
         p AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS n
               FROM sl a JOIN sl b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
               GROUP BY 1, 2),
         d AS (SELECT u, v, n FROM p UNION ALL SELECT v, u, n FROM p),
         rk AS (SELECT u, v FROM (SELECT u, v, ROW_NUMBER() OVER
                  (PARTITION BY u ORDER BY n DESC, v) AS rn FROM d)
                WHERE rn <= 8),
         e AS (SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v
               FROM rk),
         adj AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e
                              UNION SELECT v, u FROM e),
         l0 AS (SELECT DISTINCT node, node AS label FROM adj),
         c1 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),
         r1 AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c1) WHERE rn = 1),
         c2 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN r1 l ON a.nbr = l.node GROUP BY 1, 2),
         r2 AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c2) WHERE rn = 1),
         c3 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN r2 l ON a.nbr = l.node GROUP BY 1, 2),
         r3 AS (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c3) WHERE rn = 1)
         SELECT label AS community, COUNT(*) AS n_members
         FROM r3 GROUP BY 1 ORDER BY 1""",
    // modularity of the same LPA assignment in exact rational
    // arithmetic: Q = (4m·Σe_c − Σd_c²)/(4m²) — integer numerator and
    // denominator, ONE correctly-rounded division (rung 1), ROUND(6)
    "graph_lpa_modularity" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                     WHERE l_orderkey % 5 = 0),
         p AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS n
               FROM sl a JOIN sl b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
               GROUP BY 1, 2),
         d AS (SELECT u, v, n FROM p UNION ALL SELECT v, u, n FROM p),
         rk AS (SELECT u, v FROM (SELECT u, v, ROW_NUMBER() OVER
                  (PARTITION BY u ORDER BY n DESC, v) AS rn FROM d)
                WHERE rn <= 8),
         e AS MATERIALIZED (SELECT DISTINCT LEAST(u, v) AS u,
                GREATEST(u, v) AS v FROM rk),
         adj AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e
                              UNION SELECT v, u FROM e),
         l0 AS (SELECT DISTINCT node, node AS label FROM adj),
         c1 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN l0 l ON a.nbr = l.node GROUP BY 1, 2),
         r1 AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c1) WHERE rn = 1),
         c2 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN r1 l ON a.nbr = l.node GROUP BY 1, 2),
         r2 AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c2) WHERE rn = 1),
         c3 AS (SELECT a.node, l.label, COUNT(*) AS cnt
                FROM adj a JOIN r2 l ON a.nbr = l.node GROUP BY 1, 2),
         r3 AS MATERIALIZED (SELECT node, label FROM (
                SELECT node, label, ROW_NUMBER() OVER
                  (PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM c3) WHERE rn = 1),
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         wi AS (SELECT CAST(COUNT(*) AS BIGINT) AS within_edges
                FROM e JOIN r3 a ON e.u = a.node
                       JOIN r3 b ON e.v = b.node
                WHERE a.label = b.label),
         deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
                 FROM adj GROUP BY node),
         dc AS (SELECT l.label, CAST(SUM(deg.dg) AS BIGINT) AS dcm
                FROM deg JOIN r3 l ON deg.node = l.node GROUP BY l.label),
         ds AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                  CAST(SUM(dcm * dcm) AS BIGINT) AS deg_sq_sum FROM dc)
         SELECT mm.m, ds.n_communities, wi.within_edges, ds.deg_sq_sum,
           CASE WHEN mm.m > 0 THEN
             ROUND(CAST(4 * mm.m * wi.within_edges - ds.deg_sq_sum AS DOUBLE)
               / CAST(4 * mm.m * mm.m AS DOUBLE), 6)
           ELSE 0.0 END AS modularity
         FROM mm CROSS JOIN wi CROSS JOIN ds""",
    // pre-flight join cardinality: Σ cnt_L(k)·cnt_R(k) over the two
    // per-key count tables — exact integers, two ROUND(6) ratios
    "dq_join_cardinality" ->
      """WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS cl
                     FROM lineitem GROUP BY 1),
         rc AS (SELECT o_orderkey AS k, COUNT(*) AS cr
                FROM orders GROUP BY 1),
         p AS (SELECT CAST(COUNT(*) AS BIGINT) AS matched_keys,
                 CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT) AS out_rows,
                 CAST(COALESCE(MAX(cl * cr), 0) AS BIGINT) AS max_key_out
               FROM lc JOIN rc ON lc.k = rc.k),
         t AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                 AS left_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
                 AS right_rows)
         SELECT t.left_rows, t.right_rows, p.matched_keys, p.out_rows,
           p.max_key_out,
           CASE WHEN GREATEST(t.left_rows, t.right_rows) > 0 THEN
             ROUND(CAST(p.out_rows AS DOUBLE) /
               CAST(GREATEST(t.left_rows, t.right_rows) AS DOUBLE), 6)
           ELSE 0.0 END AS amplification,
           CASE WHEN p.out_rows > 0 THEN
             ROUND(CAST(p.max_key_out AS DOUBLE) /
               CAST(p.out_rows AS DOUBLE), 6)
           ELSE 0.0 END AS top_key_share
         FROM p CROSS JOIN t""",
    // C4 rules (Raffel et al. 2020 §2.2): line counts via multiline-
    // anchored regex (both engines RE2/Java leftmost — ≤1 match per
    // line), badwords via list intersect; all integers (rung 1)
    "curate_c4" ->
      """WITH n AS (SELECT doc_id, text,
           replace(text, chr(13), '') AS t FROM documents),
         f AS (SELECT doc_id,
           CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(regexp_extract_all(t, '[.!?"]$', 0, 'm'))
             AS BIGINT) AS n_term,
           CAST(len(regexp_extract_all(t,
             '^(?:[^ \t\n\f\r]+ ){4}[^ \t\n\f\r]', 0, 'm'))
             AS BIGINT) AS n_long,
           CAST(len(regexp_extract_all(t, '[.!?]')) AS BIGINT)
             AS n_sent,
           len(list_intersect(string_split_regex(lower(t), '[^a-z0-9]+'),
             ['slow', 'big'])) > 0 AS bw,
           contains(lower(text), 'lorem ipsum') AS lo,
           contains(text, '{') AS br,
           contains(lower(text), 'javascript') AS js
           FROM n)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_lines) AS BIGINT) AS total_lines,
           CAST(SUM(n_term) AS BIGINT) AS term_lines,
           CAST(SUM(n_long) AS BIGINT) AS long_lines,
           CAST(SUM(CASE WHEN n_sent < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_sentences,
           CAST(SUM(CASE WHEN bw THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_badword,
           CAST(SUM(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_lorem,
           CAST(SUM(CASE WHEN br THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_brace,
           CAST(SUM(CASE WHEN js THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_js,
           CAST(SUM(CASE WHEN n_sent >= 3 AND NOT bw AND NOT lo
             AND NOT br AND NOT js THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass
         FROM f""",
    // phased (anneal) schedule: per-phase closed forms unioned; the
    // fractional gate salts the hash BY PHASE ("id#phase") so phases
    // draw independently — dyadic repeat factors keep floor exact
    "mix_anneal" ->
      """WITH tok AS (SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
         ph AS (
           SELECT 'main' AS phase, source, doc_id, n_toks,
             CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
               WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.25
               ELSE 0.0 END AS r,
             md5(CAST(doc_id AS VARCHAR) || '#main') AS h FROM tok
           UNION ALL
           SELECT 'anneal', source, doc_id, n_toks,
             CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 2.5
               WHEN 'src3' THEN 3.0 ELSE 0.0 END,
             md5(CAST(doc_id AS VARCHAR) || '#anneal') FROM tok),
         u AS (SELECT phase, source, doc_id, n_toks, r,
           (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 +
           (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 +
           (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 +
           (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) AS u16
           FROM ph),
         c AS (SELECT phase, source, doc_id, n_toks,
           CAST(FLOOR(r) AS BIGINT) +
             (CASE WHEN u16 < CAST(FLOOR((r - FLOOR(r)) * 65536.0)
               AS BIGINT) THEN 1 ELSE 0 END) AS k
           FROM u)
         SELECT phase, source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(k) AS BIGINT) AS docs_emitted,
           CAST(SUM(k * n_toks) AS BIGINT) AS toks_emitted
         FROM c WHERE k > 0 GROUP BY phase, source
         ORDER BY phase, source""",
    // deterministic global shuffle + round-robin sharding: the range
    // buckets are a PREFIX of the md5 sort order, so the two-phase
    // distributed rank equals this literal global row_number (rung 1
    // — all integer, hex strings ASCII-order like their values)
    "mix_shard_shuffle" ->
      """SELECT doc_id,
           CAST((rn - 1) % 8 AS BIGINT) AS shard,
           CAST((rn - 1) // 8 AS BIGINT) AS pos
         FROM (SELECT doc_id, row_number() OVER
                 (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
               FROM documents) t""",
    "mix_curriculum" ->
      """WITH ph AS (SELECT doc_id,
             LEAST(3, len(string_split(text, ' ')) // 64) AS phase
           FROM documents)
         SELECT doc_id, CAST(phase AS BIGINT) AS phase,
           CAST((rn - 1) % 8 AS BIGINT) AS shard,
           CAST((rn - 1) // 8 AS BIGINT) AS pos
         FROM (SELECT doc_id, phase, row_number() OVER
                 (ORDER BY phase, md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
               FROM ph) t""",
    // bounded near-dup audit: fixed-k md5-ordered sample, exact pairs
    // within it, rate = integer ppm (rung 1); the cosine round(6)
    // equality is the proven dedup_embedding contract
    "dedup_embedding_audit" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 200),
         p AS (SELECT COUNT(*) AS n_pairs FROM s a JOIN s b
             ON a.vec_id < b.vec_id
             WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) >= 0.45),
         n AS (SELECT COUNT(*) AS n_sampled FROM s)
         SELECT CAST(n.n_sampled AS BIGINT) AS n_sampled,
           CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CAST((p.n_pairs * 2000000) //
             (n.n_sampled * (n.n_sampled - 1)) AS BIGINT) AS dup_ppm
         FROM p CROSS JOIN n""",
    // CCNet head/middle/tail: the distributed exact-ntile equals the
    // literal per-domain ntile window (integer score → rung 1)
    "curate_ppl_buckets" ->
      """WITH sc AS (SELECT doc_id, source,
             (n_chars * 100) // len(string_split(text, ' ')) AS score
           FROM documents)
         SELECT doc_id, source, CAST(score AS BIGINT) AS score,
           CAST(nt AS BIGINT) AS tile,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             ELSE 'tail' END AS bucket
         FROM (SELECT *, ntile(3) OVER (PARTITION BY source
                 ORDER BY score, doc_id) AS nt FROM sc) t""",
    // v2: the same split driven by the NB classifier margin — the
    // margin doubles are bit-equal cross-engine (curate_classifier
    // hash-proof), so floor(margin·100) is an exact integral quantize
    "curate_ppl_buckets_v2" ->
      """WITH toks0 AS (SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tk AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
         ltk AS (SELECT source AS label, tok AS feat FROM toks0
                 WHERE tok <> ''),
         cnt AS (SELECT label, feat, COUNT(*) AS c FROM ltk
                 GROUP BY 1, 2),
         labels AS (SELECT source AS label, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1),
         tots AS (SELECT label, SUM(c) AS tot FROM cnt GROUP BY 1),
         vocab AS (SELECT DISTINCT feat FROM cnt),
         consts AS (SELECT (SELECT COUNT(*) FROM vocab) AS v,
                           (SELECT COUNT(*) FROM documents) AS n),
         w AS (SELECT l.label, f.feat,
                 ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
                    CAST(t.tot + cs.v AS DOUBLE)) AS w,
                 ln(CAST(l.n_docs AS DOUBLE) / CAST(cs.n AS DOUBLE)) AS lp
               FROM labels l CROSS JOIN vocab f
               JOIN tots t ON t.label = l.label
               LEFT JOIN cnt c ON c.label = l.label AND c.feat = f.feat
               CROSS JOIN consts cs),
         scr AS (SELECT tk.doc_id, w.label,
                  ROUND(SUM(w.w) + MAX(w.lp), 4) AS score
                FROM tk JOIN w ON w.feat = tk.tok
                GROUP BY tk.doc_id, w.label),
         q AS (SELECT d.doc_id, d.source,
                 CAST(FLOOR(ROUND(m.score - m.s2, 4) * 100) AS BIGINT)
                   AS score
               FROM documents d
               JOIN (SELECT doc_id, score, s2 FROM (
                   SELECT doc_id, label, score,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, label DESC) AS rn,
                     LEAD(score, 1) OVER (PARTITION BY doc_id
                       ORDER BY score DESC, label DESC) AS s2
                   FROM scr) t WHERE rn = 1) m
                 ON m.doc_id = d.doc_id)
         SELECT doc_id, source, score, CAST(nt AS BIGINT) AS tile,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             ELSE 'tail' END AS bucket
         FROM (SELECT *, ntile(3) OVER (PARTITION BY source
                 ORDER BY score, doc_id) AS nt FROM q) z""",
    // multinomial NB classifier: every weight is ln of an exact
    // integer ratio (one correctly-rounded division), per-doc sums
    // bounded by doc length → ROUND(4) (the curate_dsir argument);
    // the argmax runs on the ROUNDED score with a label tie-break,
    // so the prediction is deterministic cross-engine
    "curate_classifier" ->
      """WITH toks0 AS (SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tk AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
         ltk AS (SELECT source AS label, tok AS feat FROM toks0
                 WHERE tok <> ''),
         cnt AS (SELECT label, feat, COUNT(*) AS c FROM ltk
                 GROUP BY 1, 2),
         labels AS (SELECT source AS label, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1),
         tots AS (SELECT label, SUM(c) AS tot FROM cnt GROUP BY 1),
         vocab AS (SELECT DISTINCT feat FROM cnt),
         consts AS (SELECT (SELECT COUNT(*) FROM vocab) AS v,
                           (SELECT COUNT(*) FROM documents) AS n),
         w AS (SELECT l.label, f.feat,
                 ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
                    CAST(t.tot + cs.v AS DOUBLE)) AS w,
                 ln(CAST(l.n_docs AS DOUBLE) / CAST(cs.n AS DOUBLE)) AS lp
               FROM labels l CROSS JOIN vocab f
               JOIN tots t ON t.label = l.label
               LEFT JOIN cnt c ON c.label = l.label AND c.feat = f.feat
               CROSS JOIN consts cs),
         sc AS (SELECT tk.doc_id, w.label,
                  ROUND(SUM(w.w) + MAX(w.lp), 4) AS score
                FROM tk JOIN w ON w.feat = tk.tok
                GROUP BY tk.doc_id, w.label),
         r AS (SELECT doc_id, label, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label DESC) AS rn,
                 LEAD(score, 1) OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label DESC) AS s2
               FROM sc)
         SELECT doc_id, label AS pred_source, score,
           ROUND(score - s2, 4) AS margin
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    // hashed-feature twin: feat = first 3 hex chars of md5(token)
    // (4096 buckets) — DuckDB extracts the identical digits, so the
    // bounded-table scale path keeps a full oracle
    "curate_classifier_hashed" ->
      """WITH toks0 AS (SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tk AS (SELECT doc_id, substr(md5(tok), 1, 3) AS feat
                FROM toks0 WHERE tok <> ''),
         ltk AS (SELECT source AS label, substr(md5(tok), 1, 3) AS feat
                 FROM toks0 WHERE tok <> ''),
         cnt AS (SELECT label, feat, COUNT(*) AS c FROM ltk
                 GROUP BY 1, 2),
         labels AS (SELECT source AS label, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1),
         tots AS (SELECT label, SUM(c) AS tot FROM cnt GROUP BY 1),
         vocab AS (SELECT DISTINCT feat FROM cnt),
         consts AS (SELECT (SELECT COUNT(*) FROM vocab) AS v,
                           (SELECT COUNT(*) FROM documents) AS n),
         w AS (SELECT l.label, f.feat,
                 ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
                    CAST(t.tot + cs.v AS DOUBLE)) AS w,
                 ln(CAST(l.n_docs AS DOUBLE) / CAST(cs.n AS DOUBLE)) AS lp
               FROM labels l CROSS JOIN vocab f
               JOIN tots t ON t.label = l.label
               LEFT JOIN cnt c ON c.label = l.label AND c.feat = f.feat
               CROSS JOIN consts cs),
         sc AS (SELECT tk.doc_id, w.label,
                  ROUND(SUM(w.w) + MAX(w.lp), 4) AS score
                FROM tk JOIN w ON w.feat = tk.feat
                GROUP BY tk.doc_id, w.label),
         r AS (SELECT doc_id, label, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label DESC) AS rn,
                 LEAD(score, 1) OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label DESC) AS s2
               FROM sc)
         SELECT doc_id, label AS pred_source, score,
           ROUND(score - s2, 4) AS margin
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    // Flesch counts are exact integers; the score expressions apply
    // identically-ordered correctly-rounded IEEE ops on both engines
    // (rung 1/3) — ROUND(4) is belt-and-braces
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[^ ]+'))
               AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(lower(text),
               '[.!?]+')), 1) AS BIGINT) AS sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS syllables
           FROM documents)
         SELECT doc_id, words, sentences, syllables,
           ROUND(206.835
             - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)),
             4) AS reading_ease,
           ROUND(0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
             - 15.59, 4) AS fk_grade
         FROM c WHERE words > 0 ORDER BY doc_id""",
    // cross-source priority dedup: pure integer/string argmin (rank,
    // doc_id) per exact-text group — rung 1
    "dedup_priority" ->
      """WITH pr AS (SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) AS rank
           FROM (SELECT DISTINCT source FROM documents)),
         g AS (SELECT md5(d.text) AS h, d.doc_id, d.source, pr.rank
               FROM documents d JOIN pr ON pr.source = d.source),
         r AS (SELECT h, doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY h
                   ORDER BY rank, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY h) AS n_members
               FROM g)
         SELECT doc_id AS keep_id, source AS kept_source,
           CAST(n_members AS BIGINT) AS n_members
         FROM r WHERE rn = 1 ORDER BY keep_id""",
    // BPE train/count/budget: generated unrolled-recurrence SQL (the
    // graph_kcore convention — one CTE triple per merge round); see
    // operators/Bpe.scala for the shared-semantics argument
    // exact pair set is clustering-independent → plain brute-force
    // twin over (embeddings ∪ planted copies); same cosine/round
    // convention as dedup_embedding
    "dedup_embedding_exact_hi" ->
      """WITH u AS (SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 1000000000000000, embedding
           FROM embeddings WHERE vec_id < 10)
         SELECT id_a, id_b, cos_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
               b.embedding::DOUBLE[]), 6) AS cos_sim
           FROM u a JOIN u b ON a.vec_id < b.vec_id) p
         WHERE cos_sim >= 0.85""",
    "search_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         tok AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
         st AS (SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
         df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         q AS (SELECT unnest(['spark', 'window']) AS tok),
         per AS (SELECT tf.doc_id,
             ((CAST(st.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
              (CAST(df.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * 2.5)
               / (CAST(tf.tf AS DOUBLE) +
                  1.5 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl))
               AS contrib
           FROM tf JOIN q USING (tok) JOIN dl USING (doc_id)
             JOIN df USING (tok) CROSS JOIN st),
         sc AS (SELECT doc_id, SUM(contrib) AS score FROM per GROUP BY 1),
         lex20 AS (SELECT doc_id, ROUND(score, 6) AS bm25 FROM sc
           ORDER BY score DESC, doc_id LIMIT 20),
         lexr AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
           FROM lex20),
         sem0 AS (SELECT e.vec_id AS doc_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
               qv.embedding::DOUBLE[]), 6) AS cos
           FROM embeddings e, (SELECT embedding FROM embeddings
                               WHERE vec_id = 0) qv),
         semr AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
           FROM sem0 ORDER BY cos DESC, doc_id LIMIT 20),
         f AS (SELECT doc_id,
             COALESCE(1.0::DOUBLE / CAST(60 + l.lex_rank AS DOUBLE), 0)
               + COALESCE(1.0::DOUBLE / CAST(60 + s.sem_rank AS DOUBLE), 0)
               AS rrf0,
             l.lex_rank, s.sem_rank
           FROM lexr l FULL OUTER JOIN semr s USING (doc_id))
         SELECT doc_id, ROUND(rrf0, 6) AS rrf, lex_rank, sem_rank
         FROM f ORDER BY rrf0 DESC, doc_id LIMIT 10""",
    "mix_doremi" ->
      """WITH d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(ROUND(CAST(100 AS DOUBLE)
                 * CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT) AS mean_loss_c
           FROM documents GROUP BY source),
         t AS (SELECT CAST(ROUND(CAST(100 AS DOUBLE)
                 * CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)
             AS corpus_mean_c
           FROM documents),
         f AS (SELECT source, n_obs, mean_loss_c,
             mean_loss_c - corpus_mean_c AS excess_c,
             GREATEST(100, 10000 + 2 * (mean_loss_c - corpus_mean_c))
               AS factor_bp
           FROM d CROSS JOIN t),
         z AS (SELECT SUM(factor_bp) AS zz FROM f)
         SELECT source, n_obs, mean_loss_c, excess_c,
           CAST(factor_bp AS BIGINT) AS factor_bp,
           CAST(FLOOR(CAST(65536 AS DOUBLE) * CAST(factor_bp AS DOUBLE)
             / CAST(zz AS DOUBLE)) AS BIGINT) AS weight_u16
         FROM f CROSS JOIN z""",
    "search_mmr" -> Relevance.mmrOracleSql(),
    "search_rerank" -> Relevance.rerankOracleSql(),
    "search_pipeline" -> Relevance.pipelineOracleSql(),
    "mm_phash_dedup" -> Multimodal.phashOracleSql(),
    "mm_phash_effect" -> Multimodal.phashEffectOracleSql(),
    "embed_mrl" -> Similarity.mrlOracleSql(),
    "tok_bpe_train" -> Bpe.trainOracleSql(),
    "tok_count_bpe" -> Bpe.countOracleSql(),
    "mix_token_budget_bpe" -> Bpe.budgetOracleSql(),
    "seq_pack_bpe" -> Bpe.packOracleSql(),
    "text_chunk_bpe" -> Bpe.chunkOracleSql(),
    "tok_encode_bpe" -> Bpe.encodeOracleSql(),
    "tok_encode_bpe_bytes" -> BpeBytes.encodeBytesOracleSql(),
    "tok_unigram_vocab" -> Unigram.vocabOracleSql(),
    "tok_encode_unigram" -> Unigram.encodeUnigramOracleSql(),
    "ann_sq8" -> Similarity.sq8OracleSql(),
    "ann_sq8_recall" -> Similarity.sq8RecallOracleSql(),
    "ann_sq8_filtered" ->
      Similarity.sq8OracleSql(predSql = "e.vec_id % 2 = 0"),
    "ann_sq8_filtered_recall" ->
      Similarity.sq8RecallOracleSql(predSql = "e.vec_id % 2 = 0"),
    "sq8_drift" -> Similarity.sq8DriftOracleSql())
}
