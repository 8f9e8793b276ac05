package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry pairs a Spark-side operator (`queries`) with the ANSI SQL the
  * driver runs in DuckDB on the same parquet tables (`oracleSql`). Column
  * names and value bit-patterns must match; see `graft.ops.Relational` for
  * the decimal-exact float conventions that make that hold.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"  -> (Relational.q1PricingSummary _),
    "q2_filter_project"   -> (Relational.q2FilterProject _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q4_semi_join"        -> (Relational.q4SemiJoin _),
    "q5_local_supplier"   -> (Relational.q5LocalSupplier _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q7_window_rank"      -> (Relational.q7WindowRank _),
    "q8_running_total"    -> (Relational.q8RunningTotal _),
    "q9_rollup"           -> (Relational.q9Rollup _),
    "q10_distinct"        -> (Relational.q10Distinct _),
    "q11_set_ops"         -> (Relational.q11SetOps _),
    "q12_case_agg"        -> (Relational.q12CaseAgg _),
    "q13_order_count_dist" -> (Relational.q13OrderCountDist _),
    "q14_scalar_funcs"    -> (Relational.q14ScalarFuncs _),
    "q15_having_subquery" -> (Relational.q15HavingSubquery _),
    "q16_theta_join"      -> (Relational.q16ThetaJoin _),
    "q17_in_not_exists"   -> (Relational.q17InNotExists _),
    "q18_lag_lead"        -> (Relational.q18LagLead _),
    "q19_top_k"           -> (Relational.q19TopK _),
    "q20_cube"            -> (Relational2.q20Cube _),
    "q21_analytic_windows" -> (Relational2.q21AnalyticWindows _),
    "q22_cte_chain"       -> (Relational2.q22CteChain _),
    "q23_pivot"           -> (Relational2.q23Pivot _),
    "q24_regex_strings"   -> (Relational2.q24RegexStrings _),
    "q25_date_funcs"      -> (Relational2.q25DateFuncs _),
    "q26_universal"       -> (Relational2.q26Universal _),
    "q27_null_handling"   -> (Relational2.q27NullHandling _),
    "q28_union_all"       -> (Relational2.q28UnionAll _),
    "q29_string_agg"      -> (Relational2.q29StringAgg _),
    "q30_percentiles"     -> (Relational2.q30Percentiles _),
    "q31_array_map_funcs" -> (Relational2.q31ArrayMapFuncs _),
    "q33_range_frame"     -> (Relational2.q33RangeFrame _),
    "q34_grouping_sets"   -> (Relational3.q34GroupingSets _),
    "q35_lateral"         -> (Relational3.q35Lateral _),
    "q36_intervals"       -> (Relational3.q36Intervals _),
    // native TopKPerKey operator (custom LogicalPlan+Strategy+SparkPlan):
    // same result as the q7 window idiom, no per-partition full sort
    "q32_topk_native"     -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      import graft.plans.TopKPerKey
      TopKPerKey(
        graft.Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        keys = Seq("l_suppkey"),
        order = Seq(TopKPerKey.Ord.desc("l_extendedprice"),
          TopKPerKey.Ord("l_orderkey"), TopKPerKey.Ord("l_linenumber")),
        k = 3)
    }),
    // text analysis (SURVEY north-star extensions)
    "text_token_stats"    -> (Text.tokenStats _),
    "text_classifier"     -> ((s: SparkSession, d: String) =>
      Text.classifierScore(s, d)),
    "text_quality_score"  -> (Text.qualityScore _),
    "text_corpus_profile" -> (Text.corpusProfile _),
    "text_fingerprint"    -> (Text.fingerprint _),
    "text_lang_id"        -> (Text.languageId _),
    "text_bpe_tokens"     -> (Text.bpeTokenCount _),
    // training-pipeline curation: decontamination + stratified sampling
    "curate_decontaminate" -> (Decontaminate.contamination _),
    "curate_decontam_fuzzy" -> (Decontaminate.contaminationFuzzy _),
    "curate_strat_sample"  -> (Sampling.stratifiedSample _),
    "curate_split"         -> (Sampling.split _),
    // curation filters + training-set export (Gopher/Dolma recipes)
    "text_repetition"     -> (Curation.repetitionScore _),
    "curate_pii_scrub"    -> ((s, d) => Curation.piiScrub(s, d)),
    // stop-word probe = the corpus's own function words (the paper
    // list matches zero docs of the synthetic corpus — see
    // Curation.CorpusStopWords); same list on the oracle side
    "curate_gopher_rules" -> ((s, d) => Curation.gopherRules(s, d,
      stopWords = Curation.CorpusStopWords)),
    "curate_gopher_lines" -> (Curation.gopherLineRules _),
    "curate_c4_rules"     -> (Curation.c4Rules _),
    "curate_gopher_rep"   -> (Curation.gopherRepetition _),
    "curate_token_shards" -> ((s, d) => Curation.tokenShards(s, d)),
    "curate_mix_uniform"  -> (Curation.mixToUniform _),
    "curate_dsir_weights" -> (Curation.dsirWeights _),
    "curate_ppl_bucket"   -> ((s, d) => Curation.perplexityBuckets(s, d)),
    // pinned-model CCNet selection (r16): LM counts + tercile cutoffs
    // trained once on the 90% historic slice (SnapshotTree-versioned
    // model), every document scored under the FROZEN model — the
    // stream-safe form of curate_ppl_bucket (per-doc pure given the
    // model), oracled against a full DuckDB recomputation
    "curate_ppl_pinned"   -> (Curation.curatePplPinned _),
    "curate_pipeline"     -> ((s: SparkSession, d: String) =>
      Curation.curatePipeline(s, d)),
    "curate_pipeline_v2"  -> ((s: SparkSession, d: String) =>
      Curation.curatePipelineModern(s, d,
        stopWords = Curation.CorpusStopWords)),
    // v3 (r15): the production recipe — routed fuzzy dedup INSIDE the
    // pipeline (gate → perplexity selection → routed LSH dedup →
    // exact-substring), one declarative plan, one stitched oracle
    "curate_pipeline_v3"  -> ((s: SparkSession, d: String) =>
      Curation.curatePipelineV3(s, d,
        stopWords = Curation.CorpusStopWords)),
    "curate_pack_chunks"  -> ((s, d) => Curation.packChunks(s, d)),
    // dedup / similarity
    "dedup_exact_docs"    -> (Dedup.exactDocDedup _),
    "dedup_incremental"   -> (Dedup.incrementalDedup _),
    "dedup_daily_loop"    -> (Dedup.dailyDedupLoop _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_minhash_lsh"   -> (Dedup.minhashLsh _),
    "dedup_lsh_capped"    -> ((s: org.apache.spark.sql.SparkSession, d: String) => Dedup.minhashLshCapped(s, d)),
    "dedup_lsh_routed"    -> ((s: org.apache.spark.sql.SparkSession, d: String) => Dedup.minhashDedupRouted(s, d)),
    "dedup_minhash_keep"  -> (Dedup.minhashDedupKeep _),
    "dedup_minhash_fast"  -> (Dedup.minhashFastVerified _),
    "dedup_simhash"       -> (Dedup.simhashVerified _),
    "dedup_winnow"        -> (Dedup.winnowDedup _),
    "dedup_cc_keep"       -> (Dedup.ccDedup _),
    "dedup_exact_segments" -> ((s: SparkSession, d: String) =>
      Dedup.exactSegmentDedup(s, d)),
    "dedup_substring"     -> ((s, d) => Dedup.substrDedup(s, d)),
    "dedup_cc_best"       -> (Dedup.ccBestKeep _),
    // time-series (Timestream-shaped)
    "ts_asof_join"        -> (AsOf.clickToPurchase _),
    "ts_tumbling_window"  -> (TimeSeries.tumbling _),
    "ts_sliding_window"   -> (TimeSeries.sliding _),
    "ts_sessionize"       -> (TimeSeries.sessionize _),
    "ts_top_users"        -> (TimeSeries.topUsers _),
    "ts_interpolate"      -> (TimeSeries.interpolate _),
    "ts_anomaly"          -> (TimeSeries.anomaly _),
    "ts_ewma"             -> (TimeSeries.ewma _),
    "ts_cohort_retention" -> (TimeSeries.cohortRetention _),
    "ts_funnel"           -> (TimeSeries.funnel _),
    // key-value (DynamoDB-shaped)
    "kv_point_lookup"     -> (KeyValue.pointLookup _),
    "kv_range_query"      -> (KeyValue.rangeQuery _),
    "kv_batch_get"        -> (KeyValue.batchGet _),
    "kv_upsert_roundtrip" -> (KeyValueWrite.upsertRoundtrip _),
    // real-format table logs: write + partition-granular MERGE + jar-free
    // protocol read, gated end-to-end by the DuckDB oracle
    "fmt_delta_roundtrip"   -> (TableRoundtrips.deltaMergeRoundtrip _),
    "fmt_delta_dv_delete"   -> (TableRoundtrips.deltaDvDeleteRoundtrip _),
    "fmt_iceberg_roundtrip" -> (TableRoundtrips.icebergMergeRoundtrip _),
    "fmt_iceberg_day_roundtrip" -> (TableRoundtrips.icebergDayRoundtrip _),
    "fmt_iceberg_pos_delete" -> (TableRoundtrips.icebergPosDeleteRoundtrip _),
    "fmt_iceberg_v3_dv"     -> (TableRoundtrips.icebergV3DvRoundtrip _),
    "fmt_iceberg_lineage"   -> (TableRoundtrips.icebergLineageRoundtrip _),
    "fmt_delta_row_ids"     -> (TableRoundtrips.deltaRowIdsRoundtrip _),
    "fmt_iceberg_defaults"  -> (TableRoundtrips.icebergDefaultsRoundtrip _),
    "fmt_sql_dml"           -> (TableRoundtrips.sqlDmlRoundtrip _),
    "fmt_uniform_mirror"    -> (TableRoundtrips.uniformMirrorRoundtrip _),
    "fmt_delta_clone"       -> (TableRoundtrips.deltaCloneRoundtrip _),
    "fmt_iceberg_eq_upsert" -> (TableRoundtrips.icebergEqUpsertRoundtrip _),
    "fmt_delta_optimize"   -> (TableRoundtrips.deltaOptimizeRoundtrip _),
    "fmt_iceberg_rewrite"  -> (TableRoundtrips.icebergRewriteRoundtrip _),
    "fmt_iceberg_rw_manifests" -> (TableRoundtrips.icebergRwManifestsRoundtrip _),
    "fmt_delta_pruned_read" -> (TableRoundtrips.deltaPrunedReadRoundtrip _),
    "fmt_iceberg_pruned_read" -> (TableRoundtrips.icebergPrunedReadRoundtrip _),
    "fmt_iceberg_addfiles" -> (TableRoundtrips.icebergAddFilesRoundtrip _),
    "fmt_delta_cdf"         -> (TableRoundtrips.deltaCdfRoundtrip _),
    "fmt_iceberg_incremental" -> (TableRoundtrips.icebergIncrementalRoundtrip _),
    "fmt_iceberg_wap"       -> (TableRoundtrips.icebergWapRoundtrip _),
    "fmt_txn_roundtrip"     -> (TableRoundtrips.txnMergeRoundtrip _),
    // vectors (S3 Vectors-shaped + ANN)
    "vec_knn_exact"       -> (Vectors.knnExact _),
    "vec_knn_euclidean"   -> (Vectors.knnEuclidean _),
    "vec_label_stats"     -> (Vectors.labelStats _),
    "vec_knn_lsh"         -> (Vectors.knnLsh _),
    "vec_near_dup"        -> (Vectors.embeddingNearDup _),
    // one operator, one knob (r11): default k ≈ ⌈√n⌉ scales with the
    // corpus — the scale-safe path; the _k row pins the explicit
    // fixed-k argument form
    "vec_semdedup"        -> ((s: SparkSession, d: String) => Vectors.semDedup(s, d)),
    "vec_semdedup_k"      -> ((s: SparkSession, d: String) =>
      Vectors.semDedup(s, d, k = Some(64))),
    "vec_ivf_search"      -> ((s: SparkSession, d: String) => Vectors.ivfSearch(s, d)),
    // PQ ANN: ADC over 8-byte codes + exact rerank. The codebook is the
    // exact-decimal deterministic one-step Lloyd's (trainPqExact), so
    // the FULL probe oracles against DuckDB (pqSearchOracle); PqSpec
    // additionally gates the codec exactly and recall@10 >= 0.6
    "vec_pq_search"       -> ((s: SparkSession, d: String) =>
      Vectors.pqSearch(s, d)),
    // composed IVF-PQ (r15): coarse-cell pruning + ADC codes + exact
    // rerank — the production ANN shape; probe build is deterministic
    // end-to-end (exact-decimal label centroids + exact codebook)
    "vec_ivfpq_search"    -> ((s: SparkSession, d: String) =>
      Vectors.ivfPqSearch(s, d)),
    // incremental IVF-PQ (r16): 90% indexed at build, held-out 10%
    // appended as a layer under the FROZEN base geometry; the probe
    // unions layers inside the probed cells and must answer exactly
    // what a rebuild under that geometry answers (the DuckDB twin
    // recomputes base-trained geometry applied to the full corpus)
    "vec_ivfpq_incr"      -> ((s: SparkSession, d: String) =>
      Vectors.ivfPqIncrSearch(s, d)),
    // metadata-filtered IVF-PQ (r16): the compiled filter document
    // lands pre-ADC inside the probed-cell codes scan — top-k exact
    // over the filtered population, reading less, never more
    "vec_ivfpq_filtered"  -> ((s: SparkSession, d: String) =>
      Vectors.ivfPqFilteredSearch(s, d)),
    // graph (Neptune-shaped)
    "graph_two_hop"       -> (Graph.twoHop _),
    "graph_motif"         -> (Graph.motif _),
    "graph_flatten_props" -> (Graph.flattenProps _),
    "graph_bgp"           -> (Rdf.bgpQuery _),
    "graph_cypher"        -> (Cypher.supplierRegionQuery _),
    "graph_gremlin"       -> (Gremlin.supplierInEuropeQuery _),
    "graph_gremlin_order" -> (Gremlin.asiaNationsWithSuppliersQuery _),
    "graph_wcc"           -> (Graph.wcc _),
    "graph_triangles"     -> (Graph.triangles _),
    // search (OpenSearch-shaped)
    "search_match_query"  -> (Search.matchQuery _),
    "search_dsl"          -> (Search.dslQuery _),
    "search_postings_query" -> (Postings.searchPostingsQuery _),
    "search_bm25"         -> (Postings.searchBm25Query _),
    // incremental postings maintenance (r15): base tree + appended
    // batch layer answer BM25 identically to a one-shot rebuild —
    // same oracle SQL, different index lifecycle
    "search_bm25_incr"    -> (Postings.searchBm25IncrementalQuery _),
    // log analytics (CloudWatch Logs Insights dialect)
    "logs_error_volume"   -> (LogsInsights.errorVolumeQuery _),
    "logs_last_event"     -> (LogsInsights.lastEventQuery _),
    // Trino-dialect front door (r11): Athena SQL text executed verbatim
    // through readSqlQuery's TrinoCompat shim
    "trino_read_sql"      -> (graft.sql.TrinoQueries.readSql _),
    "trino_unnest_ord"    -> (graft.sql.TrinoQueries.unnestOrdinality _),
    "trino_cast_json"     -> (graft.sql.TrinoQueries.castJson _),
    "trino_fn_tier2"      -> (graft.sql.TrinoQueries.fnTier2 _),
    "trino_fn_tier3"      -> (graft.sql.TrinoQueries.fnTier3 _),
    "trino_fn_tier3_agg"  -> (graft.sql.TrinoQueries.fnTier3Agg _),
    // data quality (DQDL-shaped)
    "dq_lineitem_ruleset" -> (DataQuality.lineitemRuleset _),
    "dq_orders_ruleset"   -> (DataQuality.ordersRuleset _),
    "dq_events_ruleset"   -> (DataQuality.eventsRuleset _),
    // multimodal plumbing (decode stage stubbed — no codecs in container);
    // the synthetic corpus is deterministic arithmetic over the id, so
    // the aggregate is fully oracled in DuckDB via range(1000)
    "mm_decode_features"  -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions._
      graft.multimodal.Multimodal
        .decodeFeatures(graft.multimodal.Multimodal.synthesize(s, 1000))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
    }),
    // REAL codec decode (round 7): genuine PNG/WAV payloads decoded by
    // the JDK's ImageIO / javax.sound codecs; the oracle reproduces the
    // decoder-reported geometry and frame counts from the synthesis
    // arithmetic — green certifies the encode→decode loop, not a fake
    "mm_real_decode"      -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions._
      graft.multimodal.Multimodal
        .decodeReal(graft.multimodal.Multimodal.synthesizeReal(s, 1000))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("modality") === "image",
            col("width").cast("long") * col("height")).otherwise(0L))
            .as("px_total"),
          sum(when(col("modality") === "audio", col("n_samples"))
            .otherwise(0L)).as("samp_total"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"  -> Relational.q1OracleSql,
    "q2_filter_project"   -> Relational.q2OracleSql,
    "q3_shipping_priority" -> Relational.q3OracleSql,
    "q4_semi_join"        -> Relational.q4OracleSql,
    "q5_local_supplier"   -> Relational.q5OracleSql,
    "q6_forecast_revenue" -> Relational.q6OracleSql,
    "q7_window_rank"      -> Relational.q7OracleSql,
    "q8_running_total"    -> Relational.q8OracleSql,
    "q9_rollup"           -> Relational.q9OracleSql,
    "q10_distinct"        -> Relational.q10OracleSql,
    "q11_set_ops"         -> Relational.q11OracleSql,
    "q12_case_agg"        -> Relational.q12OracleSql,
    "q13_order_count_dist" -> Relational.q13OracleSql,
    "q14_scalar_funcs"    -> Relational.q14OracleSql,
    "q15_having_subquery" -> Relational.q15OracleSql,
    "q16_theta_join"      -> Relational.q16OracleSql,
    "q17_in_not_exists"   -> Relational.q17OracleSql,
    "q18_lag_lead"        -> Relational.q18OracleSql,
    "q19_top_k"           -> Relational.q19OracleSql,
    "q20_cube"            -> Relational2.q20OracleSql,
    "q21_analytic_windows" -> Relational2.q21OracleSql,
    "q22_cte_chain"       -> Relational2.q22OracleSql,
    "q23_pivot"           -> Relational2.q23OracleSql,
    "q24_regex_strings"   -> Relational2.q24OracleSql,
    "q25_date_funcs"      -> Relational2.q25OracleSql,
    "q26_universal"       -> Relational2.q26OracleSql,
    "q27_null_handling"   -> Relational2.q27OracleSql,
    "q28_union_all"       -> Relational2.q28OracleSql,
    "q29_string_agg"      -> Relational2.q29OracleSql,
    "q30_percentiles"     -> Relational2.q30OracleSql,
    "q31_array_map_funcs" -> Relational2.q31OracleSql,
    "q33_range_frame"     -> Relational2.q33OracleSql,
    "q34_grouping_sets"   -> Relational3.q34OracleSql,
    "q35_lateral"         -> Relational3.q35OracleSql,
    "q36_intervals"       -> Relational3.q36OracleSql,
    "q32_topk_native" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3""".stripMargin,
    "text_token_stats"    -> Text.tokenStatsOracle,
    "text_classifier"     -> Text.classifierScoreOracle,
    "text_quality_score"  -> Text.qualityScoreOracle,
    "text_corpus_profile" -> Text.corpusProfileOracle,
    "text_fingerprint"    -> Text.fingerprintOracle,
    "text_lang_id"        -> Text.languageIdOracle,
    "text_bpe_tokens"     -> Text.bpeTokenCountOracle,
    "curate_decontaminate" -> Decontaminate.contaminationOracle,
    "curate_decontam_fuzzy" -> Decontaminate.contaminationFuzzyOracle,
    "curate_strat_sample"  -> Sampling.stratifiedSampleOracle,
    "curate_split"         -> Sampling.splitOracle,
    "text_repetition"     -> Curation.repetitionScoreOracle,
    "curate_pii_scrub"    -> Curation.piiScrubOracle,
    "curate_gopher_rules" ->
      Curation.gopherRulesOracle(Curation.CorpusStopWords),
    "curate_gopher_lines" -> Curation.gopherLineRulesOracle,
    "curate_c4_rules"     -> Curation.c4RulesOracle,
    "curate_gopher_rep"   -> Curation.gopherRepetitionOracle,
    "curate_token_shards" -> Curation.tokenShardsOracle,
    "curate_mix_uniform"  -> Curation.mixToUniformOracle,
    "curate_dsir_weights" -> Curation.dsirWeightsOracle,
    "curate_ppl_bucket"   -> Curation.perplexityBucketsOracle,
    "curate_pipeline"     -> Curation.curatePipelineOracle,
    "curate_pipeline_v2"  ->
      Curation.curatePipelineModernOracle(Curation.CorpusStopWords),
    "curate_pipeline_v3"  ->
      Curation.curatePipelineV3Oracle(Curation.CorpusStopWords),
    "curate_pack_chunks"  -> Curation.packChunksOracle,
    "dedup_exact_docs"    -> Dedup.exactDocDedupOracle,
    "dedup_incremental"   -> Dedup.incrementalDedupOracle,
    "dedup_daily_loop"    -> Dedup.dailyDedupLoopOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_minhash_lsh"   -> Dedup.minhashLshOracle,
    "dedup_lsh_capped"    -> Dedup.minhashLshCappedOracle,
    "dedup_lsh_routed"    -> Dedup.minhashDedupRoutedOracle,
    "dedup_minhash_keep"  -> Dedup.minhashDedupKeepOracle,
    // provable-recall gates for the Spark-specific hash families: the
    // xxhash64 candidate sets restricted to identical-token-set pairs
    // must equal the (SQL-computable) full pair list
    "dedup_minhash_fast"  -> Dedup.identicalTokenSetPairsOracle,
    "dedup_simhash"       -> Dedup.identicalTokenSetPairsOracle,
    "dedup_winnow"        -> Dedup.winnowDedupOracle,
    // CC transitive closure vs DuckDB's recursive label propagation
    "dedup_cc_keep"       -> Dedup.ccDedupOracle,
    "dedup_exact_segments" -> Dedup.exactSegmentDedupOracle,
    "dedup_substring"     -> Dedup.substrDedupOracle,
    "dedup_cc_best"       -> Dedup.ccBestKeepOracle,
    "ts_asof_join"        -> AsOf.clickToPurchaseOracle,
    "ts_tumbling_window"  -> TimeSeries.tumblingOracle,
    "ts_sliding_window"   -> TimeSeries.slidingOracle,
    "ts_sessionize"       -> TimeSeries.sessionizeOracle,
    "ts_top_users"        -> TimeSeries.topUsersOracle,
    "ts_interpolate"      -> TimeSeries.interpolateOracle,
    "ts_anomaly"          -> TimeSeries.anomalyOracle,
    "ts_ewma"             -> TimeSeries.ewmaOracle,
    "ts_cohort_retention" -> TimeSeries.cohortRetentionOracle,
    "ts_funnel"           -> TimeSeries.funnelOracle,
    "kv_point_lookup"     -> KeyValue.pointLookupOracle,
    "kv_range_query"      -> KeyValue.rangeQueryOracle,
    "kv_batch_get"        -> KeyValue.batchGetOracle,
    "kv_upsert_roundtrip" -> KeyValueWrite.upsertRoundtripOracle,
    "fmt_delta_roundtrip"   -> TableRoundtrips.mergeRoundtripOracle,
    "fmt_delta_dv_delete"   -> TableRoundtrips.deltaDvDeleteOracle,
    "fmt_iceberg_roundtrip" -> TableRoundtrips.mergeRoundtripOracle,
    "fmt_iceberg_day_roundtrip" -> TableRoundtrips.icebergDayRoundtripOracle,
    "fmt_iceberg_pos_delete" -> TableRoundtrips.icebergPosDeleteOracle,
    "fmt_iceberg_v3_dv"     -> TableRoundtrips.icebergV3DvOracle,
    "fmt_iceberg_lineage"   -> TableRoundtrips.icebergLineageOracle,
    "fmt_delta_row_ids"     -> TableRoundtrips.deltaRowIdsOracle,
    "fmt_iceberg_defaults"  -> TableRoundtrips.icebergDefaultsOracle,
    "fmt_sql_dml"           -> TableRoundtrips.sqlDmlOracle,
    "fmt_uniform_mirror"    -> TableRoundtrips.uniformMirrorOracle,
    "fmt_delta_clone"       -> TableRoundtrips.deltaCloneOracle,
    "fmt_iceberg_eq_upsert" -> TableRoundtrips.mergeRoundtripOracle,
    // compaction is result-INVARIANT: the oracles are the pre-compaction
    // states — any lost/resurrected row hash-mismatches
    "fmt_delta_optimize"   -> TableRoundtrips.deltaDvDeleteOracle,
    "fmt_iceberg_rewrite"  -> TableRoundtrips.mergeRoundtripOracle,
    "fmt_iceberg_rw_manifests" -> TableRoundtrips.mergeRoundtripOracle,
    "fmt_delta_pruned_read" -> TableRoundtrips.deltaPrunedReadOracle,
    "fmt_iceberg_pruned_read" -> TableRoundtrips.icebergPrunedReadOracle,
    "fmt_iceberg_addfiles" -> TableRoundtrips.icebergAddFilesOracle,
    "fmt_delta_cdf"         -> TableRoundtrips.deltaCdfOracle,
    "fmt_iceberg_incremental" -> TableRoundtrips.icebergIncrementalOracle,
    "fmt_iceberg_wap"       -> TableRoundtrips.icebergWapOracle,
    "fmt_txn_roundtrip"     -> TableRoundtrips.mergeRoundtripOracle,
    "vec_knn_exact"       -> Vectors.knnExactOracle,
    "vec_knn_euclidean"   -> Vectors.knnEuclideanOracle,
    "vec_label_stats"     -> Vectors.labelStatsOracle,
    "vec_knn_lsh"         -> Vectors.knnLshOracle,
    "vec_ivf_search"      -> Vectors.ivfSearchOracle,
    "vec_pq_search"       -> Vectors.pqSearchOracle,
    "vec_ivfpq_search"    -> Vectors.ivfPqSearchOracle,
    "vec_ivfpq_incr"      -> Vectors.ivfPqIncrSearchOracle,
    "curate_ppl_pinned"   -> Curation.curatePplPinnedOracle,
    "vec_ivfpq_filtered"  -> Vectors.ivfPqFilteredSearchOracle,
    "vec_near_dup"        -> Vectors.embeddingNearDupOracle,
    "vec_semdedup"        -> Vectors.semDedupOracle,
    "vec_semdedup_k"      -> Vectors.semDedupKOracle,
    "graph_two_hop"       -> Graph.twoHopOracle,
    "graph_motif"         -> Graph.motifOracle,
    "graph_flatten_props" -> Graph.flattenPropsOracle,
    // WCC vs DuckDB recursive label propagation over the same edge set
    "graph_wcc"           -> Graph.wccOracle,
    "graph_triangles"     -> Graph.trianglesOracle,
    "graph_bgp"           -> Rdf.bgpQueryOracle,
    "graph_cypher"        -> Cypher.supplierRegionOracle,
    "graph_gremlin"       -> Gremlin.supplierInEuropeOracle,
    "graph_gremlin_order" -> Gremlin.asiaNationsWithSuppliersOracle,
    "search_match_query"  -> Search.matchQueryOracle,
    "search_dsl"          -> Search.dslQueryOracle,
    // the postings pipeline reproduces the scan-based match exactly on a
    // whitespace-token corpus — same oracle text gates both plans
    "search_postings_query" -> Search.matchQueryOracle,
    "search_bm25"         -> Postings.searchBm25Oracle,
    "search_bm25_incr"    -> Postings.searchBm25Oracle,
    "logs_error_volume"   -> LogsInsights.errorVolumeOracle,
    "logs_last_event"     -> LogsInsights.lastEventOracle,
    "trino_read_sql"      -> graft.sql.TrinoQueries.readSqlOracle,
    "trino_unnest_ord"    -> graft.sql.TrinoQueries.unnestOrdinalityOracle,
    "trino_cast_json"     -> graft.sql.TrinoQueries.castJsonOracle,
    "trino_fn_tier2"      -> graft.sql.TrinoQueries.fnTier2Oracle,
    "trino_fn_tier3"      -> graft.sql.TrinoQueries.fnTier3Oracle,
    "trino_fn_tier3_agg"  -> graft.sql.TrinoQueries.fnTier3AggOracle,
    "dq_lineitem_ruleset" -> DataQuality.lineitemRulesetOracle,
    "dq_orders_ruleset"   -> DataQuality.ordersRulesetOracle,
    "dq_events_ruleset"   -> DataQuality.eventsRulesetOracle,
    "mm_decode_features"  -> graft.multimodal.Multimodal
      .decodeFeaturesOracle(1000),
    "mm_real_decode"      -> graft.multimodal.Multimodal
      .decodeRealOracle(1000),
  )
}
