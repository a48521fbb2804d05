package graft

import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + BASELINE.md gates. */
object SparkEntry {

  /** Flagship query (smoke-checked rows>0 at sf0.001): the reference's
    * stage-0..2 informative-sampling slice — KDE density profile of
    * l_extendedprice → inverse-density weights → Efraimidis–Spirakis top-100
    * informative sample (SURVEY.md §7 "minimum end-to-end slice"). */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagshipKdeSample(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01PricingSummary _),
    "q02_error_metrics" -> (Queries.q02ErrorMetrics _),
    "q03_histogram" -> (Queries.q03Histogram _),
    "q04_trapz" -> (Queries.q04Trapz _),
    "q05_minmax_scale" -> (Queries.q05MinMaxScale _),
    "q06_inv_density_weights" -> (Queries.q06InvDensityWeights _),
    "q07_middle_lookup" -> (Queries.q07MiddleLookup _),
    "q08_topk" -> (Queries.q08TopK _),
    "q09_pool_deletion" -> (Queries.q09PoolDeletion _),
    "q10_dedup_groups" -> (Queries.q10DedupGroups _),
    "q11_token_stats" -> (Queries.q11TokenStats _),
    "q12_quality" -> (Queries.q12Quality _),
    "q13_lang_id" -> (Queries.q13LangId _),
    "q14_fingerprints" -> (Queries.q14Fingerprints _),
    "q15_ngram_jaccard" -> (Queries.q15NgramJaccard _),
    "q16_cosine_topk" -> (Queries.q16CosineTopK _),
    "q17_embedding_pairs" -> (Queries.q17EmbeddingPairs _),
    "q18_json" -> (Queries.q18Json _),
    "q19_hourly" -> (Queries.q19Hourly _),
    "q20_revenue_by_nation" -> (Queries.q20RevenueByNation _),
    "q21_profile_orders" -> (Queries.q21ProfileOrders _),
    "q22_validate" -> (Queries.q22Validate _),
    "q23_dup_keys" -> (Queries.q23DupKeys _),
    "q24_window_sums" -> (Queries.q24WindowSums _),
    "q25_kde" -> (Queries.q25Kde _),
    "q26_weighted_sample" -> (Queries.q26WeightedSample _),
    "q27_sliding_windows" -> (Queries.q27SlidingWindows _),
    "q28_minhash_pairs" -> (Queries.q28MinhashPairs _),
    "q29_simhash_pairs" -> (Queries.q29SimhashPairs _),
    "q30_ann_ivf" -> (Queries.q30AnnIvf _),
    "q31_ann_topk_agg" -> (Queries.q31AnnTopKAgg _),
    "q32_grid_source" -> (Queries.q32GridSource _),
    "q33_lhs_strata" -> (Queries.q33LhsStrata _),
    "q34_pca_project" -> (Queries.q34PcaProject _),
    "q35_asof_join" -> (Queries.q35AsOfJoin _),
    "q36_sessionize" -> (Queries.q36Sessionize _),
    "q37_cube" -> (Queries.q37Cube _),
    "q38_ranking" -> (Queries.q38Ranking _),
    "q39_percentiles" -> (Queries.q39Percentiles _),
    "q40_left_join" -> (Queries.q40LeftJoin _),
    "q41_multi_distinct" -> (Queries.q41MultiDistinct _),
    "q42_stratified_sample" -> (Queries.q42StratifiedSample _),
    "q43_contamination" -> (Queries.q43Contamination _),
    "q44_dedup_clusters" -> (Queries.q44DedupClusters _),
    "q45_quality_gate" -> (Queries.q45QualityGate _),
    "q46_repetition" -> (Queries.q46Repetition _),
    "q47_range_join" -> (Queries.q47RangeJoin _),
    "q48_sketch_gates" -> (Queries.q48SketchGates _),
    "q49_interp_join" -> (Queries.q49InterpJoin _),
    "q50_heavy_hitters" -> (Queries.q50HeavyHitters _),
    "q51_robust_outliers" -> (Queries.q51RobustOutliers _),
    "q52_wav_roundtrip" -> (Queries.q52WavRoundtrip _),
    "q53_pgm_roundtrip" -> (Queries.q53PgmRoundtrip _),
    "q54_bdqa_trace" -> (Queries.q54BdqaTrace _),
    "q55_png_roundtrip" -> (Queries.q55PngRoundtrip _),
    "q56_aiff_roundtrip" -> (Queries.q56AiffRoundtrip _),
    "q57_ann_pq" -> (Queries.q57AnnPq _),
    "q58_mp3_metadata" -> (Queries.q58Mp3Metadata _),
    "q59_mp4_metadata" -> (Queries.q59Mp4Metadata _),
    "q60_bloom_decontaminate" -> (Queries.q60BloomDecontaminate _),
    "q61_sequence_packing" -> (Queries.q61SequencePacking _),
    "q62_mixture_sample" -> (Queries.q62MixtureSample _),
    "q63_zorder_cells" -> (Queries.q63ZOrderCells _),
    "q64_ann_ivfpq" -> (Queries.q64AnnIvfPq _),
    "q65_incremental_dedup" -> (Queries.q65IncrementalDedup _),
    "q66_corpus_to_dataloader" -> (Queries.q66CorpusToDataloader _),
    "q67_key_skew" -> (Queries.q67KeySkew _),
    "q68_vocab_encode" -> (Queries.q68VocabEncode _),
    "q69_compaction" -> (Queries.q69Compaction _),
    "q70_equidepth_bins" -> (Queries.q70EquiDepthBins _),
    "q71_group_limit" -> (Queries.q71GroupLimit _),
    "q72_pii_redaction" -> (Queries.q72PiiRedaction _),
    "q73_calibration" -> (Queries.q73Calibration _),
    "q74_embedding_lsh_recall" -> (Queries.q74EmbeddingLshRecall _),
    "q75_active_sampling_trace" -> (Queries.q75ActiveSamplingTrace _),
    "q76_hash_split" -> (Queries.q76HashSplit _),
    "q77_semantic_keepers" -> (Queries.q77SemanticKeepers _),
    "q78_doc_chunks" -> (Queries.q78DocChunks _),
    "q79_contamination_fraction" -> (Queries.q79ContaminationFraction _),
    "q80_embedding_incremental_admit" -> (Queries.q80EmbeddingIncrementalAdmit _),
    "q81_semdedup_keepers" -> (Queries.q81SemdedupKeepers _),
    "q82_dsir_selection" -> (Queries.q82DsirSelection _),
    "q83_bigram_cross_entropy" -> (Queries.q83BigramCrossEntropy _),
    "q84_duplicated_spans" -> (Queries.q84DuplicatedSpans _),
    "q85_bm25_topk" -> (Queries.q85Bm25TopK _),
    "q86_segment_dedup" -> (Queries.q86SegmentDedup _),
    "q87_quality_classifier" -> (Queries.q87QualityClassifier _),
    "q88_token_budget_plan" -> (Queries.q88TokenBudgetPlan _),
    "q89_bm25_indexed" -> (Queries.q89Bm25Indexed _),
    "q90_entropy_stats" -> (Queries.q90EntropyStats _),
    "q91_funnel" -> (Queries.q91Funnel _),
    "q92_retention" -> (Queries.q92Retention _),
    "q93_image_phash_dedup" -> (Queries.q93ImagePhashDedup _),
    "q94_anomaly_zscores" -> (Queries.q94AnomalyZScores _),
    "q95_audio_fingerprint_dedup" -> (Queries.q95AudioFingerprintDedup _),
    "q96_funnel_windowed" -> (Queries.q96FunnelWindowed _),
    "q97_neyman_sample" -> (Queries.q97NeymanSample _),
    "q98_rendezvous_shards" -> (Queries.q98RendezvousShards _),
    "q99_salted_join" -> (Queries.q99SaltedJoin _),
    "q100_curation_audit" -> (Queries.q100CurationAudit _),
    "q101_chunk_bm25" -> (Queries.q101ChunkBm25 _),
    "q102_group_percent_rank" -> (Queries.q102GroupPercentRank _),
    "q103_bpe_tokenizer" -> (Queries.q103BpeTokenizer _),
    "q104_corpus_drift" -> (Queries.q104CorpusDrift _),
    "q105_hybrid_rrf" -> (Queries.q105HybridRrf _)
  )

  /** DuckDB oracles for EVERY query above — since round 3 none are
    * rows-only: the non-SQL-native ops (KDE, sampling, LSH, ANN, PCA) run
    * in engine-portable modes or emit closed-form invariant gates. */
  def oracleSql: Map[String, String] = Oracles.all
}
