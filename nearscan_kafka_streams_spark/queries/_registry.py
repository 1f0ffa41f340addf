"""Registry tail: QUERIES / ORACLES dicts and the driver-rotation
lanes (ordering contract pinned by tests/test_rotation_contract.py).

Verbatim slice of the former single-module queries.py (registry
order and behavior unchanged; see __init__.py)."""
from __future__ import annotations

from ._base import (  # noqa: F401
    Callable,
    DataFrame,
    SparkSession,
)
from .relational import (  # noqa: F401
    BM25_SQL,
    BROADCAST_DIM_SQL,
    CUBE_SQL,
    DISTINCT_AGG_SQL,
    EXISTS_SQL,
    FILTER_PROJECT_SQL,
    FULL_OUTER_SQL,
    FUNNEL_SQL,
    GROUPING_SETS_SQL,
    HAVING_SQL,
    HEAVY_HITTERS_SQL,
    MOVING_AVG_SQL,
    OUTLIERS_IQR_SQL,
    Q10_SQL,
    Q11_SQL,
    Q12_SQL,
    Q13_SQL,
    Q14_SQL,
    Q15_SQL,
    Q16_SQL,
    Q17_SQL,
    Q18_SQL,
    Q19_SQL,
    Q1_SQL,
    Q20_SQL,
    Q21_SQL,
    Q22_SQL,
    Q2_SQL,
    Q3_SQL,
    Q4_SQL,
    Q5_SQL,
    Q6_SQL,
    Q7_SQL,
    Q8_SQL,
    Q9_SQL,
    RANGE_JOIN_SQL,
    RESAMPLE_GAPFILL_SQL,
    RETENTION_SQL,
    ROLLUP_SQL,
    SEMI_ANTI_SQL,
    SESSIONIZE_SQL,
    SET_OPS_SQL,
    TOPK_SQL,
    WINDOW_DISTRIBUTION_SQL,
    WINDOW_LAG_SQL,
    WINDOW_RANK_SQL,
    bm25_retrieval,
    broadcast_dim_join,
    cube_events,
    distinct_agg_orders,
    exists_subquery_suppliers,
    filter_project_scan,
    full_outer_join_nations,
    funnel_events,
    grouping_sets_orders,
    having_big_customers,
    heavy_hitters_words,
    moving_avg_events,
    outliers_iqr_events,
    q10_returned_items,
    q11_important_parts,
    q12_priority_lines,
    q13_customer_distribution,
    q14_promo_revenue,
    q15_top_supplier,
    q16_supplier_part_counts,
    q17_small_quantity_revenue,
    q18_large_orders,
    q19_discounted_revenue,
    q1_pricing_summary,
    q20_dominant_suppliers,
    q21_latest_shippers,
    q22_dormant_customers,
    q2_min_cost_supplier,
    q3_shipping_priority,
    q4_order_priority,
    q5_local_supplier_volume,
    q6_forecast_revenue,
    q7_volume_shipping,
    q8_market_share,
    q9_profit_by_nation,
    range_join_pricebands,
    resample_gapfill_events,
    retention_cohorts_events,
    rollup_region_nation,
    semi_anti_join_customers,
    sessionize_events,
    set_ops_customers,
    topk_orders,
    window_distribution_orders,
    window_lag_events,
    window_rank_orders,
)
from .topology import (  # noqa: F401
    ARRAY_AGG_SQL,
    ASOF_JOIN_SQL,
    DEDUP_EVENTS_SQL,
    FLATMAP_SQL,
    INTERVAL_JOIN_SQL,
    JSON_EXTRACT_SQL,
    RUNNING_BALANCE_SQL,
    SCALAR_FN_SQL,
    SESSION_WINDOW_SQL,
    SLIDING_SQL,
    TUMBLING_SQL,
    approx_sketches_events,
    array_agg_events,
    asof_join_events,
    dedup_events,
    flatmap_legs_events,
    interval_join_events,
    json_extract_events,
    running_balance_events,
    scalar_functions_events,
    session_window_events,
    sliding_window_events,
    tumbling_window_events,
)
from .text import (  # noqa: F401
    CORPUS_CLEAN_SQL,
    CORPUS_CURATE_SQL,
    DOC_LENGTH_HIST_SQL,
    FINGERPRINT_SQL,
    HASH_SAMPLE_SQL,
    LANG_ID_SQL,
    PERCENTILE_SQL,
    PIVOT_ORDERS_SQL,
    PROFILE_ORDERS_SQL,
    QUALITY_SQL,
    STRATIFIED_SAMPLE_SQL,
    SUBSTRING_SPANS_SQL,
    TERM_DOC_STATS_SQL,
    TEXT_REPETITION_SQL,
    TEXT_SCRUB_SQL,
    TOKEN_COUNT_SQL,
    TOKEN_SHARDS_SQL,
    UNPIVOT_SQL,
    VOCAB_TOPK_SQL,
    WINNOWED_SPANS_SQL,
    corpus_clean_pipeline,
    corpus_curate_pipeline,
    dedup_substring_spans,
    dedup_winnowed_spans,
    doc_length_histogram,
    hash_sample_events,
    percentile_acctbal,
    pivot_orders,
    profile_orders,
    stratified_sample_documents,
    term_doc_stats,
    text_fingerprint,
    text_lang_id,
    text_quality_score,
    text_repetition,
    text_scrub,
    text_token_count,
    token_budget_shards,
    unpivot_lineitem,
    vocab_topk,
)
from .dedup import (  # noqa: F401
    DEDUP_CLUSTERS_SQL,
    DEDUP_EXACT_SQL,
    EMB_ALLPAIRS_SQL,
    NGRAM_CONTAINMENT_SQL,
    NGRAM_JACCARD_SQL,
    dedup_clusters,
    dedup_clusters_star,
    dedup_embedding_allpairs,
    dedup_embedding_cosine,
    dedup_exact_documents,
    dedup_minhash_lsh,
    dedup_ngram_containment,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from .similarity import (  # noqa: F401
    ANN_BRUTEFORCE_SQL,
    ann_bruteforce_cosine,
    ann_ivf_append_fullprobe,
    ann_ivf_cosine,
    ann_ivf_fullprobe_cosine,
    ann_ivf_persisted_fullprobe,
    ann_lsh_cosine,
    ann_lsh_fullbucket_cosine,
    ann_pq_cosine,
    ann_pq_fullrerank_cosine,
)
from .corpus_ops import (  # noqa: F401
    BIGRAM_COVERAGE_SQL,
    BLOOM_PRUNE_JOIN_SQL,
    BPE_ZERO_MERGE_SQL,
    CHISQ_SQL,
    CHUNK_DOCUMENTS_SQL,
    CONTRASTIVE_PAIRS_SQL,
    CURRICULUM_SQL,
    DATA_QUALITY_SQL,
    DECONTAM_SQL,
    DEDUP_CANONICAL_SQL,
    DEDUP_SEMANTIC_SQL,
    EWMA_SQL,
    FORWARD_FILL_SQL,
    FRAME_SAMPLE_SQL,
    FUZZY_MATCH_SQL,
    GOPHER_GATES_SQL,
    GROUP_SPLIT_SQL,
    HARD_NEGATIVE_SQL,
    IMPORTANCE_SQL,
    INTERLEAVE_SQL,
    KMEANS_SQL,
    KNN_CLASSIFY_SQL,
    LENGTH_BUCKET_SQL,
    LISTAGG_SQL,
    LM_PERPLEXITY_SQL,
    MINHASH_MD5_SQL,
    MIXTURE_BUDGET_SQL,
    MIXTURE_UPSAMPLE_SQL,
    MULTIMODAL_DECODE_SQL,
    MULTIMODAL_META_SQL,
    NORMALIZE_SQL,
    PACK_SEQUENCES_SQL,
    PAGERANK_SQL,
    PSEUDONYMIZE_SQL,
    RANGE_FRAME_SQL,
    RECURSIVE_CTE_SQL,
    REPEATED_CHUNKS_SQL,
    RETRIEVAL_EVAL_SQL,
    SALTED_AGG_SQL,
    SALTED_JOIN_SQL,
    SCD2_PIT_SQL,
    SCD2_SQL,
    SENTENCE_UDTF_SQL,
    SHUFFLE_SHARDS_SQL,
    SNAPSHOT_DIFF_SQL,
    SOURCE_OVERLAP_SQL,
    SQL_TEXT_SQL,
    STORE_CHANGELOG_SQL,
    TEXT_NORMALIZE_SQL,
    TOKEN_ACCOUNTING_SQL,
    VARIANT_JSON_SQL,
    WEIGHTED_SAMPLE_SQL,
    _quality_model_sql,
    ann_bruteforce_gemm,
    bigram_coverage_score,
    bloom_prune_join_orders,
    bpe_token_stats,
    bpe_zero_merge_stats,
    chisq_lang_source,
    chunk_documents,
    contrastive_pairs,
    curriculum_bins_documents,
    data_quality_orders,
    decontaminate_documents,
    dedup_canonical_by_source,
    dedup_minhash_banded_md5,
    dedup_repeated_chunks,
    dedup_semantic,
    ewma_events,
    forward_fill_events,
    fuzzy_match_parts,
    gopher_quality_gates,
    group_split_documents,
    hard_negative_mining,
    hll_distinct_events,
    importance_reweight_documents,
    interleave_mixture_schedule,
    kmeans_embeddings,
    knn_classify_embeddings,
    length_bucket_batches,
    listagg_order_history,
    lm_perplexity_documents,
    mixture_budget_sample,
    mixture_upsample_documents,
    multimodal_decode,
    multimodal_frame_sample,
    multimodal_metadata,
    normalize_events_features,
    pack_training_sequences,
    pagerank_events,
    pseudonymize_events,
    quality_model_score,
    range_frame_events,
    recursive_cte_hierarchy,
    retrieval_eval_metrics,
    salted_hot_key_agg,
    salted_skew_join_events,
    scd2_point_in_time_join,
    scd2_user_state,
    sentence_split_udtf,
    shuffle_shards,
    snapshot_diff_events,
    source_overlap_matrix,
    sql_text_interface,
    store_changelog_events,
    text_normalize_documents,
    token_accounting_documents,
    variant_json_events,
    weighted_sample_documents,
)
from .round5 import (  # noqa: F401
    ASOF_NEAREST_SQL,
    CHAR_ENTROPY_SQL,
    COLLOCATION_SQL,
    CO_EVENT_EDGES_SQL,
    CROSS_DOC_SENTENCES_SQL,
    EQUIDEPTH_SQL,
    INVERTED_INDEX_SQL,
    K_ANONYMITY_SQL,
    TRIANGLE_SQL,
    TWAP_SQL,
    asof_nearest_events,
    char_entropy_documents,
    co_event_edges_users,
    collocation_lift_documents,
    dedup_cross_doc_sentences,
    equidepth_histogram_orders,
    inverted_index_terms,
    k_anonymity_documents,
    triangle_count_users,
    twap_events,
)
from .round6 import (  # noqa: F401
    ACTIVITY_STREAKS_SQL,
    ATTRIBUTION_SQL,
    AUC_LANG_QUALITY_SQL,
    BENFORD_SQL,
    BFS_REACH_SQL,
    CALIBRATION_BINS_SQL,
    COHENS_KAPPA_SQL,
    CONVERSION_LAG_SQL,
    DEDUP_CLUSTER_CENSUS_SQL,
    EDIT_DISTANCE_SQL,
    FERTILITY_SQL,
    GAP_ISLANDS_SQL,
    GINI_SQL,
    HHI_SQL,
    KS_DRIFT_SQL,
    LABEL_PROPAGATION_SQL,
    L_DIVERSITY_SQL,
    MARKOV_TRANSITIONS_SQL,
    NEW_VS_RETURNING_SQL,
    NGRAM_NOVELTY_SQL,
    OHLC_BARS_SQL,
    OUTLIERS_MAD_SQL,
    PARETO_FRONTIER_SQL,
    PERCENTILES_GLOBAL_SQL,
    PSI_DRIFT_SQL,
    RFM_SQL,
    SEASONAL_ANOMALY_SQL,
    SORTED_NEIGHBORHOOD_SQL,
    TREND_SLOPE_SQL,
    USER_SATURATION_SQL,
    WEIGHTED_MEDIAN_SQL,
    WOW_CHANGE_SQL,
    activity_streaks_users,
    attribution_events,
    auc_lang_quality_documents,
    benford_digits_orders,
    bfs_reachability_users,
    calibration_bins_documents,
    cohens_kappa_documents,
    conversion_lag_events,
    dedup_cluster_census,
    dedup_edit_distance_titles,
    gap_islands_events,
    gini_user_activity_events,
    hhi_concentration_events,
    ks_drift_events,
    l_diversity_documents,
    label_propagation_users,
    markov_transitions_events,
    new_vs_returning_events,
    ngram_novelty_sources,
    ohlc_bars_events,
    outliers_mad_events,
    pareto_frontier_orders,
    percentiles_global_lineitem,
    psi_drift_documents,
    rfm_segments_customers,
    seasonal_anomaly_events,
    sorted_neighborhood_customers,
    tokenizer_fertility_documents,
    trend_slope_users,
    user_saturation_events,
    weighted_median_lineitem,
    wow_change_events,
)
from .round7 import (  # noqa: F401
    ASSOCIATION_RULES_SQL,
    BEHAVIORAL_ENTROPY_SQL,
    BUCKETED_JOIN_SQL,
    CLUSTERING_COEFF_SQL,
    DEDUP_NEAR_TIME_SQL,
    DEDUP_THRESHOLD_SWEEP_SQL,
    DUPLICATE_SHARE_SQL,
    EMBEDDING_DIM_STATS_SQL,
    EMBEDDING_GRAM_SQL,
    HYBRID_RRF_SQL,
    LABEL_CENTROID_SQL,
    LANG_CONFUSION_SQL,
    MINHASH_PR_AUDIT_SQL,
    QUALITY_BUDGET_CURVE_SQL,
    REFERENTIAL_INTEGRITY_SQL,
    TOP_PATHS_SQL,
    ZORDER_LAYOUT_SQL,
    association_rules_lineitem,
    behavioral_entropy_users,
    bucketed_join_lineitem,
    clustering_coefficient_users,
    dedup_near_time_events,
    dedup_threshold_sweep,
    duplicate_share_by_source,
    embedding_dim_stats,
    embedding_gram_matrix,
    hybrid_rrf_retrieval,
    label_centroid_similarity,
    lang_id_confusion,
    minhash_candidate_pr_audit,
    quality_budget_curve_documents,
    referential_integrity_audit,
    top_paths_sessions,
    zorder_layout_lineitem,
)
from .round7w8 import (  # noqa: F401
    AUTOCORR_SQL,
    BOILERPLATE_PREFIX_SQL,
    CLUSTER_SOURCE_SPAN_SQL,
    DEGREE_ASSORTATIVITY_SQL,
    INTERARRIVAL_SQL,
    JOIN_FANOUT_SQL,
    K_CORE_SQL,
    MONOTONIC_VIOLATIONS_SQL,
    MUTUAL_NN_SQL,
    SCAN_PRUNING_SQL,
    TRIMMED_MEAN_SQL,
    T_CLOSENESS_SQL,
    WATERFILL_SQL,
    autocorr_events,
    boilerplate_prefix_census,
    dedup_cluster_source_span,
    degree_assortativity_users,
    interarrival_histogram_events,
    join_fanout_audit,
    k_core_peel_users,
    monotonic_violations_orders,
    mutual_nn_pairs_embeddings,
    scan_pruning_audit_lineitem,
    t_closeness_documents,
    token_budget_waterfill_sources,
    trimmed_mean_lineitem,
)

# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Registry order is deliberate: the driver's correctness gate walks the
# dict in insertion order under a budget (round 2 checked only the
# first 50 of 59).  Cheap core queries lead, then the entries the
# driver has not yet hash-checked (round-2 tail), then the rest, with
# the heaviest repeatedly-verified pipelines last so a budget cut-off
# costs re-verification, never first verification.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ORDERING CONTRACT: the driver's correctness gate walks this dict in
    # order under a ~50-query budget, so entries the driver has NOT yet
    # hash-verified (or whose implementation changed this round) must come
    # FIRST; entries green in the immediately-previous round go last.
    #
    # --- round-6 additions (never verified) ---
    "twap_events": twap_events,
    "triangle_count_users": triangle_count_users,
    "collocation_lift_documents": collocation_lift_documents,
    "char_entropy_documents": char_entropy_documents,
    "inverted_index_terms": inverted_index_terms,
    "dedup_cross_doc_sentences": dedup_cross_doc_sentences,
    "k_anonymity_documents": k_anonymity_documents,
    "equidepth_histogram_orders": equidepth_histogram_orders,
    "asof_nearest_events": asof_nearest_events,
    # --- round-6 second wave (never verified) ---
    "pareto_frontier_orders": pareto_frontier_orders,
    "label_propagation_users": label_propagation_users,
    "markov_transitions_events": markov_transitions_events,
    "attribution_events": attribution_events,
    "dedup_edit_distance_titles": dedup_edit_distance_titles,
    "psi_drift_documents": psi_drift_documents,
    "ngram_novelty_sources": ngram_novelty_sources,
    "user_saturation_events": user_saturation_events,
    # --- round-6 third wave (never verified) ---
    "rfm_segments_customers": rfm_segments_customers,
    "benford_digits_orders": benford_digits_orders,
    "tokenizer_fertility_documents": tokenizer_fertility_documents,
    "bfs_reachability_users": bfs_reachability_users,
    "hhi_concentration_events": hhi_concentration_events,
    "percentiles_global_lineitem": percentiles_global_lineitem,
    "outliers_mad_events": outliers_mad_events,
    "gini_user_activity_events": gini_user_activity_events,
    "sorted_neighborhood_customers": sorted_neighborhood_customers,
    # --- round-6 fifth wave: model-eval / drift exacts (never verified) ---
    "auc_lang_quality_documents": auc_lang_quality_documents,
    "calibration_bins_documents": calibration_bins_documents,
    "ohlc_bars_events": ohlc_bars_events,
    "ks_drift_events": ks_drift_events,
    "trend_slope_users": trend_slope_users,
    "cohens_kappa_documents": cohens_kappa_documents,
    # --- round-6 sixth wave (never verified) ---
    "l_diversity_documents": l_diversity_documents,
    "seasonal_anomaly_events": seasonal_anomaly_events,
    "weighted_median_lineitem": weighted_median_lineitem,
    # --- round-6 seventh wave (never verified) ---
    "gap_islands_events": gap_islands_events,
    "wow_change_events": wow_change_events,
    "activity_streaks_users": activity_streaks_users,
    # --- round-6 eighth wave (never verified) ---
    "conversion_lag_events": conversion_lag_events,
    "new_vs_returning_events": new_vs_returning_events,
    "dedup_cluster_census": dedup_cluster_census,
    # round-7 additions
    "association_rules_lineitem": association_rules_lineitem,
    "referential_integrity_audit": referential_integrity_audit,
    "behavioral_entropy_users": behavioral_entropy_users,
    "duplicate_share_by_source": duplicate_share_by_source,
    "dedup_near_time_events": dedup_near_time_events,
    "embedding_dim_stats": embedding_dim_stats,
    "label_centroid_similarity": label_centroid_similarity,
    "embedding_gram_matrix": embedding_gram_matrix,
    "zorder_layout_lineitem": zorder_layout_lineitem,
    "quality_budget_curve_documents": quality_budget_curve_documents,
    "top_paths_sessions": top_paths_sessions,
    "clustering_coefficient_users": clustering_coefficient_users,
    "bucketed_join_lineitem": bucketed_join_lineitem,
    "hybrid_rrf_retrieval": hybrid_rrf_retrieval,
    "minhash_candidate_pr_audit": minhash_candidate_pr_audit,
    "lang_id_confusion": lang_id_confusion,
    "co_event_edges_users": co_event_edges_users,
    "dedup_threshold_sweep": dedup_threshold_sweep,
    # --- new round 4 (never verified then) ---
    "dedup_ngram_containment": dedup_ngram_containment,
    "weighted_sample_documents": weighted_sample_documents,
    "mixture_upsample_documents": mixture_upsample_documents,
    "bloom_prune_join_orders": bloom_prune_join_orders,
    "hll_distinct_events": hll_distinct_events,
    "data_quality_orders": data_quality_orders,
    "interleave_mixture_schedule": interleave_mixture_schedule,
    "chisq_lang_source": chisq_lang_source,
    "scd2_point_in_time_join": scd2_point_in_time_join,
    "bpe_zero_merge_stats": bpe_zero_merge_stats,
    "text_normalize_documents": text_normalize_documents,
    "length_bucket_batches": length_bucket_batches,
    "recursive_cte_hierarchy": recursive_cte_hierarchy,
    "variant_json_events": variant_json_events,
    "pseudonymize_events": pseudonymize_events,
    "range_frame_events": range_frame_events,
    "forward_fill_events": forward_fill_events,
    "sentence_split_udtf": sentence_split_udtf,
    "listagg_order_history": listagg_order_history,
    "source_overlap_matrix": source_overlap_matrix,
    "token_accounting_documents": token_accounting_documents,
    "pagerank_events": pagerank_events,
    "ewma_events": ewma_events,
    "fuzzy_match_parts": fuzzy_match_parts,
    "retrieval_eval_metrics": retrieval_eval_metrics,
    "group_split_documents": group_split_documents,
    "curriculum_bins_documents": curriculum_bins_documents,
    "kmeans_embeddings": kmeans_embeddings,
    "lm_perplexity_documents": lm_perplexity_documents,
    "salted_skew_join_events": salted_skew_join_events,
    "normalize_events_features": normalize_events_features,
    "hard_negative_mining": hard_negative_mining,
    "ann_bruteforce_gemm": ann_bruteforce_gemm,
    "store_changelog_events": store_changelog_events,
    "scd2_user_state": scd2_user_state,
    "gopher_quality_gates": gopher_quality_gates,
    "contrastive_pairs": contrastive_pairs,
    # --- similarity family: implementation changed this round (norm
    # precompute + GEMM refactor) -> must re-verify first ---
    "ann_bruteforce_cosine": ann_bruteforce_cosine,
    "ann_lsh_cosine": ann_lsh_cosine,
    "ann_ivf_cosine": ann_ivf_cosine,
    "ann_ivf_fullprobe_cosine": ann_ivf_fullprobe_cosine,
    "ann_lsh_fullbucket_cosine": ann_lsh_fullbucket_cosine,
    "ann_pq_cosine": ann_pq_cosine,
    "ann_pq_fullrerank_cosine": ann_pq_fullrerank_cosine,
    "dedup_embedding_allpairs": dedup_embedding_allpairs,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_semantic": dedup_semantic,
    "knn_classify_embeddings": knn_classify_embeddings,
    "snapshot_diff_events": snapshot_diff_events,
    "importance_reweight_documents": importance_reweight_documents,
    "pack_training_sequences": pack_training_sequences,
    "dedup_repeated_chunks": dedup_repeated_chunks,
    "shuffle_shards": shuffle_shards,
    "ann_ivf_append_fullprobe": ann_ivf_append_fullprobe,
    "sliding_window_events": sliding_window_events,
    "session_window_events": session_window_events,
    "grouping_sets_orders": grouping_sets_orders,
    "range_join_pricebands": range_join_pricebands,
    "window_distribution_orders": window_distribution_orders,
    "heavy_hitters_words": heavy_hitters_words,
    "resample_gapfill_events": resample_gapfill_events,
    "outliers_iqr_events": outliers_iqr_events,
    "bm25_retrieval": bm25_retrieval,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_latest_shippers": q21_latest_shippers,
    "bigram_coverage_score": bigram_coverage_score,
    "ann_ivf_persisted_fullprobe": ann_ivf_persisted_fullprobe,
    "funnel_events": funnel_events,
    "retention_cohorts_events": retention_cohorts_events,
    "full_outer_join_nations": full_outer_join_nations,
    "moving_avg_events": moving_avg_events,
    # --- changed this round (must re-verify) ---
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "dedup_canonical_by_source": dedup_canonical_by_source,
    # --- not driver-verified since round 1/2 (judge-only in r3) ---
    "dedup_events": dedup_events,
    "interval_join_events": interval_join_events,
    "running_balance_events": running_balance_events,
    "flatmap_legs_events": flatmap_legs_events,
    "json_extract_events": json_extract_events,
    "asof_join_events": asof_join_events,
    "scalar_functions_events": scalar_functions_events,
    "cube_events": cube_events,
    "sessionize_events": sessionize_events,
    "array_agg_events": array_agg_events,
    "approx_sketches_events": approx_sketches_events,
    "tumbling_window_events": tumbling_window_events,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_repetition": text_repetition,
    "text_scrub": text_scrub,
    "vocab_topk": vocab_topk,
    "doc_length_histogram": doc_length_histogram,
    "profile_orders": profile_orders,
    "stratified_sample_documents": stratified_sample_documents,
    "token_budget_shards": token_budget_shards,
    "hash_sample_events": hash_sample_events,
    "dedup_exact_documents": dedup_exact_documents,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "unpivot_lineitem": unpivot_lineitem,
    "term_doc_stats": term_doc_stats,
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_winnowed_spans": dedup_winnowed_spans,
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "corpus_curate_pipeline": corpus_curate_pipeline,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_clusters": dedup_clusters,
    # --- driver-green in round 3 (CORRECTNESS_r03.json) ---
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "broadcast_dim_join": broadcast_dim_join,
    "filter_project_scan": filter_project_scan,
    "topk_orders": topk_orders,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "q12_priority_lines": q12_priority_lines,
    "q18_large_orders": q18_large_orders,
    "q22_dormant_customers": q22_dormant_customers,
    "sql_text_interface": sql_text_interface,
    "chunk_documents": chunk_documents,
    "dedup_minhash_banded_md5": dedup_minhash_banded_md5,
    "mixture_budget_sample": mixture_budget_sample,
    "salted_hot_key_agg": salted_hot_key_agg,
    "decontaminate_documents": decontaminate_documents,
    "quality_model_score": quality_model_score,
    "bpe_token_stats": bpe_token_stats,
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode": multimodal_decode,
    "multimodal_frame_sample": multimodal_frame_sample,
    "dedup_simhash": dedup_simhash,
    "dedup_clusters_star": dedup_clusters_star,
    "window_rank_orders": window_rank_orders,
    "window_lag_events": window_lag_events,
    "set_ops_customers": set_ops_customers,
    "rollup_region_nation": rollup_region_nation,
    "pivot_orders": pivot_orders,
    "percentile_acctbal": percentile_acctbal,
    "having_big_customers": having_big_customers,
    "semi_anti_join_customers": semi_anti_join_customers,
    "exists_subquery_suppliers": exists_subquery_suppliers,
    "distinct_agg_orders": distinct_agg_orders,
    "t_closeness_documents": t_closeness_documents,
    "autocorr_events": autocorr_events,
    "degree_assortativity_users": degree_assortativity_users,
    "join_fanout_audit": join_fanout_audit,
    "interarrival_histogram_events": interarrival_histogram_events,
    "monotonic_violations_orders": monotonic_violations_orders,
    "trimmed_mean_lineitem": trimmed_mean_lineitem,
    # round-8 additions
    "mutual_nn_pairs_embeddings": mutual_nn_pairs_embeddings,
    "k_core_peel_users": k_core_peel_users,
    "scan_pruning_audit_lineitem": scan_pruning_audit_lineitem,
    "token_budget_waterfill_sources": token_budget_waterfill_sources,
    "boilerplate_prefix_census": boilerplate_prefix_census,
    "dedup_cluster_source_span": dedup_cluster_source_span,
}

# ROUND-7 ROTATION (ordering contract): the driver hash-samples the
# FIRST ~50 registry entries each round, so ordering IS the
# verification schedule.  Lanes, front to back:
#   1. _REVERIFY_R7 -- previously-FAILED-then-fixed entries whose fix
#      the driver has never re-sampled.  This lane exists because the
#      round-6 verdict found sessionize_events green only from round 1
#      (its round-2 TIMESTAMP_NTZ failure was fixed in round 2 code
#      but never driver-re-sampled in four rounds); failed-then-fixed
#      entries now ALWAYS outrank new work.
#   2. _ROUND7_NEW -- never-driver-sampled entries added this round.
#   3. _CHANGED_R7 -- entries whose implementation changed this round
#      (appended as edits land); green history no longer describes the
#      current code, so they re-verify.
#   4. _STALE_R7 -- the re-verification backlog, oldest-green first:
#      all entries whose last driver hash-match is round 2, then
#      round 3, then round 4 (per CORRECTNESS_r0{2,3,4}.json); the 45
#      round-6-green front entries rotate to the back.
# Remainder (rounds-5/6 green + the declared no_oracle approximates,
# each pinned by an exact hash-matched sibling) keeps prior order.
# Budget arithmetic (driver samples ~50): 1 reverify + 25 new + 11
# changed = 37 lanes 1-3, leaving ~13 stale re-verifications this
# round -- short of the round-6 verdict's hoped-for >=20 because the
# round produced 36 genuinely new/changed entries, which the standing
# contract (and that same verdict's item 2) puts first.  The stale
# backlog is ordered oldest-green-first so whatever budget remains
# always lands on the most overdue entries.
_REVERIFY_R7 = [
    "sessionize_events",
]
_ROUND7_NEW: list[str] = [
    "association_rules_lineitem",
    "referential_integrity_audit",
    "behavioral_entropy_users",
    "duplicate_share_by_source",
    "dedup_near_time_events",
    "embedding_dim_stats",
    "label_centroid_similarity",
    "embedding_gram_matrix",
    "zorder_layout_lineitem",
    "quality_budget_curve_documents",
    "top_paths_sessions",
    "clustering_coefficient_users",
    "bucketed_join_lineitem",
    "hybrid_rrf_retrieval",
    "minhash_candidate_pr_audit",
    "lang_id_confusion",
    "co_event_edges_users",
    "dedup_threshold_sweep",
    "t_closeness_documents",
    "autocorr_events",
    "degree_assortativity_users",
    "join_fanout_audit",
    "interarrival_histogram_events",
    "monotonic_violations_orders",
    "trimmed_mean_lineitem",
]
_CHANGED_R7: list[str] = [
    # triangle census edge construction factored into the shared
    # _co_event_edges builder (now also feeding the clustering
    # coefficient); same semantics, but the code changed, so the
    # green history no longer describes it
    "triangle_count_users",
    # integer-score leg factored into _bm25_scored_docs (now shared
    # with the hybrid RRF fusion); published top-20 unchanged
    "bm25_retrieval",
    # candidate builder factored into _md5_banded_candidates (now also
    # feeding the PR audit's 2x4 geometry); published pairs unchanged
    "dedup_minhash_banded_md5",
    # spread+persist the scored survivor frame; explicit repartition
    # before the shingle join (AQE had coalesced it to ~1 partition)
    "corpus_clean_pipeline",
    # decimal(38,0) cast-before-multiply overflow fixes (round-6
    # ADVICE): products formerly formed in BIGINT could wrap at scale
    "trend_slope_users",
    "auc_lang_quality_documents",
    "cohens_kappa_documents",
    # cluster family grew an optional edges= staging parameter (the
    # driver exercises the 2-arg default path, which must stay green)
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_cluster_census",
]
_STALE_R7 = [
    # last hash-green round 2
    "array_agg_events", "asof_join_events", "corpus_curate_pipeline",
    "cube_events", "dedup_events", "dedup_exact_documents",
    "dedup_substring_spans", "dedup_winnowed_spans",
    "doc_length_histogram", "flatmap_legs_events", "hash_sample_events",
    "interval_join_events", "json_extract_events", "profile_orders",
    "running_balance_events", "scalar_functions_events",
    "stratified_sample_documents", "term_doc_stats", "text_fingerprint",
    "text_lang_id", "text_quality_score", "text_repetition",
    "text_scrub", "text_token_count", "token_budget_shards",
    "tumbling_window_events", "unpivot_lineitem", "vocab_topk",
    # last hash-green round 3
    "broadcast_dim_join", "chunk_documents", "decontaminate_documents",
    "dedup_canonical_by_source",
    "distinct_agg_orders", "exists_subquery_suppliers",
    "filter_project_scan", "having_big_customers",
    "mixture_budget_sample", "multimodal_decode",
    "multimodal_frame_sample", "multimodal_metadata",
    "percentile_acctbal", "pivot_orders", "q10_returned_items",
    "q12_priority_lines", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q1_pricing_summary",
    "q22_dormant_customers", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "quality_model_score",
    "rollup_region_nation", "salted_hot_key_agg",
    "semi_anti_join_customers", "set_ops_customers",
    "sql_text_interface", "topk_orders", "window_lag_events",
    "window_rank_orders",
    # last hash-green round 4
    "ann_ivf_fullprobe_cosine", "ann_lsh_fullbucket_cosine",
    "ann_pq_fullrerank_cosine", "contrastive_pairs",
    "curriculum_bins_documents", "dedup_embedding_allpairs",
    "dedup_semantic", "ewma_events", "fuzzy_match_parts",
    "gopher_quality_gates", "group_split_documents",
    "hard_negative_mining", "importance_reweight_documents",
    "kmeans_embeddings", "lm_perplexity_documents",
    "normalize_events_features", "pagerank_events",
    "retrieval_eval_metrics", "salted_skew_join_events",
    "scd2_user_state", "snapshot_diff_events", "store_changelog_events",
]
# ROUND-8 ROTATION (same contract: reverify -> new -> changed ->
# oldest-green-stale; CORRECTNESS_r07.json came back 50/50 green, so
# the reverify lane is empty).  Round 8 is deliberately a LIGHT wave
# -- 6 new + 3 changed = 9 front rows -- because the round-7 verdict's
# one freshness gap was the 74-entry backlog whose last driver green
# is round <= 4: with ~50 sample slots this ordering re-greens ~41 of
# them, leaving ~33 for round 9.  (A local full-registry sweep this
# round -- PARITY.md header -- additionally shows every entry green on
# current code at sf0.01.)
_REVERIFY_R8: list[str] = []
_ROUND8_NEW: list[str] = [
    "mutual_nn_pairs_embeddings",
    "k_core_peel_users",
    "scan_pruning_audit_lineitem",
    "token_budget_waterfill_sources",
    "boilerplate_prefix_census",
    "dedup_cluster_source_span",
]
_CHANGED_R8: list[str] = [
    # sum_cents published as exact digit string (BIGINT nulls past
    # int64 in Spark's non-ANSI cast; DECIMAL returns float64 from
    # DuckDB->pandas) -- round-7 ADVICE
    "trimmed_mean_lineitem",
    # truth leg now persisted in BOTH branches (ownership-safe
    # _persist_tracked); staged-edges contract -- round-7 ADVICE
    "minhash_candidate_pr_audit",
    # staged branch persists defensively under the same ownership rule
    "dedup_threshold_sweep",
]
# r7 sampled the first 13 of _STALE_R7 (CORRECTNESS_r07.json rows
# 38-50); the remaining 74 keep their oldest-green-first order
_R7_STALE_SAMPLED = 13
_STALE_R8 = _STALE_R7[_R7_STALE_SAMPLED:]
# ROUND-9 ROTATION (same contract: reverify -> new -> changed ->
# oldest-green stale).  CORRECTNESS_r08.json came back 50/50 green so
# the reverify lane is empty; per the round-8 verdict's item 1 this is
# a pure FRESHNESS round -- zero new entries, five changed -- so all
# 33 entries whose last driver green is round <= 4 (the r8-unsampled
# tail of _STALE_R8) land inside the ~50-row sample, and the remaining
# slots start on the round-5-green cohort (_NEXT_OLDEST_R9).  Budget
# arithmetic: 5 changed + 33 stale + 12 fill = 50.  From round 10 on
# the rotation is steady-state refresh, oldest-green first.
# (Late round-9 amendment: word_ngrams' let-binding fix makes
# decontaminate_documents a 5th changed entry -- still at the
# verdict's new+changed <= 5 cap; one round-5 fill is dropped to
# keep the front at exactly 50: 5 changed + 33 stale + 12 fill.)
_REVERIFY_R9: list[str] = []
_ROUND9_NEW: list[str] = []
_CHANGED_R9: list[str] = [
    # rank-1 ordering key quantized to round(cosine, 9) in BOTH
    # engines so an ulp-level cross-engine difference cannot flip the
    # mutual pair set at a near-tie (round-8 ADVICE)
    "mutual_nn_pairs_embeddings",
    # k divisor guarded with greatest(n, 1) in both engines: an empty
    # thresholded edge set yields k=0, not NULL-vs-error (ADVICE)
    "k_core_peel_users",
    # tighter thresholds now REFINE the t=0.80 component labels via a
    # grouped single-pass union-find (refine_components) instead of
    # running three more distributed fixpoints
    "dedup_threshold_sweep",
    # candidate generation restructured for the k-extended prefix
    # scheme (functions/dedup.py prefix_ext); the registered default
    # path keeps prefix_ext=1 -- same operators, same results -- but
    # the code changed, so the green history no longer describes it
    "dedup_ngram_jaccard",
    # word_ngrams now let-binds the word array via a single-element
    # outer transform (HOF lambdas re-evaluate captured expression
    # chains per element -- measured 1.9x); values bit-identical
    # (0 mismatch rows at 50k docs) but the code changed
    "decontaminate_documents",
]
# r8 sampled its 9 front rows + the first 41 of _STALE_R8
# (CORRECTNESS_r08.json); the remaining 33 keep their order
_R8_STALE_SAMPLED = 41
_STALE_R9 = _STALE_R8[_R8_STALE_SAMPLED:]
# oldest-green fill: everything in _STALE_R9 has last driver green
# round <= 4; these 12 are the head of the round-5-green cohort (all
# oracle-bearing), so one 50-row sample retires the <=4 backlog
# entirely and begins on round 5's
_NEXT_OLDEST_R9: list[str] = [
    "ann_bruteforce_cosine",
    "ann_ivf_append_fullprobe",
    "ann_ivf_persisted_fullprobe",
    "bigram_coverage_score",
    "bpe_zero_merge_stats",
    "chisq_lang_source",
    "data_quality_orders",
    "dedup_repeated_chunks",
    "forward_fill_events",
    "full_outer_join_nations",
    "funnel_events",
    "grouping_sets_orders",
]
_FRONT_R9 = [
    *_REVERIFY_R9,
    *_ROUND9_NEW,
    *_CHANGED_R9,
    *_STALE_R9,
    *_NEXT_OLDEST_R9,
]
# ROUND-10 ROTATION (steady-state refresh: reverify -> new -> changed
# -> oldest-green stale).  CORRECTNESS_r09.json came back 50/50 green
# so the reverify lane is empty; zero new entries.  Changed lane:
# jaccard_similarity_join's prefix_ext default flipped to "auto"
# (round-9 verdict item 1 -- lossless k-extended prefix, decision one
# linear aggregate), which re-plans the registered producer, its six
# staged-edge consumers, and corpus_clean_pipeline's direct survivor
# self-join; containment_join and winnowed_spans gained stats_out
# census parameters (executed plan identical when unset -- included
# under the round-9 "code changed => green history stale" standard).
# Fill: the entire remaining round-5-green cohort (32 entries,
# alphabetical within the cohort; knn_classify_embeddings listed in
# the changed lane above after its census fix) + the head of the
# round-6 cohort.  Budget arithmetic: 12 changed + 31 round-5 +
# 7 round-6 = 50; oldest-green advances to round 6.
_REVERIFY_R10: list[str] = []
_ROUND10_NEW: list[str] = []
_CHANGED_R10: list[str] = [
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_cluster_census",
    "minhash_candidate_pr_audit",
    "dedup_threshold_sweep",
    "dedup_cluster_source_span",
    "corpus_clean_pipeline",
    "dedup_ngram_containment",
    "dedup_winnowed_spans",
    # round-10 AQE-starvation census fixes (values identical, plans
    # changed): semantic_dedup's within-cluster pair verify gained an
    # explicit-count repartition on cluster_id (census: verify on 5 of
    # 32 cores, 12.7 s -> 6.3 s at the 10x stress scale), and
    # knn_classify's corpus side gained _spread (census: 4.3 s of
    # 5.3 s wall on ONE task -- single-split bench parquet; 5.3 ->
    # 1.8 s, no-op at scale).  knn_classify_embeddings moves here
    # from the round-5 stale lane -- same 50-row front either way.
    "dedup_semantic",
    "knn_classify_embeddings",
]
_STALE_R10: list[str] = [
    # last driver green round 5 (complete cohort)
    "heavy_hitters_words", "interleave_mixture_schedule",
    "length_bucket_batches",
    "listagg_order_history", "moving_avg_events", "outliers_iqr_events",
    "pack_training_sequences", "pseudonymize_events",
    "q11_important_parts", "q13_customer_distribution",
    "q16_supplier_part_counts", "q20_dominant_suppliers",
    "q21_latest_shippers", "q2_min_cost_supplier", "q8_market_share",
    "q9_profit_by_nation", "range_frame_events",
    "range_join_pricebands", "recursive_cte_hierarchy",
    "resample_gapfill_events", "retention_cohorts_events",
    "scd2_point_in_time_join", "sentence_split_udtf",
    "session_window_events", "shuffle_shards", "sliding_window_events",
    "source_overlap_matrix", "text_normalize_documents",
    "token_accounting_documents", "variant_json_events",
    "window_distribution_orders",
    # head of the round-6-green cohort
    "activity_streaks_users", "asof_nearest_events",
    "attribution_events", "benford_digits_orders",
    "bfs_reachability_users", "bloom_prune_join_orders",
    "calibration_bins_documents",
]
_FRONT_R10 = [
    *_REVERIFY_R10,
    *_ROUND10_NEW,
    *_CHANGED_R10,
    *_STALE_R10,
]
# ROUND-11 ROTATION (steady-state refresh: reverify -> new -> changed
# -> oldest-green stale).  CORRECTNESS_r10.json came back 50/50 green
# so the reverify lane is empty; zero new entries.  Changed lane:
# (a) duplicate_spans gained _spread (round-10 census: 3.2 s of 3.9 s
# wall on ONE task -- single-split bench parquet; values identical,
# plan changed) -> dedup_substring_spans; (b) jaccard_similarity_join's
# "auto" gained the dense-vocab short-circuit ported from
# containment_join (k=1 + zero decision overhead in the bitmap
# regime; lossless either way) -> the registered producer, its six
# staged-edge consumers, and corpus_clean_pipeline's survivor
# self-join; (c) containment_join's k>=2 prefix persist is now gated
# on materialize (round-10 ADVICE; identical plan for the registered
# materialize=True call, fronted under the "code changed => green
# history stale" standard) -> dedup_ngram_containment.  Fill: the
# entire remaining round-6-green cohort (32 entries, alphabetical)
# + the head of the round-7 cohort.  (d) added later the same round:
# the triangle/cc wedge-join -> adjacency-intersection re-plan fronts
# both graph entries.  Budget arithmetic: 12 changed + 32 round-6 +
# 6 round-7 = 50; oldest-green advances to round 7.
_REVERIFY_R11: list[str] = []
_ROUND11_NEW: list[str] = []
_CHANGED_R11: list[str] = [
    "dedup_substring_spans",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_cluster_census",
    "minhash_candidate_pr_audit",
    "dedup_threshold_sweep",
    "dedup_cluster_source_span",
    "corpus_clean_pipeline",
    "dedup_ngram_containment",
    # (d) triangle census + clustering coefficient re-planned from the
    # wedge double self-join to adjacency intersection (outputs
    # identical, 3.2x faster, no 67M-wedge shuffle; SCALE.md round-11
    # wave) -- both fronted under "code changed => green history
    # stale"; the round-7 head below shrinks by two to hold 50.
    "triangle_count_users",
    "clustering_coefficient_users",
]
_STALE_R11: list[str] = [
    # last driver green round 6 (complete cohort)
    "char_entropy_documents", "collocation_lift_documents",
    "conversion_lag_events", "dedup_cross_doc_sentences",
    "dedup_edit_distance_titles", "equidepth_histogram_orders",
    "gap_islands_events", "gini_user_activity_events",
    "hhi_concentration_events", "inverted_index_terms",
    "k_anonymity_documents", "ks_drift_events",
    "l_diversity_documents", "label_propagation_users",
    "markov_transitions_events", "mixture_upsample_documents",
    "new_vs_returning_events", "ngram_novelty_sources",
    "ohlc_bars_events", "outliers_mad_events",
    "pareto_frontier_orders", "percentiles_global_lineitem",
    "psi_drift_documents", "rfm_segments_customers",
    "seasonal_anomaly_events", "sorted_neighborhood_customers",
    "tokenizer_fertility_documents", "twap_events",
    "user_saturation_events", "weighted_median_lineitem",
    "weighted_sample_documents", "wow_change_events",
    # head of the round-7-green cohort (two fewer than first drafted:
    # the triangle/cc changed-lane additions take their slots)
    "array_agg_events", "asof_join_events",
    "association_rules_lineitem", "auc_lang_quality_documents",
    "autocorr_events", "behavioral_entropy_users",
]
_FRONT_R11 = [
    *_REVERIFY_R11,
    *_ROUND11_NEW,
    *_CHANGED_R11,
    *_STALE_R11,
]
# ROUND-12 ROTATION (steady-state refresh: reverify -> new -> changed
# -> oldest-green stale).  CORRECTNESS_r11.json came back 50/50 green
# so the reverify lane is empty; zero new entries.  Changed lane: the
# triangle/cc adjacency plans gained the orientation seam (round-11
# verdict item 2 executed): an ``orientation`` parameter whose default
# "auto" gate (one 1-row max-degree aggregate, integer-exact compare
# against _ORIENT_GATE_MULT * sqrt(2m)) routes heavy-tailed graphs to
# degree-ordered re-orientation -- the registered co-event calls
# resolve to the SAME id-oriented plan plus the gate aggregate, values
# identical, but the code changed, so the green history no longer
# describes it.  Fill: the entire remaining round-7-green cohort (32
# entries, alphabetical) + the head of the round-8 cohort.  Budget
# arithmetic: 2 changed + 32 round-7 + 16 round-8 = 50; oldest driver
# green advances to round 8.
_REVERIFY_R12: list[str] = []
_ROUND12_NEW: list[str] = []
_CHANGED_R12: list[str] = [
    "triangle_count_users",
    "clustering_coefficient_users",
]
_STALE_R12: list[str] = [
    # last driver green round 7 (complete cohort; the r11 front
    # consumed the alphabetical head array_agg..behavioral_entropy)
    "bm25_retrieval", "bucketed_join_lineitem", "co_event_edges_users",
    "cohens_kappa_documents", "corpus_curate_pipeline", "cube_events",
    "dedup_events", "dedup_exact_documents", "dedup_minhash_banded_md5",
    "dedup_near_time_events", "degree_assortativity_users",
    "doc_length_histogram", "duplicate_share_by_source",
    "embedding_dim_stats", "embedding_gram_matrix", "flatmap_legs_events",
    "hash_sample_events", "hybrid_rrf_retrieval",
    "interarrival_histogram_events", "interval_join_events",
    "join_fanout_audit", "json_extract_events",
    "label_centroid_similarity", "lang_id_confusion",
    "monotonic_violations_orders", "quality_budget_curve_documents",
    "referential_integrity_audit", "sessionize_events",
    "t_closeness_documents", "top_paths_sessions", "trend_slope_users",
    "zorder_layout_lineitem",
    # head of the round-8-green cohort (alphabetical)
    "boilerplate_prefix_census", "broadcast_dim_join", "chunk_documents",
    "dedup_canonical_by_source", "distinct_agg_orders",
    "exists_subquery_suppliers", "filter_project_scan",
    "having_big_customers", "mixture_budget_sample", "multimodal_decode",
    "multimodal_frame_sample", "multimodal_metadata",
    "percentile_acctbal", "pivot_orders", "profile_orders",
    "q10_returned_items",
]
_FRONT_R12 = [
    *_REVERIFY_R12,
    *_ROUND12_NEW,
    *_CHANGED_R12,
    *_STALE_R12,
]
# ROUND-13 ROTATION (round-12 verdict item 1: the r12 front was staged
# BEFORE the optimization session, so the riskiest round-12 re-plans
# shipped with only self-reported oracle greens).  Changed lane = every
# query path whose PLAN changed in rounds 12-13: the dense-regime
# bitmap all-pairs joins (producer + the 7 staged consumers + both
# pipelines), the global-rank total-count fuse consumers, the _spread
# starvation-fix set, and the round-13 touches (the dedup joins'
# gate/verify-expression changes and the threshold-sweep shared pass
# front the same entries).  lang_id_confusion / profile_orders /
# corpus_curate_pipeline were already driver-green POST-change in
# CORRECTNESS_r12 but are re-fronted per the verdict's explicit list.
# Fill: the alphabetical head of the remaining round-8-green cohort
# (26 candidates after the two changed-lane overlaps; 25 taken,
# vocab_topk carries to round 14).  Budget: 25 changed + 25 stale = 50;
# oldest driver green stays round 8 (one entry left) -- the changed
# lane takes priority over cohort progress this round by design.
_REVERIFY_R13: list[str] = []
_ROUND13_NEW: list[str] = []
_CHANGED_R13: list[str] = [
    # dense-regime bitmap all-pairs family (r12 re-plan + r13 verify
    # expression / gate changes)
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_cluster_census",
    "minhash_candidate_pr_audit",
    "dedup_threshold_sweep",
    "dedup_cluster_source_span",
    "corpus_clean_pipeline",
    "corpus_curate_pipeline",
    # global-rank total-count fuse (r12)
    "rfm_segments_customers",
    "trimmed_mean_lineitem",
    "percentiles_global_lineitem",
    "equidepth_histogram_orders",
    "scan_pruning_audit_lineitem",
    # _spread starvation-fix set (r12)
    "ann_pq_cosine",
    "ann_ivf_cosine",
    "char_entropy_documents",
    "quality_model_score",
    "dedup_edit_distance_titles",
    "source_overlap_matrix",
    "ngram_novelty_sources",
    "hard_negative_mining",
    "lang_id_confusion",
    "profile_orders",
]
_STALE_R13: list[str] = [
    # last driver green round 8 (alphabetical head; the two changed-
    # lane overlaps scan_pruning_audit_lineitem / trimmed_mean_lineitem
    # are carried above)
    "q12_priority_lines", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q1_pricing_summary",
    "q22_dormant_customers", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "running_balance_events",
    "scalar_functions_events", "stratified_sample_documents",
    "term_doc_stats", "text_fingerprint", "text_lang_id",
    "text_quality_score", "text_repetition", "text_scrub",
    "text_token_count", "token_budget_shards",
    "token_budget_waterfill_sources", "tumbling_window_events",
    "unpivot_lineitem",
]
_FRONT = [
    *_REVERIFY_R13,
    *_ROUND13_NEW,
    *_CHANGED_R13,
    *_STALE_R13,
]
assert len(_FRONT) == 50, len(_FRONT)
assert len(_FRONT) == len(set(_FRONT)), "duplicate rotation entry"
assert set(_FRONT) <= set(QUERIES), sorted(set(_FRONT) - set(QUERIES))
QUERIES = {
    **{k: QUERIES[k] for k in _FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_FRONT)},
}

ORACLES: dict[str, str] = {
    "auc_lang_quality_documents": AUC_LANG_QUALITY_SQL,
    "calibration_bins_documents": CALIBRATION_BINS_SQL,
    "ohlc_bars_events": OHLC_BARS_SQL,
    "ks_drift_events": KS_DRIFT_SQL,
    "trend_slope_users": TREND_SLOPE_SQL,
    "cohens_kappa_documents": COHENS_KAPPA_SQL,
    "l_diversity_documents": L_DIVERSITY_SQL,
    "seasonal_anomaly_events": SEASONAL_ANOMALY_SQL,
    "weighted_median_lineitem": WEIGHTED_MEDIAN_SQL,
    "gap_islands_events": GAP_ISLANDS_SQL,
    "wow_change_events": WOW_CHANGE_SQL,
    "activity_streaks_users": ACTIVITY_STREAKS_SQL,
    "conversion_lag_events": CONVERSION_LAG_SQL,
    "new_vs_returning_events": NEW_VS_RETURNING_SQL,
    "dedup_cluster_census": DEDUP_CLUSTER_CENSUS_SQL,
    "association_rules_lineitem": ASSOCIATION_RULES_SQL,
    "referential_integrity_audit": REFERENTIAL_INTEGRITY_SQL,
    "behavioral_entropy_users": BEHAVIORAL_ENTROPY_SQL,
    "duplicate_share_by_source": DUPLICATE_SHARE_SQL,
    "dedup_near_time_events": DEDUP_NEAR_TIME_SQL,
    "embedding_dim_stats": EMBEDDING_DIM_STATS_SQL,
    "label_centroid_similarity": LABEL_CENTROID_SQL,
    "embedding_gram_matrix": EMBEDDING_GRAM_SQL,
    "zorder_layout_lineitem": ZORDER_LAYOUT_SQL,
    "quality_budget_curve_documents": QUALITY_BUDGET_CURVE_SQL,
    "top_paths_sessions": TOP_PATHS_SQL,
    "clustering_coefficient_users": CLUSTERING_COEFF_SQL,
    "bucketed_join_lineitem": BUCKETED_JOIN_SQL,
    "hybrid_rrf_retrieval": HYBRID_RRF_SQL,
    "minhash_candidate_pr_audit": MINHASH_PR_AUDIT_SQL,
    "lang_id_confusion": LANG_CONFUSION_SQL,
    "co_event_edges_users": CO_EVENT_EDGES_SQL,
    "dedup_threshold_sweep": DEDUP_THRESHOLD_SWEEP_SQL,
    "t_closeness_documents": T_CLOSENESS_SQL,
    "autocorr_events": AUTOCORR_SQL,
    "degree_assortativity_users": DEGREE_ASSORTATIVITY_SQL,
    "join_fanout_audit": JOIN_FANOUT_SQL,
    "interarrival_histogram_events": INTERARRIVAL_SQL,
    "monotonic_violations_orders": MONOTONIC_VIOLATIONS_SQL,
    "trimmed_mean_lineitem": TRIMMED_MEAN_SQL,
    "mutual_nn_pairs_embeddings": MUTUAL_NN_SQL,
    "k_core_peel_users": K_CORE_SQL,
    "scan_pruning_audit_lineitem": SCAN_PRUNING_SQL,
    "token_budget_waterfill_sources": WATERFILL_SQL,
    "boilerplate_prefix_census": BOILERPLATE_PREFIX_SQL,
    "dedup_cluster_source_span": CLUSTER_SOURCE_SPAN_SQL,
    "twap_events": TWAP_SQL,
    "triangle_count_users": TRIANGLE_SQL,
    "collocation_lift_documents": COLLOCATION_SQL,
    "char_entropy_documents": CHAR_ENTROPY_SQL,
    "inverted_index_terms": INVERTED_INDEX_SQL,
    "dedup_cross_doc_sentences": CROSS_DOC_SENTENCES_SQL,
    "k_anonymity_documents": K_ANONYMITY_SQL,
    "equidepth_histogram_orders": EQUIDEPTH_SQL,
    "asof_nearest_events": ASOF_NEAREST_SQL,
    "pareto_frontier_orders": PARETO_FRONTIER_SQL,
    "label_propagation_users": LABEL_PROPAGATION_SQL,
    "markov_transitions_events": MARKOV_TRANSITIONS_SQL,
    "attribution_events": ATTRIBUTION_SQL,
    "dedup_edit_distance_titles": EDIT_DISTANCE_SQL,
    "psi_drift_documents": PSI_DRIFT_SQL,
    "ngram_novelty_sources": NGRAM_NOVELTY_SQL,
    "user_saturation_events": USER_SATURATION_SQL,
    "rfm_segments_customers": RFM_SQL,
    "benford_digits_orders": BENFORD_SQL,
    "tokenizer_fertility_documents": FERTILITY_SQL,
    "bfs_reachability_users": BFS_REACH_SQL,
    "hhi_concentration_events": HHI_SQL,
    "percentiles_global_lineitem": PERCENTILES_GLOBAL_SQL,
    "outliers_mad_events": OUTLIERS_MAD_SQL,
    "gini_user_activity_events": GINI_SQL,
    "sorted_neighborhood_customers": SORTED_NEIGHBORHOOD_SQL,
    "dedup_ngram_containment": NGRAM_CONTAINMENT_SQL,
    "weighted_sample_documents": WEIGHTED_SAMPLE_SQL,
    "mixture_upsample_documents": MIXTURE_UPSAMPLE_SQL,
    "bloom_prune_join_orders": BLOOM_PRUNE_JOIN_SQL,
    "data_quality_orders": DATA_QUALITY_SQL,
    "interleave_mixture_schedule": INTERLEAVE_SQL,
    "chisq_lang_source": CHISQ_SQL,
    "scd2_point_in_time_join": SCD2_PIT_SQL,
    "bpe_zero_merge_stats": BPE_ZERO_MERGE_SQL,
    "text_normalize_documents": TEXT_NORMALIZE_SQL,
    "length_bucket_batches": LENGTH_BUCKET_SQL,
    "recursive_cte_hierarchy": RECURSIVE_CTE_SQL,
    "variant_json_events": VARIANT_JSON_SQL,
    "pseudonymize_events": PSEUDONYMIZE_SQL,
    "range_frame_events": RANGE_FRAME_SQL,
    "forward_fill_events": FORWARD_FILL_SQL,
    "sentence_split_udtf": SENTENCE_UDTF_SQL,
    "listagg_order_history": LISTAGG_SQL,
    "source_overlap_matrix": SOURCE_OVERLAP_SQL,
    "token_accounting_documents": TOKEN_ACCOUNTING_SQL,
    "pagerank_events": PAGERANK_SQL,
    "ewma_events": EWMA_SQL,
    "fuzzy_match_parts": FUZZY_MATCH_SQL,
    "retrieval_eval_metrics": RETRIEVAL_EVAL_SQL,
    "group_split_documents": GROUP_SPLIT_SQL,
    "curriculum_bins_documents": CURRICULUM_SQL,
    "kmeans_embeddings": KMEANS_SQL,
    "lm_perplexity_documents": LM_PERPLEXITY_SQL,
    "salted_skew_join_events": SALTED_JOIN_SQL,
    "normalize_events_features": NORMALIZE_SQL,
    "hard_negative_mining": HARD_NEGATIVE_SQL,
    "store_changelog_events": STORE_CHANGELOG_SQL,
    "scd2_user_state": SCD2_SQL,
    "gopher_quality_gates": GOPHER_GATES_SQL,
    "contrastive_pairs": CONTRASTIVE_PAIRS_SQL,
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "knn_classify_embeddings": KNN_CLASSIFY_SQL,
    "snapshot_diff_events": SNAPSHOT_DIFF_SQL,
    "importance_reweight_documents": IMPORTANCE_SQL,
    "pack_training_sequences": PACK_SEQUENCES_SQL,
    "dedup_repeated_chunks": REPEATED_CHUNKS_SQL,
    "shuffle_shards": SHUFFLE_SHARDS_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_dominant_suppliers": Q20_SQL,
    "q21_latest_shippers": Q21_SQL,
    "bigram_coverage_score": BIGRAM_COVERAGE_SQL,
    "ann_ivf_persisted_fullprobe": ANN_BRUTEFORCE_SQL,
    "ann_ivf_append_fullprobe": ANN_BRUTEFORCE_SQL,
    "funnel_events": FUNNEL_SQL,
    "retention_cohorts_events": RETENTION_SQL,
    "full_outer_join_nations": FULL_OUTER_SQL,
    "moving_avg_events": MOVING_AVG_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q4_order_priority": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_lines": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q22_dormant_customers": Q22_SQL,
    "sql_text_interface": SQL_TEXT_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "dedup_canonical_by_source": DEDUP_CANONICAL_SQL,
    "dedup_minhash_banded_md5": MINHASH_MD5_SQL,
    "mixture_budget_sample": MIXTURE_BUDGET_SQL,
    "salted_hot_key_agg": SALTED_AGG_SQL,
    "decontaminate_documents": DECONTAM_SQL,
    "quality_model_score": _quality_model_sql(),
    "broadcast_dim_join": BROADCAST_DIM_SQL,
    "filter_project_scan": FILTER_PROJECT_SQL,
    "topk_orders": TOPK_SQL,
    "window_rank_orders": WINDOW_RANK_SQL,
    "window_lag_events": WINDOW_LAG_SQL,
    "set_ops_customers": SET_OPS_SQL,
    "rollup_region_nation": ROLLUP_SQL,
    "grouping_sets_orders": GROUPING_SETS_SQL,
    "range_join_pricebands": RANGE_JOIN_SQL,
    "window_distribution_orders": WINDOW_DISTRIBUTION_SQL,
    "heavy_hitters_words": HEAVY_HITTERS_SQL,
    "resample_gapfill_events": RESAMPLE_GAPFILL_SQL,
    "outliers_iqr_events": OUTLIERS_IQR_SQL,
    "bm25_retrieval": BM25_SQL,
    "pivot_orders": PIVOT_ORDERS_SQL,
    "percentile_acctbal": PERCENTILE_SQL,
    "unpivot_lineitem": UNPIVOT_SQL,
    "having_big_customers": HAVING_SQL,
    "semi_anti_join_customers": SEMI_ANTI_SQL,
    "exists_subquery_suppliers": EXISTS_SQL,
    "distinct_agg_orders": DISTINCT_AGG_SQL,
    "cube_events": CUBE_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "scalar_functions_events": SCALAR_FN_SQL,
    "array_agg_events": ARRAY_AGG_SQL,
    # approx_sketches_events: no oracle (sketch estimates are
    # algorithm-specific; accuracy pinned in tests/)
    "dedup_events": DEDUP_EVENTS_SQL,
    "interval_join_events": INTERVAL_JOIN_SQL,
    "asof_join_events": ASOF_JOIN_SQL,
    "json_extract_events": JSON_EXTRACT_SQL,
    "flatmap_legs_events": FLATMAP_SQL,
    "running_balance_events": RUNNING_BALANCE_SQL,
    "tumbling_window_events": TUMBLING_SQL,
    "sliding_window_events": SLIDING_SQL,
    "session_window_events": SESSION_WINDOW_SQL,
    "text_token_count": TOKEN_COUNT_SQL,
    "text_quality_score": QUALITY_SQL,
    "text_lang_id": LANG_ID_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "text_scrub": TEXT_SCRUB_SQL,
    "vocab_topk": VOCAB_TOPK_SQL,
    "term_doc_stats": TERM_DOC_STATS_SQL,
    "doc_length_histogram": DOC_LENGTH_HIST_SQL,
    "profile_orders": PROFILE_ORDERS_SQL,
    "stratified_sample_documents": STRATIFIED_SAMPLE_SQL,
    "token_budget_shards": TOKEN_SHARDS_SQL,
    "dedup_substring_spans": SUBSTRING_SPANS_SQL,
    "dedup_winnowed_spans": WINNOWED_SPANS_SQL,
    "hash_sample_events": HASH_SAMPLE_SQL,
    "corpus_clean_pipeline": CORPUS_CLEAN_SQL,
    "corpus_curate_pipeline": CORPUS_CURATE_SQL,
    "dedup_exact_documents": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "dedup_clusters_star": DEDUP_CLUSTERS_SQL,
    "ann_bruteforce_cosine": ANN_BRUTEFORCE_SQL,
    # full-probe / full-rerank ANN degenerate to exact brute force by
    # construction -- same oracle
    "ann_ivf_fullprobe_cosine": ANN_BRUTEFORCE_SQL,
    "ann_lsh_fullbucket_cosine": ANN_BRUTEFORCE_SQL,
    "ann_pq_fullrerank_cosine": ANN_BRUTEFORCE_SQL,
    "dedup_embedding_allpairs": EMB_ALLPAIRS_SQL,
    "multimodal_metadata": MULTIMODAL_META_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    # no oracle (rows-only, by design): dedup_minhash_lsh (xxhash64
    # signatures), dedup_simhash, dedup_embedding_cosine, ann_lsh_cosine,
    # ann_pq_cosine (codebook/ADC quantization is algorithm-specific)
}
