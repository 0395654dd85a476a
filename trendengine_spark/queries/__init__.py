"""Declared query registry — the driver-facing catalogue.

Every implemented operator from SURVEY.md §2 (and the §2.6 declared
relational closure plus the LLM-pipeline extensions) is declared here
as a named :class:`~trendengine_spark.queries.base.Query`: a Spark
callable ``(spark, sf_dir) -> DataFrame`` paired, where
SQL-expressible, with the equivalent ANSI SQL for the DuckDB oracle.

Submodules group the surface:

- :mod:`.timeseries`  — the reference's own operator spine (F*, A*, U*, D*)
  mapped onto the driver's ``events``/``lineitem`` tables.
- :mod:`.relational`  — SURVEY §2.6 closure: joins, windows, sort/top-k,
  set ops, grouped analytics, scalar functions, approx aggs.
- :mod:`.streaming_batch` — batch-equivalent window queries (tumbling /
  sliding / session) whose streaming twins live in
  :mod:`trendengine_spark.streaming`.
- :mod:`.llm` — training-data-pipeline operators: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search, text
  analysis, multimodal plumbing.
"""

from __future__ import annotations

from trendengine_spark.queries import (  # noqa: F401
    analytics,
    llm,
    llm2,
    ml,
    relational,
    relational2,
    streaming_batch,
    timeseries,
    tpch2,
)
from trendengine_spark.queries.base import REGISTRY, Query

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracle_sql"]

#: Registry presentation order — operationally load-bearing: the
#: driver's per-round correctness pass walks the registry
#: front-to-back under a ~50-row budget, so whichever queries lead get
#: that round's driver verdicts. Round 5 spent the budget on the LLM +
#: join/window/set/grouped families (46 green + 4 harness-type reds of
#: 50). Round 6 front-loads (a) the four r5-red queries, now fixed
#: (HUGEINT casts, exploded-scalar vector outputs), (b) the two
#: similarity queries modified this round, (c) the ~18 queries NEW in
#: r6 (TPC-H q4/q5/q7/q10/q13/q18/q22, Z-order roll-up, te_region
#: ingest, numeric histogram, n-gram decontamination, SCD2, funnel,
#: PQ top-k, bigram familiarity, try-scalars, UNPIVOT, VARIANT),
#: (d) the stalest r2/r3-era families (scalar fns, distinct twins,
#: multimodal), and (e) as much of the r4-row SURVEY §2 spine as the
#: budget still holds. The r5-green LLM/join/window/set/grouped
#: families rotate below the line; their fresh green history stands.
_SPINE_FIRST = [
    # Round-8 rotation (VERDICT r7 task 1): the driver's ~50-row
    # budget goes to the 32 registry rows that have NEVER received a
    # driver verdict in any round (union of CORRECTNESS_r01..r07 vs
    # queries() — mostly the r6-batch-2 and r7 additions), plus the
    # queries NEW or re-planned in r8. Everything below the line has
    # fresh r6/r7 driver green (48 rows in CORRECTNESS_r07 alone);
    # that history stands. Target: cumulative driver coverage
    # >= 194/198.
    #
    # Never-driver-sampled (r7 additions, judge-verified green in r7)
    "trend_mann_kendall_stats", "u6_mann_kendall_events",
    "trend_seasonal_mann_kendall",
    "agg_trimmed_mean_pandas", "sim_ivfpq_topk",
    "window_conditional_running",
    "pipeline_bernoulli_sample",
    "hier_share_of_parent", "rollup_grouping_id",
    # Never-driver-sampled (r6-batch-2 additions)
    "flagship_curation_pipeline", "retention_cohorts",
    "window_locf_fill", "dedup_ngram_containment",
    "text_shingle_novelty", "daily_value_percentiles",
    "pipeline_interleave_sources", "dq_expectations_events",
    "graph_copurchase_2hop", "scalar_agg_predicates",
    "stream_interval_left_join", "scalar_bitwise_aggs",
    "scalar_array_setops", "temporal_scd2_lookup",
    "profile_user_zscore_outliers", "events_dow_hour_heatmap",
    "multimodal_image_tiles", "text_zipf_head",
    "scalar_try_fns", "unpivot_user_stats", "variant_json_shred",
    # NEW in r8: U1/U5 relational-oracle twins (VERDICT r7 task 2) —
    # exact-integer normal equations / x7-scaled classical
    # decomposition, no rounding anywhere
    "trend_polyfit_coeffs", "u5_decomposition_relational",
    # NEW in r8: binary-quantized Hamming ANN (hash-exact oracle) and
    # distributed BPE tokenizer training (pair-count step oracle'd,
    # greedy loop golden-tested)
    "sim_hamming_topk", "text_bpe_pair_counts", "text_bpe_train_micro",
    # NEW in r8: rolling 14-day OLS slope (exact integer window
    # moments, no rounding — the per-row twin of trend_polyfit_coeffs)
    # and Spearman rank correlation (doubled-rank exactness trick)
    "window_rolling_slope", "stats_spearman_pairs",
    # NEW in r8: HLL sketch-algebra audience overlap (rows-only)
    # and exact per-node triangle counts (oriented wedge closure)
    "approx_user_overlap_pairs", "graph_triangle_counts",
    # NEW in r8: A-ES weighted sampling (hash-uniform, oracle-backed)
    # and general polygon AOI (codegen ray-casting parity)
    "pipeline_weighted_sample", "f2b_polygon_filter",
    # NEW in r8: temperature-scaled mixture quotas (count^0.5 recipe)
    "pipeline_temperature_mixture",
    # NEW in r8: PII scrubbing (codegen regex chain) and bounded-state
    # Misra-Gries heavy hitters with exact verification
    "text_pii_redact", "profile_heavy_hitters",
    # NEW in r8: persisted IVFPQ index (build-once/probe-forever,
    # partition-pruned probe)
    "sim_ivfpq_persisted",
    # Re-planned in r8: iterative-operator routing (VERDICT task 4)
    "recursive_cte_reachability",
    # NEW in r8 session 3, ORACLE-BACKED first (a driver hash verdict
    # is strongest where there is SQL to compare): exact-Gram quality
    # model, one-pass PCA covariance, exact-integer correlations
    "quality_gram_matrix",
    "sim_embedding_covariance",
    "profile_numeric_correlations",
    "profile_higher_moments",
    # ---- ~50-row budget line falls around here (30 never-sampled +
    # recursive + 15 earlier-r8 + the 4 oracle-backed session-3 rows
    # = 50; the rows below lose least if the budget cuts them — the
    # TWAP row is oracle-backed and first in line if it stretches,
    # and the judge harness covers everything regardless) ----
    "window_time_weighted_avg",
    # (u7_bfast + incremental-dedup demoted from the never-sampled
    # block to make room for the oracle-backed session-3 rows: both
    # rows-only with planted-shift / planted-dup goldens pinning them)
    "u7_bfast_monitor_events", "dedup_incremental_batch",
    "quality_linear_residual_topk", "quality_linear_cv",
    "flagship_model_curation",
    # NEW in r8: BPE inference over the corpus (encode = once per
    # distinct word + broadcast join back)
    "text_bpe_encode_corpus",
    # NEW in r8: SemDeDup-style semantic dedup (cluster-then-pairwise)
    "dedup_semantic_survivors",
    # NEW in r8: embedding-level decontamination (LSH cross-corpus)
    "pipeline_semantic_decontaminate",
    # NEW in r8: label-propagation communities (majority vote, not CC)
    "graph_communities_lpa",
    # NEW in r8: PCA spectrum (covariance above carries the oracle)
    "sim_pca_explained_variance",
    # NEW in r8: Holt-Winters backtest (rows-only; naive twin above
    # carries the oracle shape)
    "forecast_holt_winters_mae",
    # r8 cap fix (VERDICT task 5): containment dedup max_df
    # Known-green controls: one row per major family so a harness
    # regression shows up against fresh history
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "a1_annual_composite", "f1_temporal_filter",
    "d1_period_pairing", "stream_session_window",
    "dedup_paragraph_global", "pipeline_epoch_shuffle",
    "sim_range_search", "text_rarity_profile",
    "multimodal_gif_animation", "join_time_window_counts",
    # (controls above + everything below: r5-r7 driver green or
    # golden/property coverage)
    "forecast_seasonal_naive_mae", "graph_pagerank_micro",
    "stream_user_running_stats",
    "scalar_string_fns", "scalar_date_fns", "scalar_math_fns",
    "scalar_array_fns", "scalar_json_fns",
    "set_distinct_pairs",
    "exact_distinct_twin", "approx_vs_exact_distinct",
    "multimodal_feature_extract", "multimodal_resize",
    "multimodal_frame_sample",
    "f2_bbox_filter", "f3_projection",
    "f4_quality_gate", "f5_rounding", "f6_coordinate_parse",
    "f7_timestamp_decode", "f8_decode_labels",
    "a2_monthly_composite", "a3_count_distinct",
    "a4_a5_category_counts", "a6_sum", "a7_count_rows",
    "d2_explode_tokens",
    "flagship_trend_pipeline", "s2_grid_composite", "s3_schema_on_read",
    "tpch_q6_forecast_revenue", "tpch_q14_promo_effect",
    "subquery_scalar_avg", "subquery_exists_correlated",
    "stream_tumbling_window", "stream_interval_join",
    "a1_annual_composite_max",
    "profile_mad_outliers",
    "a2b_fill_missing_months", "a2c_interpolate_gaps",
    "window_range_frame", "window_percent_rank", "scalar_lambda_fns",
    "pipeline_pack_sequences", "profile_key_skew",
    "sim_embedding_l2norm", "sim_embedding_quantize_int8",
    "sim_embedding_near_dup", "sim_ann_hyperplane",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping", "tpch_q10_returned_items",
    "tpch_q13_customer_distribution", "tpch_q18_large_volume_customer",
    "tpch_q22_global_sales_opportunity",
    "spatial_zorder_rollup", "raster_region_ingest",
    "profile_numeric_histogram", "pipeline_decontaminate_ngrams",
    "scd2_user_event_history", "funnel_view_click_purchase",
    "sim_pq_topk", "text_bigram_familiarity",
    "recursive_cte_month_spine", "pipeline_source_mixture",
    "tpch_q2_min_cost_supplier", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q12_late_lines_priority",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue", "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_stock_suppliers", "tpch_q21_waiting_supplier",
    "tpch_q11_important_stock",
    "text_repetition_signals",
    "pipeline_hash_sample_per_key", "stream_dedup_first_event",
    "fuzzy_name_pairs_blocked",
    "stream_session_dynamic_gap", "approx_top_k_events",
    "udtf_run_length_segments",
    "lateral_top_order_per_customer",
    "group_by_all_dialect", "scalar_map_fns",
    "profile_equidepth_histogram",
    "join_asof_forward_tolerance",
    "multimodal_audio_spectrogram",
    "multimodal_resize_real",
    "stream_sliding_window", "stream_late_data_policy",
    "dedup_exact", "dedup_fingerprint_md5", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_cluster_assignment", "dedup_simhash",
    "dedup_corpus_survivors",
    "text_quality_profile", "text_language_id", "text_token_explode_tf",
    "text_tfidf_top_terms", "text_token_count_bpe",
    "text_winnow_fingerprints", "text_chunk_windows",
    "sim_cosine_topk", "sim_ivf_topk", "sim_label_centroid_dist",
    "pipeline_stratified_sample", "profile_table_nulls",
    "multimodal_content_stats", "multimodal_png_decode",
    "multimodal_jpeg_decode", "multimodal_wav_features",
    "join_inner_3way", "join_left_count", "join_semi", "join_anti",
    "join_full_outer", "join_broadcast_dim", "join_theta_range",
    "join_asof",
    "window_rank_orders", "window_topk_per_group", "window_lag_monthly",
    "window_running_sum", "window_ntile_firstlast", "sort_limit_topn",
    "set_union_distinct", "set_intersect", "set_except",
    "rollup_year_quarter", "cube_flag_status",
    "pivot_event_types", "grouping_sets_mixed",
    "union_all_counts", "intersect_all_keys", "having_groups",
    "regexp_extract_keys", "string_agg_sorted", "median_exact",
    "min_by_max_by", "sql_api_shared_dialect",
    "u1_polytrend_events", "u2_dbest_events",
    "u3_generalize_events", "u5_decomposition_events",
    "approx_percentiles", "stats_aggregates",
]


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _SPINE_FIRST if n in REGISTRY}
    missing = [n for n in _SPINE_FIRST if n not in REGISTRY]
    if missing:  # pragma: no cover - authoring guard
        raise ValueError(f"spine order names unknown queries: {missing}")
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def all_queries():
    """name → (spark, sf_dir) -> DataFrame for every declared query."""
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracle_sql():
    """name → DuckDB SQL for every SQL-expressible declared query."""
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
