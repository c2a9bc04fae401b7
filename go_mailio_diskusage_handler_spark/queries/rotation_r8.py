"""Round-8 rotation window: the 11 never-driver-checked queries first,
then this round's engine-changed queries, then the stalest r4 rows.

Split-module convention as rotation_r6/r7; registration order is owned
by the import sequence in ``..registry``.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front


# ---------------------------------------------------------------------------
# Round-8 window.  State entering the round (CORRECTNESS_r07 + the
# round-7 verdict):
#   * 50/50 driver rows GREEN in round 7; cumulative 189/200 green,
#     zero queries ever left red.
#   * 11 queries have never had a driver CORRECTNESS row (7 deferred
#     from the round-7 window squeeze + the 4 round-7 additions
#     registered at the tail).  All 11 are in-repo green at sf0.01
#     AND sf0.1 under the dtype-strict comparator; the round-7
#     verdict's #1 ask is to front them so the driver's own gate
#     confirms.  They go FIRST.
#   * Round-8 engine changes (per the round-4 advisory, anything
#     whose round-N change can alter the gate fronts next):
#       - sql_recursive_spine: the cteRecursionLevelLimit session
#         leak is fixed by eager localCheckpoint + conf restore
#         (sql.py:recursive_spine_revenue) — execution path changed.
#       - dedup_span_trim: NULL-text guard added to BOTH engines
#         (ADVICE r7; dedup.py:trim_duplicated_spans + SPAN_TRIM_SQL).
#       - events_kll_quantiles: NULL event_type filter added to BOTH
#         engines (ADVICE r7; scalars.py:mergeable_value_quantiles +
#         KLL_QUANTILES_SQL).
#     dedup_span_trim and events_kll_quantiles are already in the
#     never-checked 11, so only sql_recursive_spine is added.
#   * Remaining slots drain the backlog in staleness order (freshest
#     driver row r4, registration order) — the precomputed list from
#     rotation_r7.py's comment.  With 12 slots taken, that list's
#     last name (du_lookup) defers to round 9 (du_core claims the
#     50th slot below); both are in-repo green, so nothing hides.
#     After this window, 58 queries remain at r4/r5 staleness and 42
#     at r6 — rounds 9-10 finish the drain.
#
# Round-9 front (precomputed from CORRECTNESS_r01-r07 + this window;
# the 27 round-8 additions first (10 from q_round8 + 4 from
# q_round8b + 13 from q_round8c), then du_lookup (deferred from this
# window) and the 8 remaining r4-stale rows (du_core took this
# round's 50th slot), then the 14 oldest r5-stale rows in
# registration order — 50 exactly):
# udtf_widen_segments, sql_bloom_probe_revenue, udtf_table_arg_changes,
# dedup_novelty, sql_scripting_threshold, curation_novelty_gate,
# dedup_novelty_incremental, events_forward_fill, events_interpolate,
# events_user_ewma,
# events_compaction_bins, orders_zone_map_skipping,
# percentile_exact_median, text_cdc_chunks,
# curation_dsir_weights, dq_orders_constraints, text_gopher_rules,
# profile_join_skew, events_delete_plan, events_watermark_plan,
# join_cardinality_sketch, events_drift_psi,
# udf_cogroup_asof, udf_arrow_norms, du_ingest_constraints,
# aqp_sampled_revenue, scalar_collation_ci,
# du_lookup,
# du_multifile, topk_addresses, window_top_orders,
# window_running_total, join_revenue_by_region,
# anti_customers_without_orders, setop_lapsed_customers,
# rollup_order_stats, distinct_customers_per_status,
# approx_distinct_customers, approx_order_percentiles,
# scalar_monthly_orders, scalar_math_buckets, scalar_json_events,
# scalar_map_props, scalar_embedding_arrays, events_tumbling_window,
# text_token_stats, text_quality_scores, text_unigram_logprob,
# text_language_ngram, text_language_id
# — adjusted first for any round-9 engine changes (changed queries
# front first, per the round-4 advisory) and for any r8 driver reds.
# The 35 r5-stale names that overflow to round 10:
# text_fingerprints,
# text_repetition, dedup_exact, dedup_minhash, dedup_incremental_minhash,
# dedup_ngram_jaccard, curation_split_assign,
# curation_mixture, curation_pack_sequences, curation_contaminated,
# curation_corpus, dedup_clusters, dedup_simhash_values,
# dedup_simhash_pairs, sim_brute_topk, sim_filtered_topk,
# sim_lsh_buckets,
# sim_lsh_ann_topk, dedup_embedding_cosine,
# media_metadata, media_decode_features, media_frame_sample,
# events_sliding_window, inventory_diff, pivot_status_revenue,
# percentile_order_value, cube_lineitem_flags, sim_ivfpq_rerank_topk,
# sim_ivfpq_ann_topk, events_window_users, approx_top_event_types,
# events_funnel, text_ngram_topk, sql_returned_revenue,
# events_first_touch — followed by the 42 r6-stale rows.
# ---------------------------------------------------------------------------
_R8_FRONT = [
    # group 1 — never driver-checked (7 r7 deferrals + 4 r7 additions)
    "du_quota_alerts",
    "text_datacard",
    "udf_arrow_tokens",
    "sql_lateral_topn",
    "docs_length_histogram",
    "sql_group_by_all",
    "du_largest_files",
    "dedup_span_trim",
    "dedup_weighted_jaccard",
    "events_kll_quantiles",
    "events_theta_retention",
    # group 2 — engine changed this round (conf-leak fix)
    "sql_recursive_spine",
    # group 3 — backlog drain, staleness order (freshest row = r4)
    "udf_pandas_cosine",
    "udaf_weighted_avg_price",
    "udtf_path_segments",
    "du_quality_check",
    "salted_event_totals",
    "sim_ivf_assignments",
    "sim_ivf_ann_topk",
    "sim_quantize_int8",
    "sim_pq_codes",
    "sim_pq_ann_topk",
    "semi_customers_with_orders",
    "du_incremental",
    "udf_grouped_map_zscore",
    "part_brand_stats",
    "supplier_nation_balance",
    "star_profit_by_nation_brand",
    "docs_source_stats",
    "segment_customer_value",
    "setop_retained_customers",
    "media_resize",
    "media_audio_chunks",
    "events_asof_join",
    "events_attribution_join",
    "sql_pricing_summary",
    "sql_shipping_priority",
    "sql_order_priority",
    "sql_large_orders",
    "sql_local_supplier_volume",
    "sql_correlated_above_avg",
    "sql_grouping_sets",
    "window_order_gaps",
    "unpivot_lineitem_measures",
    "window_moving_spend",
    "range_join_price_bands",
    "events_sessionize",
    "events_session_window",
    "curation_sample_weighted",
    # 50th slot: the stalest r4 name (otherwise the slot would fall to
    # the r7-green head of the residual order — wasted freshness)
    "du_core",
]

_rotate_front(_R8_FRONT)
