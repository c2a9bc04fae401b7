"""Round-7 rotation window: red re-checks first, then backlog drain.

Split-module convention as rotation_r6; registration order is owned
by the import sequence in ``..registry``.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front


# ---------------------------------------------------------------------------
# Round-7 window.  State entering the round (CORRECTNESS_r06 + the
# round-6 verdict):
#   * 7 driver REDS — all one defect: un-cast integer SUM() in the
#     oracle SQL, which DuckDB types HUGEINT and pandas renders as
#     float64 while Spark returns bigint; values identical, the
#     driver's type-sensitive hash differs.  Round 7 fixed every one
#     with CAST(... AS BIGINT).  A red row must be flipped, and the
#     oracle text changed, so per the round-4 advisory (front-load
#     everything whose round-N change can alter the gate) these 7 go
#     FIRST.
#   * 50 never-checked queries (the planned r7 backlog front from
#     rotation_r6.py).  12 of them carried the SAME latent HUGEINT
#     defect (verdict's full-registry type scan) and were fixed this
#     round — they stay in the window (oracle changed + never
#     checked).  With only 50 driver slots and 7 taken by the red
#     re-checks, the 7 LEAST-stale backlog names whose oracles did
#     NOT change this round are deferred to round 8:
#       du_quota_alerts, text_datacard, udf_arrow_tokens,
#       sql_lateral_topn, docs_length_histogram, sql_group_by_all,
#       du_largest_files.
#     After round 7 the backlog is those 7 plus the four round-7
#     additions registered at the tail (dedup_span_trim,
#     dedup_weighted_jaccard, events_kll_quantiles,
#     events_theta_retention — see queries/q_round7.py); round 8
#     fronts all 11 first, then staleness order.
#   * A full-registry DESCRIBE scan (tests/test_oracle_types.py) now
#     forbids HUGEINT-family oracle columns, and the in-repo compare
#     (tests/conftest.py:assert_dtype_parity) is dtype-strict, so
#     this defect class is caught at authoring time from now on.
#
# Round-8 front (precomputed from CORRECTNESS_r01-r06 + this window;
# 11 never-checked first, then the stalest rows, all r4-checked, in
# registration order): du_quota_alerts, text_datacard,
# udf_arrow_tokens, sql_lateral_topn, docs_length_histogram,
# sql_group_by_all, du_largest_files, dedup_span_trim,
# dedup_weighted_jaccard, events_kll_quantiles, events_theta_retention,
# then udf_pandas_cosine, udaf_weighted_avg_price, udtf_path_segments,
# du_quality_check, salted_event_totals, sim_ivf_assignments,
# sim_ivf_ann_topk, sim_quantize_int8, sim_pq_codes, sim_pq_ann_topk,
# semi_customers_with_orders, du_incremental, udf_grouped_map_zscore,
# part_brand_stats, supplier_nation_balance, star_profit_by_nation_brand,
# docs_source_stats, segment_customer_value, setop_retained_customers,
# media_resize, media_audio_chunks, events_asof_join,
# events_attribution_join, sql_pricing_summary, sql_shipping_priority,
# sql_order_priority, sql_large_orders, sql_local_supplier_volume,
# sql_correlated_above_avg, sql_grouping_sets, window_order_gaps,
# unpivot_lineitem_measures, window_moving_spend, range_join_price_bands,
# events_sessionize, events_session_window, curation_sample_weighted,
# du_core, du_lookup — adjusted first for any round-8 engine changes
# (changed queries front first, per the round-4 advisory) and for any
# r7 driver reds.  96 queries remain at r4/r5 staleness, so full
# ≤2-round freshness needs two more rotation rounds.
# ---------------------------------------------------------------------------
_R7_FRONT = [
    # group 1 — round-6 reds, oracle CAST fix applied, must re-check
    "events_funnel_rates",
    "events_ab_test",
    "dedup_eval_pr",
    "scalar_variant_props",
    "sql_shipping_modes",
    "udf_iter_model_scores",
    "percentile_mad_outliers",
    # group 2 — backlog (never driver-checked), staleness order;
    # (L) = latent HUGEINT oracle fixed this round
    "join_bucketed_spend",
    "sql_nation_volume",
    "sql_market_share",
    "window_first_last",
    "events_window_topk",
    "events_value_deciles",
    "curation_shard_manifest",   # (L)
    "trend_daily_dense",
    "profile_orders",            # (L)
    "events_bounce_rate",        # (L)
    "events_gap_stats",
    "trend_weekly_wow",
    "media_payload_dedup",
    "scalar_try_parse",          # (L)
    "sim_range_search",
    "du_top_growth",
    "sql_forecast_revenue",
    "sql_bracket_revenue",
    "sql_important_nations",
    "text_lang_confusion",
    "events_dau_wau",
    "segment_rfm",
    "sql_best_supplier",
    "sql_part_supplier_counts",
    "events_funnel_window",
    "events_anomaly_zscore",
    "text_zipf_slope",
    "sql_excess_capacity",
    "sim_pca_project",
    "sim_matryoshka_topk",
    "events_user_growth",        # (L)
    "events_concentration",      # (L)
    "curation_semantic_decontam",
    "events_markov_stationary",
    "curation_epoch_repeat",
    "du_scd2_history",
    "events_seasonality",        # (L)
    "docs_index_coverage",       # (L)
    "sim_embedding_stats",       # (L)
    "curation_stratified_split",
    "events_user_features",      # (L)
    "events_user_entropy",       # (L)
    "events_retention_curve",    # (L)
]

_rotate_front(_R7_FRONT)
