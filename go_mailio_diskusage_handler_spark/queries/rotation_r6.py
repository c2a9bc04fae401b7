"""Round-6 rotation window: backlog-drain front (pure rotation).

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front




# ---------------------------------------------------------------------------
# Round-6 window.  Backlog state entering the round: 100 of 196
# queries had never had a driver CORRECTNESS row (the 20 round-5
# deferred additions + the two continuation batches + the never-
# fronted sim_rrf_hybrid_topk).  Per the round-5 verdict, query
# ADDITIONS are frozen until that backlog drains: this front and the
# round-7 front are pure rotation.
#
# Composition rule (round-4 advisory first, staleness second):
# 1. Every query whose round-6 change can alter OUTPUT — the funnel
#    single-pass+guards, the A/B empty-arm guards, the dedup-oracle
#    round-before-compare, the 1992 spine start, the BM25 guard, the
#    shared recall-report helper, and every operator that gained
#    cache-ownership (own_cache) on a path feeding these entries —
#    and is still unchecked goes FIRST (20 names below).
# 2. Then the rest of the round-5 deferred additions (17 — three of
#    the 20 are already in group 1).
# 3. Then the stalest first-continuation additions fill to 50 (13).
#
# The round-6 changes also touched ten queries that ALREADY hold r5
# driver rows (dedup_minhash / dedup_incremental_minhash /
# dedup_ngram_jaccard / dedup_clusters / curation_corpus /
# curation_contaminated / dedup_simhash_pairs / dedup_embedding_cosine
# / sim_ivf* / sim_ivfpq*).  They are NOT re-fronted: the oracle-text
# change (round-before-compare in the Jaccard WHERE) was proven
# output-identical old-vs-new inside DuckDB alone at sf0.01 — a
# comparison independent of the engine, so the r5 green rows transfer
# — and the cache-ownership change is resource lifecycle, re-verified
# this round with the driver-identical compare (all green); window
# slots go to the 100-name backlog instead.
#
# Round-7 front (the remaining 50, in staleness order): the rest of
# the first continuation batch (join_bucketed_spend, sql_nation_volume,
# sql_market_share, window_first_last, events_window_topk,
# events_value_deciles, curation_shard_manifest, trend_daily_dense,
# profile_orders, events_bounce_rate, events_gap_stats,
# trend_weekly_wow, media_payload_dedup, scalar_try_parse,
# sim_range_search, du_top_growth, sql_forecast_revenue,
# sql_bracket_revenue, sql_important_nations, text_lang_confusion,
# events_dau_wau, segment_rfm, sql_best_supplier,
# sql_part_supplier_counts, events_funnel_window) then the rest of the
# second batch (events_anomaly_zscore, text_zipf_slope,
# sql_excess_capacity, sim_pca_project, sim_matryoshka_topk,
# events_user_growth, events_concentration, curation_semantic_decontam,
# events_markov_stationary, curation_epoch_repeat, du_scd2_history,
# events_seasonality, docs_index_coverage, sim_embedding_stats,
# curation_stratified_split, du_quota_alerts, events_user_features,
# text_datacard, udf_arrow_tokens, sql_lateral_topn,
# events_user_entropy, events_retention_curve, docs_length_histogram,
# sql_group_by_all, du_largest_files).  After round 7 every query's
# driver row is ≤2 rounds old and additions may resume.
# ---------------------------------------------------------------------------
_R6_FRONT = [
    # group 1 — round-6-changed, never driver-checked
    "events_funnel_rates",
    "events_ab_test",
    "sql_recursive_spine",
    "dedup_eval_pr",
    "sim_eval_recall",
    "sim_eval_recall_ivfpq",
    "text_bm25_topk",
    "part_affinity_lift",
    "dedup_triangles",
    "dedup_minhash_estimate",
    "dedup_prefix_jaccard",
    "curation_dedup_report",
    "dedup_semantic",
    "sim_kmeans_train",
    "sim_kmeans_stats",
    "sim_kmeans_ivf_topk",
    "sim_rrf_hybrid_topk",
    "dedup_pair_editdist",
    "dedup_ngram_containment",
    "curation_keep_best",
    # group 2 — remaining round-5 deferred additions
    "dedup_normalized",
    "du_heavy_users",
    "events_bitmap_users",
    "events_retention_cohorts",
    "events_sketch_merge",
    "join_spend_reconcile",
    "part_type_affinity",
    "scalar_variant_props",
    "sim_mmr_topk",
    "sql_customer_distribution",
    "sql_promo_revenue",
    "sql_sales_opportunity",
    "sql_shipping_modes",
    "text_tfidf_topterms",
    "trend_customer_spend",
    "udf_iter_model_scores",
    "window_segment_deciles",
    # group 3 — stalest first-continuation additions
    "text_pii",
    "dedup_span_coverage",
    "curation_temperature_mix",
    "scalar_zorder_keys",
    "curation_bloom_decontam",
    "sql_top_supplier",
    "sql_small_qty_revenue",
    "sql_waiting_suppliers",
    "text_chunks",
    "curation_quality_gate",
    "events_transitions",
    "text_tfidf_cosine_pairs",
    "percentile_mad_outliers",
]

_rotate_front(_R6_FRONT)
