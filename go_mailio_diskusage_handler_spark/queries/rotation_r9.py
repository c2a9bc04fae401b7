"""Round-9 rotation window: the 27 round-8 additions first, then the
r4-stale backlog, then the 15 oldest r5-stale rows.

Split-module convention as rotation_r6/r7/r8; registration order is
owned by the import sequence in ``..registry``.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front


# ---------------------------------------------------------------------------
# Round-9 window.  State entering the round (CORRECTNESS_r01-r08 + the
# round-8 verdict):
#   * 50/50 driver rows GREEN in round 8; cumulative 200/227 green,
#     zero queries ever left red on their latest check.
#   * 27 queries have never had a driver CORRECTNESS row — the entire
#     round-8 batch (q_round8 + q_round8b + q_round8c), registered at
#     the tail per the deferral policy.  All 27 are in-repo green at
#     sf0.01 AND sf0.1 under the dtype-strict comparator, and 8 were
#     independently value-matched by the round-8 judge.  They go
#     FIRST (this is the round-8 verdict's #1 ask).
#   * Round-9 engine changes (changed queries front first, per the
#     round-4 advisory):
#       - dq.py: NULL-key counting made explicit in
#         inventory_constraint_suite (ADVICE r8) and constraint_suite
#         hardened for the empty-table case — affects
#         du_ingest_constraints and dq_orders_constraints, BOTH
#         already in the never-checked 27 above.
#       - streaming/windows.py: inert withWatermark removed from
#         binned_psi_counts (ADVICE r8) — affects the events_drift_psi
#         streaming twin, also already in the 27.
#       - sources/inventory_source.py: task-attempt-unique data file
#         names + streamed md5 (ADVICE r8) — exercised by service
#         tests only, no registry query reads through the writer.
#     So no extra fronting is needed: every engine-changed query is
#     already in group 1.
#   * Remaining slots drain the backlog in staleness order: du_lookup
#     (deferred from the round-8 window) plus the other 7 r4-stale
#     rows, then the 15 oldest r5-stale rows in registration order.
#     27 + 8 + 15 = 50 exactly.
#
# Round-10 front (precomputed from CORRECTNESS_r01-r08 + this window):
# after round 9 the histogram is 2 never-checked (the round-9 tail
# additions curation_ppl_buckets and sql_parameterized_revenue,
# registered behind this window per the deferral policy) / 0 r4 /
# 35 r5 / 42 r6 / 50 r7 / 50 r8 / 50 r9.  The r10 window fronts the
# two additions, then the 35 remaining r5-stale rows, then the 13
# oldest r6-stale rows, in registration order — 50 exactly:
# curation_ppl_buckets, sql_parameterized_revenue,
# text_fingerprints, text_repetition, dedup_exact, dedup_minhash,
# dedup_incremental_minhash, dedup_ngram_jaccard, curation_split_assign,
# curation_mixture, curation_pack_sequences, curation_contaminated,
# curation_corpus, dedup_clusters, dedup_simhash_values,
# dedup_simhash_pairs, sim_brute_topk, sim_filtered_topk,
# sim_lsh_buckets, sim_lsh_ann_topk, dedup_embedding_cosine,
# media_metadata, media_decode_features, media_frame_sample,
# events_sliding_window, inventory_diff, pivot_status_revenue,
# percentile_order_value, cube_lineitem_flags, sim_ivfpq_rerank_topk,
# sim_ivfpq_ann_topk, events_window_users, approx_top_event_types,
# events_funnel, text_ngram_topk, sql_returned_revenue,
# events_first_touch,
# sim_eval_recall, sim_eval_recall_ivfpq, text_bm25_topk,
# part_affinity_lift, dedup_triangles, dedup_minhash_estimate,
# dedup_prefix_jaccard, curation_dedup_report, dedup_semantic,
# sim_kmeans_train, sim_kmeans_stats, sim_kmeans_ivf_topk,
# sim_rrf_hybrid_topk
# — adjusted first for any round-10 engine changes (changed queries
# front first) and for any r9 driver reds.  After round 10 the oldest
# freshness anywhere is r6 (29 rows, dedup_pair_editdist first),
# satisfying the round-8 verdict's "nothing older than r5 by round
# 10" with a round to spare; round 11 drains those 29 plus the 21
# oldest r7 rows.
# ---------------------------------------------------------------------------
_R9_FRONT = [
    # group 1 — the 27 round-8 additions, never driver-checked
    # (engine-changed queries du_ingest_constraints, dq_orders_constraints
    # and events_drift_psi's batch anchor are all in this group)
    "du_ingest_constraints",
    "dq_orders_constraints",
    "events_drift_psi",
    "udtf_widen_segments",
    "sql_bloom_probe_revenue",
    "udtf_table_arg_changes",
    "dedup_novelty",
    "sql_scripting_threshold",
    "curation_novelty_gate",
    "dedup_novelty_incremental",
    "events_forward_fill",
    "events_interpolate",
    "events_user_ewma",
    "events_compaction_bins",
    "orders_zone_map_skipping",
    "percentile_exact_median",
    "text_cdc_chunks",
    "curation_dsir_weights",
    "text_gopher_rules",
    "profile_join_skew",
    "events_delete_plan",
    "events_watermark_plan",
    "join_cardinality_sketch",
    "udf_cogroup_asof",
    "udf_arrow_norms",
    "aqp_sampled_revenue",
    "scalar_collation_ci",
    # group 2 — the 8 r4-stale rows (du_lookup deferred from round 8)
    "du_lookup",
    "du_multifile",
    "topk_addresses",
    "window_top_orders",
    "window_running_total",
    "join_revenue_by_region",
    "anti_customers_without_orders",
    "setop_lapsed_customers",
    # group 3 — the 15 oldest r5-stale rows, registration order
    "rollup_order_stats",
    "distinct_customers_per_status",
    "approx_distinct_customers",
    "approx_order_percentiles",
    "scalar_monthly_orders",
    "scalar_math_buckets",
    "scalar_json_events",
    "scalar_map_props",
    "scalar_embedding_arrays",
    "events_tumbling_window",
    "text_token_stats",
    "text_quality_scores",
    "text_unigram_logprob",
    "text_language_ngram",
    "text_language_id",
]

_rotate_front(_R9_FRONT)
