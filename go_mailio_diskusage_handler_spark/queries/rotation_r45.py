"""Registration-order rotation: policy, _rotate_front, round-4/5 fronts.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations


from ._base import ORACLE_SQL, QUERIES


# ---------------------------------------------------------------------------
# Registration-order rotation.  The driver's correctness gate checks the
# FIRST 50 entries of QUERIES each round; rounds 1-3 checked one fixed
# 50-query prefix, leaving 35 queries without an official correctness
# row.  Front-load those 35 (every sql_*, the UDF/UDAF/UDTF surface, the
# IVF/PQ ANN stack, the remaining window/join/du queries) so that after
# round 4 every registered query has had a driver-verified row in at
# least one round.  Iteration ORDER is the only thing that changes;
# names, callables, and oracles are untouched.
# ---------------------------------------------------------------------------
_R4_FRONT = [
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
    "sim_ivfpq_ann_topk",
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
    # Round-3 NTZ casualties: re-verify under the round-4 fix.
    "events_sessionize",
    "events_session_window",
    # New in round 4: heavy-hitter sketch, exact-rerank ANN tier,
    # windowed distinct-user sketch, weighted mixture sampling.
    "approx_top_event_types",
    "sim_ivfpq_rerank_topk",
    "events_window_users",
    "curation_sample_weighted",
]


def _rotate_front(front: list[str]) -> None:
    order = [n for n in front if n in QUERIES]
    order += [n for n in QUERIES if n not in order]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_rotate_front(_R4_FRONT)

# Round-5 window (the driver checks the first ~50 registrations): the
# rule, per the round-4 advisory, is that EVERY query whose semantics
# or engine code changed this round must sit inside the external gate
# — the in-repo oracle is edited in lockstep with the engine and
# cannot arbitrate its own changes.  This list = all 42 queries whose
# last driver row predates round 4's window (requirement: no query
# goes >1 round without a fresh row) ∪ every round-5-touched query:
# sim_lsh_ann_topk (asymmetric 2-table probes), sim_ivfpq_rerank_topk
# (shortlist 60), sim_ivfpq_ann_topk (fused code projection),
# curation_mixture (skew guard), events_window_users /
# approx_top_event_types (sketch invariant guards), dedup_clusters /
# curation_corpus (strict CC threading), and the three new queries.
# Plus three of the queries ADDED in round 5 (text_ngram_topk,
# sql_returned_revenue, events_first_touch) — new code meets the
# external gate in its first round where the window allows.  The
# window holds exactly 50, so the remaining 20 round-5 ADDITIONS defer
# to the round-6 front (after them, every query's last driver row is
# ≤1 round old again): curation_keep_best, dedup_ngram_containment,
# dedup_normalized, dedup_pair_editdist, du_heavy_users,
# events_bitmap_users, events_retention_cohorts, events_sketch_merge,
# join_spend_reconcile, part_type_affinity, scalar_variant_props,
# sim_mmr_topk, sql_customer_distribution, sql_promo_revenue,
# sql_sales_opportunity, sql_shipping_modes, text_tfidf_topterms,
# trend_customer_spend, udf_iter_model_scores, window_segment_deciles.
# Deferring NEW queries is categorically different from deferring
# CHANGED ones (the advisory's concern): a new query has no stale
# green driver row to hide behind — it is visibly unchecked until its
# first gate pass — and every one of these runs the same cross-engine
# parity check in pytest (tests/test_*.py ORACLE_CHECKED lists); the
# four sql_* among them are one-ANSI-string queries whose oracle IS
# the query text.
# 50 names — exactly the window.
_R5_FRONT = [
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
    "text_fingerprints",
    "text_repetition",
    "dedup_exact",
    "dedup_minhash",
    "dedup_incremental_minhash",
    "dedup_ngram_jaccard",
    "curation_split_assign",
    "curation_mixture",
    "curation_pack_sequences",
    "curation_contaminated",
    "curation_corpus",
    "dedup_clusters",
    "dedup_simhash_values",
    "dedup_simhash_pairs",
    "sim_brute_topk",
    "sim_filtered_topk",
    "sim_lsh_buckets",
    "sim_lsh_ann_topk",
    "dedup_embedding_cosine",
    "media_metadata",
    "media_decode_features",
    "media_frame_sample",
    "events_sliding_window",
    "inventory_diff",
    "pivot_status_revenue",
    "percentile_order_value",
    "cube_lineitem_flags",
    "sim_ivfpq_rerank_topk",
    "sim_ivfpq_ann_topk",
    "events_window_users",
    "approx_top_event_types",
    "events_funnel",
    "text_ngram_topk",
    "sql_returned_revenue",
    "events_first_touch",
]

_rotate_front(_R5_FRONT)

