"""Round-11 rotation window: the 9 acknowledged round-10 oracle-text
changes first (changed queries meet the EXTERNAL gate, round-4
advisory), then the 6 never-driver-checked round-10 tail additions,
then the 27 remaining r6-stale rows (2 of the 29 are already in the
changed group), then the 8 oldest r7 rows.

Split-module convention as rotation_r6..r10; registration order is
owned by the import sequence in ``..registry``.  The front below is
derivation-checked by ``tests/test_rotation.py`` against
``freshness.derive_front(through_round=10)`` — the literal must equal
the mechanical derivation from CORRECTNESS_r01–r10 or the suite fails.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front

# ---------------------------------------------------------------------------
# State entering round 11 (CORRECTNESS_r01-r10 + the round-10 verdict):
# 50/50 green in round 10, zero queries ever left red on their latest
# check; staleness histogram 6 never-checked (the round-10 tail
# additions) / 29 r6 / 50 r7 / 50 r8 / 50 r9 / 50 r10.
#
# Changed queries fronted (group 1): the 9 queries whose ORACLE TEXT
# changed in round 10 (native list_dot_product conversion + the
# AS MATERIALIZED evaluation hint) but sat OUTSIDE the round-10 driver
# window — mechanically tracked in ORACLE_HASHES.json (round == 10,
# not in the r10 window, not deferred), dual-scale re-verified in-repo
# during round 10, acknowledged in tests/test_rotation.py, and
# judge-re-verified in VERDICT r10.  They take the front now so their
# latest EXTERNAL row post-dates the oracle change.
#
# New round-11 queries register AFTER this rotation — registry tail,
# behind the window, per the new-query deferral policy; they are
# in-repo oracle-checked via pytest until the round-12 front.
#
# After round 11 the histogram (excluding round-11 tail additions)
# becomes 38 r7 / 47 r8 / 50 r9 / 50 r10 / 50 r11 — oldest anywhere
# r7, keeping the "no query's latest row older than latest_round-4"
# freshness floor with margin.  The round-12 front (derive with
# through_round=11, changed = the round-11 out-of-window oracle edits
# acknowledged in tests/test_rotation.py — events_bounce_rate and
# events_compaction_bins, the TZ-sweep fixes — plus any round-12
# edits, deferred = round-12 additions) is those 2 changed queries
# first, then the 3 round-11 tail additions (never driver-checked),
# then the 38 r7 rows, then the oldest r8 backlog.
# ---------------------------------------------------------------------------
_R11_CHANGED = [
    "curation_semantic_decontam",
    "sim_embedding_stats",
    "sim_ivf_ann_topk",
    "sim_ivf_assignments",
    "sim_matryoshka_topk",
    "sim_mmr_topk",
    "sim_range_search",
    "udf_pandas_cosine",
    "curation_keep_best",
]

_R11_FRONT = _R11_CHANGED + [
    # group 2 — the 6 round-10 tail additions, never driver-checked
    # (judge-verified green in VERDICT r10; they need the hard signal)
    "events_attribution_semi",
    "udf_cogroup_arrow_stats",
    "events_attribution_full_outer",
    "sql_function_bands",
    "sql_listagg_nations",
    "media_shard_plan",
    # group 3 — the 27 remaining r6-stale rows, registration order
    # (sim_mmr_topk and curation_keep_best, also r6-stale, sit in
    # group 1 as changed queries)
    "dedup_pair_editdist",
    "dedup_ngram_containment",
    "dedup_normalized",
    "du_heavy_users",
    "events_bitmap_users",
    "events_retention_cohorts",
    "events_sketch_merge",
    "join_spend_reconcile",
    "part_type_affinity",
    "sql_customer_distribution",
    "sql_promo_revenue",
    "sql_sales_opportunity",
    "text_tfidf_topterms",
    "trend_customer_spend",
    "window_segment_deciles",
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
    # group 4 — the 8 oldest r7-stale rows, registration order
    "events_funnel_rates",
    "events_ab_test",
    "dedup_eval_pr",
    "scalar_variant_props",
    "sql_shipping_modes",
    "udf_iter_model_scores",
    "percentile_mad_outliers",
    "join_bucketed_spend",
]

_rotate_front(_R11_FRONT)

# --- Round-12 front guidance (mechanical; derive with
# freshness.derive_front(REPO_ROOT, through_round=11) once
# CORRECTNESS_r11.json lands) ---
# Priority order for the r12 rotation:
#   1. The 17 round-11 additions/oracle-changes with no driver row yet
#      (q_round11 + q_round11b modules: sql_lateral_alias_margin,
#      scalar_transpose_metrics, scalar_variant_explode,
#      sql_pipe_priority_revenue, scalar_groupingsets_df,
#      text_bpe_pairs, text_hash_classifier,
#      setop_churned_buyers_except_all, window_paged_orders,
#      stat_crosstab_priority, scalar_map_hof_shares,
#      scalar_xml_orders, scalar_sql2023_aggregates,
#      scalar_width_bucket_hist, graph_pagerank_brands) and the two
#      r11-acknowledged oracle fixes if their r11 window slots were
#      missed (events_bounce_rate, events_compaction_bins).
#   2. The stalest r7/r8 backlog rows, oldest first.
# All 17 were oracle-verified in-repo at sf0.001/0.01/0.1 (and the
# 10 q_round11b names under TZ=America/New_York and
# shuffle.partitions=7) — the driver row is the remaining hard signal.
