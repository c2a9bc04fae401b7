"""Round-12 rotation window: the 4 changed queries first (the 2
round-11-acknowledged oracle fixes plus the 2 round-12 ADVICE-driven
oracle edits — changed queries meet the EXTERNAL gate, round-4
advisory), then the 13 remaining never-driver-checked round-11 tail
additions, then the 33 oldest r7-stale rows in registration order.

Split-module convention as rotation_r6..r11; registration order is
owned by the import sequence in ``..registry``.  The front below is
derivation-checked by ``tests/test_rotation.py`` against
``freshness.derive_front(through_round=11)`` — the literal must equal
the mechanical derivation from CORRECTNESS_r01–r11 or the suite fails.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front

# ---------------------------------------------------------------------------
# State entering round 12 (CORRECTNESS_r01-r11 + the round-11 verdict):
# 50/50 green in round 11, zero queries ever left red on their latest
# check; staleness histogram 15 never-checked (the round-11 tail
# additions) / 38 r7 / 47 r8 / 50 r9 / 50 r10 / 50 r11.
#
# Changed queries fronted (group 1):
#   * events_bounce_rate / events_compaction_bins — the round-11
#     TZ-sweep oracle fixes, acknowledged with their evidence trail in
#     round 11's tests/test_rotation.py (_R11_CHANGED_ACKED); their
#     round-11 window slots were already filled, so they close the
#     acknowledgement debt here.
#   * scalar_sql2023_aggregates / text_hash_classifier — the round-12
#     ADVICE fixes (med_price ROUND(,4) on the 0.005 grid; the
#     exp→algebraic-sigmoid bit-identity rewrite).  Both are also
#     round-11 tail additions with no driver row, so they front under
#     either rule; listing them as changed keeps the oracle-change
#     gate (test_changed_oracles_meet_the_gate_or_are_acknowledged)
#     non-vacuous.
#
# New round-12 queries register AFTER this rotation — registry tail,
# behind the window, per the new-query deferral policy; they are
# in-repo oracle-checked via pytest until the round-13 front.
#
# After round 12 the histogram (excluding round-12 tail additions)
# becomes 5 r7 / 47 r8 / 48 r9 / 50 r10 / 50 r11 / 50 r12 — oldest
# anywhere r7, keeping the "no query's latest row older than
# latest_round-5" sustainable freshness floor (the 5 remaining r7
# rows must lead the round-13 front; the floor arithmetic is pinned
# in tests/test_rotation.py::test_no_query_left_behind).  The
# round-13 front (derive with through_round=12, changed = any
# round-12 out-of-window oracle edits acknowledged in
# tests/test_rotation.py plus round-13 edits, deferred = round-13
# additions) is: any changed queries first, then the 8 round-12 tail
# additions (never driver-checked — window_direction_changes,
# setop_repeat_buyers_intersect_all, events_session_dynamic_gap,
# scalar_datetime_breadth, text_url_canonicalize,
# scalar_null_guards, stat_linreg_normal_eq,
# dq_embeddings_constraints), then those 5 r7 rows, then the oldest
# r8 backlog.  All 8 additions were oracle-verified in-repo at
# sf0.001/0.01/0.1 on landing (the first six also under the TZ,
# shuffle-partitions=7, codegen-off, AQE-off, and Arrow-less axes
# via the full-registry sweeps in .r12/) — the driver row is the
# remaining hard signal.
# ---------------------------------------------------------------------------
_R12_CHANGED = [
    "events_bounce_rate",
    "events_compaction_bins",
    "scalar_sql2023_aggregates",
    "text_hash_classifier",
]

_R12_FRONT = _R12_CHANGED + [
    # group 2 — the 13 remaining round-11 tail additions, never
    # driver-checked (judge-verified green in VERDICT r11; they need
    # the hard signal), registration order
    "sql_lateral_alias_margin",
    "scalar_transpose_metrics",
    "scalar_groupingsets_df",
    "sql_pipe_priority_revenue",
    "scalar_variant_explode",
    "text_bpe_pairs",
    "setop_churned_buyers_except_all",
    "window_paged_orders",
    "stat_crosstab_priority",
    "scalar_map_hof_shares",
    "scalar_xml_orders",
    "scalar_width_bucket_hist",
    "graph_pagerank_brands",
    # group 3 — the 33 oldest r7-stale rows, registration order (the
    # remaining 5 r7 rows lead the round-13 front)
    "sql_nation_volume",
    "sql_market_share",
    "window_first_last",
    "events_window_topk",
    "events_value_deciles",
    "curation_shard_manifest",
    "trend_daily_dense",
    "profile_orders",
    "events_gap_stats",
    "trend_weekly_wow",
    "media_payload_dedup",
    "scalar_try_parse",
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
    "events_user_growth",
    "events_concentration",
    "events_markov_stationary",
    "curation_epoch_repeat",
    "du_scd2_history",
    "events_seasonality",
    "docs_index_coverage",
]

_rotate_front(_R12_FRONT)
