"""Round-13 rotation window: the 1 round-13 oracle edit first (the
ADVICE-driven empty-list guard — changed queries meet the EXTERNAL
gate, round-4 advisory), then the 7 remaining never-driver-checked
round-12 tail additions, then the 4 r7-stale rows, then the 38 oldest
r8-stale rows in registration order.

Split-module convention as rotation_r6..r12; registration order is
owned by the import sequence in ``..registry``.  The front below is
derivation-checked by ``tests/test_rotation.py`` against
``freshness.derive_front(through_round=12)`` — the literal must equal
the mechanical derivation from CORRECTNESS_r01–r12 or the suite fails.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front

# ---------------------------------------------------------------------------
# State entering round 13 (CORRECTNESS_r01-r12 + the round-12 verdict):
# 50/50 green in round 12, zero queries ever left red on their latest
# check; staleness histogram 8 never-checked (the round-12 tail
# additions) / 4 r7 / 47 r8 / 49 r9 / 50 r10 / 50 r11 / 50 r12.
#
# Changed query fronted (group 1):
#   * dq_embeddings_constraints — the round-12 ADVICE (low) fix:
#     DQ_EMBEDDINGS_ORACLE's norm legs now guard empty (length-0,
#     non-NULL) lists with CASE → 0.0, matching Spark's F.aggregate
#     0.0-init degradation instead of raising from DuckDB's
#     list_reduce.  It is also a round-12 tail addition with no
#     driver row, so it fronts under either rule; listing it as
#     changed keeps the oracle-change gate
#     (test_changed_oracles_meet_the_gate_or_are_acknowledged)
#     non-vacuous.  Pinned by tests/test_advice_r12.py.
#
# New round-13 queries register AFTER this rotation — registry tail,
# behind the window, per the new-query deferral policy; they are
# in-repo oracle-checked via pytest until the round-14 front.
#
# After round 13 the histogram (excluding round-13 tail additions)
# becomes 9 r8 / 49 r9 / 50 r10 / 50 r11 / 50 r12 / 50 r13 — oldest
# anywhere r8, comfortably inside the "no query's latest row older
# than latest_round-5" sustainable freshness floor (the 9 remaining
# r8 rows must lead the round-14 front; the floor arithmetic is
# pinned in tests/test_rotation.py::test_no_query_left_behind).  The
# round-14 front (derive with through_round=13, changed = any
# round-13 out-of-window oracle edits acknowledged in
# tests/test_rotation.py plus round-14 edits, deferred = round-14
# additions) is: any changed queries first, then the round-13 tail
# additions (never driver-checked), then those 9 r8 rows, then the
# oldest r9 backlog.
# ---------------------------------------------------------------------------
_R13_CHANGED = [
    "dq_embeddings_constraints",
]

_R13_FRONT = _R13_CHANGED + [
    # group 2 — the 7 remaining round-12 tail additions, never
    # driver-checked (judge-verified green in VERDICT r12; they need
    # the hard signal), registration order
    "window_direction_changes",
    "setop_repeat_buyers_intersect_all",
    "events_session_dynamic_gap",
    "scalar_datetime_breadth",
    "text_url_canonicalize",
    "scalar_null_guards",
    "stat_linreg_normal_eq",
    # group 3 — the 4 r7-stale rows (verdict r12 ask #1), registration
    # order
    "curation_stratified_split",
    "events_user_features",
    "events_user_entropy",
    "events_retention_curve",
    # group 4 — the 38 oldest r8-stale rows, registration order (the
    # remaining 9 r8 rows lead the round-14 front)
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
    "sql_recursive_spine",
    "udaf_weighted_avg_price",
    "udtf_path_segments",
    "du_quality_check",
    "salted_event_totals",
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
]

_rotate_front(_R13_FRONT)
