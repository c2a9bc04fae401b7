"""Round-14 rotation window: the 1 round-14 oracle edit first (the
ADVICE-driven shape-closure of scalar_variant_ingest — changed queries
meet the EXTERNAL gate, round-4 advisory), then the 1 remaining
never-driver-checked round-13 tail addition, then the 9 r8-stale rows
(verdict r13 ask #1 — including the flagship ``du_core``, 5 rounds
stale in the driver record), then the 39 oldest r9-stale rows in
registration order.

Split-module convention as rotation_r6..r13; registration order is
owned by the import sequence in ``..registry``.  The front below is
derivation-checked by ``tests/test_rotation.py`` against
``freshness.derive_front(through_round=13)`` — the literal must equal
the mechanical derivation from CORRECTNESS_r01–r13 or the suite fails.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front

# ---------------------------------------------------------------------------
# State entering round 14 (CORRECTNESS_r01-r13 + the round-13 verdict):
# 50/50 green in round 13, zero queries ever left red on their latest
# check; staleness histogram 2 never-checked (the round-13 tail
# additions) / 9 r8 / 49 r9 / 50 r10 / 50 r11 / 50 r12 / 50 r13.
#
# Changed query fronted (group 1):
#   * scalar_variant_ingest — the round-13 ADVICE (low) fix: the
#     case-0 branch of the ragged-JSON synthesis now derives the flat
#     object from typed columns like the other three branches instead
#     of passing raw ``props`` through both engines' parsers (where
#     Spark VARIANT and DuckDB JSON diverge on duplicate object keys
#     and quoted numeric strings — parity was data-dependent on the
#     generator).  It is also a round-13 tail addition with no driver
#     row, so it fronts under either rule; listing it as changed
#     keeps the oracle-change gate non-vacuous.  Pinned by
#     tests/test_advice_r13.py.
#
# New round-14 queries register AFTER this rotation — registry tail,
# behind the window, per the new-query deferral policy; they are
# in-repo oracle-checked via pytest until the round-15 front.
#
# After round 14 the histogram (excluding round-14 tail additions)
# becomes 10 r9 / 50 r10 / 50 r11 / 50 r12 / 50 r13 / 50 r14 — oldest
# anywhere r9, age 5 entering round 15, exactly AT the sustainable
# freshness floor (the 10 remaining r9 rows must lead the round-15
# front; the floor arithmetic is pinned in
# tests/test_rotation.py::test_no_query_left_behind).  The round-15
# front (derive with through_round=14, changed = any round-14
# out-of-window oracle edits acknowledged in tests/test_rotation.py
# plus round-15 edits, deferred = round-15 additions) is: any changed
# queries first, then the round-14 tail additions (never
# driver-checked), then those 10 r9 rows, then the oldest r10 backlog.
# ---------------------------------------------------------------------------
_R14_CHANGED = [
    "scalar_variant_ingest",
]

_R14_FRONT = _R14_CHANGED + [
    # group 2 — the remaining round-13 tail addition, never
    # driver-checked (judge-verified green in VERDICT r13; it needs
    # the hard signal)
    "events_interval_join",
    # group 3 — the 9 r8-stale rows (verdict r13 ask #1), registration
    # order; du_core is the flagship entry() query
    "sql_grouping_sets",
    "window_order_gaps",
    "unpivot_lineitem_measures",
    "window_moving_spend",
    "range_join_price_bands",
    "events_sessionize",
    "events_session_window",
    "curation_sample_weighted",
    "du_core",
    # group 4 — the 39 oldest r9-stale rows, registration order (the
    # remaining 10 r9 rows lead the round-15 front)
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
    "du_lookup",
    "du_multifile",
    "topk_addresses",
    "window_top_orders",
    "window_running_total",
    "join_revenue_by_region",
    "anti_customers_without_orders",
    "setop_lapsed_customers",
    "rollup_order_stats",
    "distinct_customers_per_status",
    "approx_distinct_customers",
    "approx_order_percentiles",
    "scalar_monthly_orders",
]

_rotate_front(_R14_FRONT)
