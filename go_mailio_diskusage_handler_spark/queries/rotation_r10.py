"""Round-10 rotation window: the two round-9 tail additions first,
then the 35 r5-stale rows, then the 13 oldest r6-stale rows.

Split-module convention as rotation_r6/r7/r8/r9; registration order is
owned by the import sequence in ``..registry``.

NEW in round 10: this front is no longer only hand-maintained prose —
``freshness.derive_front`` encodes the rotation policy and
``tests/test_rotation.py`` asserts this literal list equals the
mechanical derivation from CORRECTNESS_r01–r09, so a future round that
desyncs the bookkeeping fails the suite instead of silently skewing
the driver window.
"""
from __future__ import annotations

from .rotation_r45 import _rotate_front

# ---------------------------------------------------------------------------
# Round-10 window.  State entering the round (CORRECTNESS_r01-r09 +
# the round-9 verdict): 50/50 green in round 9, zero queries ever left
# red on their latest check; staleness histogram 2 never-checked
# (the round-9 tail additions) / 35 r5 / 42 r6 / 50 r7 / 50 r8 / 50 r9.
#
# Round-10 engine changes needing the external gate (changed queries
# front first, per the round-4 advisory):
#   * curation_ppl_buckets — perplexity_buckets grew the 'unscored'
#     bucket for NULL-text docs (ADVICE r9), oracle updated in
#     lockstep — already #1 below as a never-checked query.
#   * dedup_embedding_cosine — ORACLE cheapened (verdict #2: candidate
#     pre-filter before the cosine; same contract, same hash) —
#     already in the r5-stale group below.
#   * The shared oracle helpers _ddb_dot/_ddb_cosine/_ddb_bucket moved
#     to native list_dot_product (A/B-verified bit-identical, max abs
#     diff 0.0 over all sf0.1 self/cross/plane dots), which changes
#     the ORACLE TEXT of 20 queries — now MECHANICALLY tracked:
#     ORACLE_HASHES.json pins every oracle's content hash + the round
#     it last changed (regenerate with tools_oracle_hashes.py), and
#     tests/test_rotation.py fails unless every changed-this-round
#     query is in the window, deferred, or explicitly acknowledged.
#     12 of the 20 sit in this window; the 8 that do not
#     (curation_semantic_decontam, sim_embedding_stats,
#     sim_ivf_ann_topk, sim_ivf_assignments, sim_matryoshka_topk,
#     sim_mmr_topk, sim_range_search, udf_pandas_cosine — the hand
#     list this detector replaced had 5 names, one wrong) were
#     dual-scale re-verified in-repo this round and take first
#     priority in the round-11 front.
# Beyond that no extra fronting is needed; the staleness order already
# fronts every engine-changed query.
#
# New round-10 queries (full-outer interval-join batch twin, the
# applyInArrow tier, ...) register AFTER this rotation — registry
# tail, behind the window, per the new-query deferral policy; they are
# in-repo oracle-checked via pytest until the round-11 front.
#
# After round 10 the histogram is 3 never-checked (this round's tail
# additions events_attribution_full_outer / events_attribution_semi /
# udf_cogroup_arrow_stats) / 29 r6 / 50 r7 / 50 r8 / 50 r9 / 50 r10 —
# oldest anywhere r6, satisfying the round-8 verdict's "nothing older
# than r5 by round 10" with a round to spare.  The round-11 front
# (derived mechanically: freshness.derive_front with through_round=10,
# changed = the 8 acknowledged out-of-window oracle changes above —
# read them from ORACLE_HASHES.json rounds — plus any round-11
# changes, deferred = any round-11 additions) fronts those 8, then
# the 3 never-checked additions, then staleness order; by last-checked
# age the 50 slots split 3 never / 29 r6 / 15 r7 / 3 r8 (the r7/r8
# entries are the fronted changed queries plus the oldest r7 backlog).
# ---------------------------------------------------------------------------
_R10_FRONT = [
    # group 1 — the 2 round-9 tail additions, never driver-checked
    # (curation_ppl_buckets is also this round's engine-changed query)
    "curation_ppl_buckets",
    "sql_parameterized_revenue",
    # group 2 — the 35 r5-stale rows, registration order
    # (dedup_embedding_cosine's oracle changed this round — gated here)
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
    # group 3 — the 13 oldest r6-stale rows, registration order
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
]

_rotate_front(_R10_FRONT)
