"""The rotation front is now derivation-checked (round-9 verdict #7):
the hand-written ``_R10_FRONT`` literal must equal the mechanical
derivation of the rotation policy from the driver's CORRECTNESS
record, and the staleness bookkeeping the rotation comments maintain
by hand must match the files on disk.
"""
from __future__ import annotations

import os

# registry MUST be imported before any queries.rotation_* module:
# importing a rotation module directly would execute its
# _rotate_front against a not-yet-populated registry and turn the
# real rotation (inside registry's import sequence) into a no-op.
from go_mailio_diskusage_handler_spark.registry import ORACLE_SQL, QUERIES
from go_mailio_diskusage_handler_spark.queries import freshness  # noqa: E402
from go_mailio_diskusage_handler_spark.queries.rotation_r10 import (  # noqa: E402
    _R10_FRONT,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Round-10 engine-changed queries (the round-4 advisory's front-first
# rule).  Both already sit in the staleness-ordered front, so listing
# them changes nothing — but keeping the list HERE, next to the
# assertion, is what makes a future desync fail loudly.
_R10_CHANGED = ["curation_ppl_buckets"]


def _r10_deferred():
    """The new-query deferral set, derived mechanically: every registry
    callable defined in this round's additions module (q_round10)
    registers at the tail and meets the external gate in round 11."""
    return [
        n for n, fn in QUERIES.items()
        if fn.__module__.endswith(".q_round10")
    ]


def test_r10_front_matches_mechanical_derivation():
    """The literal _R10_FRONT == derive_front(registry, CORRECTNESS
    r01–r09).  through_round=9 pins the derivation to the record that
    existed when the front was computed, so this stays green after the
    driver writes CORRECTNESS_r10."""
    last = freshness.last_checked(REPO_ROOT, through_round=9)
    derived = freshness.derive_front(
        list(QUERIES),
        last,
        window=freshness.WINDOW,
        changed=_R10_CHANGED,
        deferred=_r10_deferred(),
    )
    assert derived == _R10_FRONT
    # and the rotation was actually applied: the registry's first
    # window IS the front, for both the queries and their oracles.
    assert list(QUERIES)[: len(_R10_FRONT)] == _R10_FRONT
    assert list(ORACLE_SQL)[: len(_R10_FRONT)] == _R10_FRONT


def test_derivation_is_idempotent_under_its_own_rotation():
    """Fronting the derived list preserves relative order within every
    staleness group, so re-deriving from the rotated registry yields
    the same front — the property that lets the test run AFTER the
    rotation is applied."""
    last = freshness.last_checked(REPO_ROOT, through_round=9)
    names = list(QUERIES)  # already rotated by rotation_r10
    assert (
        freshness.derive_front(
            names, last, changed=_R10_CHANGED, deferred=_r10_deferred()
        )
        == _R10_FRONT
    )


def test_no_query_left_behind():
    """Freshness floor: every registry query either has a CORRECTNESS
    row within the last 4 driver rounds or sits inside the upcoming
    window — the invariant the rotation policy exists to maintain
    (never-checked queries MUST be in the front; nothing may go stale
    indefinitely while the window rotates past it)."""
    last = freshness.last_checked(REPO_ROOT)
    latest_round = max(last.values())
    window = set(list(QUERIES)[: freshness.WINDOW])
    deferred = set(_r10_deferred())
    violations = [
        n
        for n in QUERIES
        if last.get(n, -1) < latest_round - 3
        and n not in window
        and n not in deferred  # current-round additions gate next round
    ]
    assert violations == []


def test_stale_histogram_matches_rotation_comment():
    """The bookkeeping in rotation_r10.py's comment: entering round 10
    the histogram is 2 never / 35 r5 / 42 r6 / 50 r7 / 50 r8 / 50 r9."""
    last = freshness.last_checked(REPO_ROOT, through_round=9)
    names = [n for n in QUERIES if n not in set(_r10_deferred())]
    hist = freshness.stale_histogram(names, last)
    assert hist == {-1: 2, 5: 35, 6: 42, 7: 50, 8: 50, 9: 50}


# Round-10 oracle-text changes NOT inside the r10 window (mechanically
# detected via ORACLE_HASHES.json — the hand-maintained list this
# replaces had 5 names, wrongly included sim_pq_ann_topk, and missed
# 4): all verified value-identical in the round-10 dual-scale sweeps
# (.r10/verify_full_r10b.log, .r10/verify_sf01_r10a.log) after the
# bit-identical native-dot helper conversion, and first in line for
# the round-11 front.
_R10_CHANGED_ACKED = [
    "curation_semantic_decontam",
    "sim_embedding_stats",
    "sim_ivf_ann_topk",
    "sim_ivf_assignments",
    "sim_matryoshka_topk",
    "sim_mmr_topk",
    "sim_range_search",
    "udf_pandas_cosine",
    # late-round oracle cheapening (edges AS MATERIALIZED in the
    # recursive cluster chains, evaluation-hint only, A/B-identical at
    # sf0.1 and parity-green at sf0.01): dedup_clusters and
    # curation_corpus are in the r10 window; keep_best is not.
    "curation_keep_best",
]


def test_changed_oracles_meet_the_gate_or_are_acknowledged():
    """Mechanical 'changed queries front first' (the round-4 advisory,
    previously hand-tracked prose): every query whose oracle text
    changed THIS round — per ORACLE_HASHES.json, regenerated by
    tools_oracle_hashes.py — must be in the driver window, in the
    new-query deferral set, or explicitly acknowledged above with the
    evidence trail.  An oracle edit can no longer slip past the
    external gate unnoticed."""
    import json

    with open(os.path.join(REPO_ROOT, "ORACLE_HASHES.json")) as fh:
        hashes = json.load(fh)
    # the file must cover the registry exactly (regenerate on changes)
    assert set(hashes) == set(QUERIES)
    import hashlib

    current_round = max(freshness.last_checked(REPO_ROOT).values()) + 1
    stale = [
        n for n, sql in ORACLE_SQL.items()
        if hashlib.sha256(sql.encode()).hexdigest()[:16] != hashes[n]["hash"]
    ]
    assert stale == [], (
        f"oracle text changed without regenerating ORACLE_HASHES.json "
        f"(run tools_oracle_hashes.py): {stale}"
    )
    changed = {n for n, v in hashes.items() if v["round"] >= current_round}
    window = set(list(QUERIES)[: freshness.WINDOW])
    covered = window | set(_r10_deferred()) | set(_R10_CHANGED_ACKED)
    assert changed <= covered, sorted(changed - covered)
