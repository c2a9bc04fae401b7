"""The rotation front is derivation-checked (round-9 verdict #7):
the hand-written ``_R11_FRONT`` literal must equal the mechanical
derivation of the rotation policy from the driver's CORRECTNESS
record, and the staleness bookkeeping the rotation comments maintain
by hand must match the files on disk.

Round-11 rewrite (ADVICE r10): every derivation in this file is
PINNED to the record the round-11 rotation was computed from
(``through_round=10`` / ``_ROTATION_ROUND = 11``) instead of "whatever
CORRECTNESS files exist on disk" — the un-pinned forms broke the
moment the driver wrote the next round's file (the freshness floor
went red on the by-then-stale window, and the oracle-change gate went
vacuously green)."""
from __future__ import annotations

import os

# registry MUST be imported before any queries.rotation_* module:
# importing a rotation module directly would execute its
# _rotate_front against a not-yet-populated registry and turn the
# real rotation (inside registry's import sequence) into a no-op.
from go_mailio_diskusage_handler_spark.registry import ORACLE_SQL, QUERIES
from go_mailio_diskusage_handler_spark.queries import freshness  # noqa: E402
from go_mailio_diskusage_handler_spark.queries.rotation_r11 import (  # noqa: E402
    _R11_CHANGED,
    _R11_FRONT,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The round this rotation was authored for.  Every assertion below
# derives from the CORRECTNESS record as it stood ENTERING this round
# (through_round = _ROTATION_ROUND - 1), so the suite stays green when
# the driver writes CORRECTNESS_r11.json and only needs revisiting
# when rotation_r12 is authored.
_ROTATION_ROUND = 11


def _r11_deferred():
    """The new-query deferral set, derived mechanically: every registry
    callable defined in this round's additions modules (q_round11,
    q_round11b) registers at the tail and meets the external gate in
    round 12."""
    return [
        n for n, fn in QUERIES.items()
        if fn.__module__.endswith(".q_round11")
        or fn.__module__.endswith(".q_round11b")
    ]


def test_r11_front_matches_mechanical_derivation():
    """The literal _R11_FRONT == derive_front(registry, CORRECTNESS
    r01–r10).  through_round pins the derivation to the record that
    existed when the front was computed, so this stays green after the
    driver writes CORRECTNESS_r11."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    derived = freshness.derive_front(
        list(QUERIES),
        last,
        window=freshness.WINDOW,
        changed=_R11_CHANGED,
        deferred=_r11_deferred(),
    )
    assert derived == _R11_FRONT
    # and the rotation was actually applied: the registry's first
    # window IS the front, for both the queries and their oracles.
    assert list(QUERIES)[: len(_R11_FRONT)] == _R11_FRONT
    assert list(ORACLE_SQL)[: len(_R11_FRONT)] == _R11_FRONT


def test_derivation_is_idempotent_under_its_own_rotation():
    """Fronting the derived list preserves relative order within every
    staleness group, so re-deriving from the rotated registry yields
    the same front — the property that lets the test run AFTER the
    rotation is applied."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    names = list(QUERIES)  # already rotated by rotation_r11
    assert (
        freshness.derive_front(
            names, last, changed=_R11_CHANGED, deferred=_r11_deferred()
        )
        == _R11_FRONT
    )


def test_no_query_left_behind():
    """Freshness floor: every registry query either has a CORRECTNESS
    row within the last 4 driver rounds or sits inside the upcoming
    window — the invariant the rotation policy exists to maintain
    (never-checked queries MUST be in the front; nothing may go stale
    indefinitely while the window rotates past it).  Pinned to the
    record the rotation was built for (ADVICE r10: the un-pinned form
    went red the moment CORRECTNESS_r10 landed, because the floor
    advanced while the window was still last round's)."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    latest_round = _ROTATION_ROUND - 1
    window = set(list(QUERIES)[: freshness.WINDOW])
    deferred = set(_r11_deferred())
    violations = [
        n
        for n in QUERIES
        if last.get(n, -1) < latest_round - 3
        and n not in window
        and n not in deferred  # current-round additions gate next round
    ]
    assert violations == []


def test_stale_histogram_matches_rotation_comment():
    """The bookkeeping in rotation_r11.py's comment: entering round 11
    the histogram is 6 never / 29 r6 / 50 r7 / 50 r8 / 50 r9 / 50
    r10."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    names = [n for n in QUERIES if n not in set(_r11_deferred())]
    hist = freshness.stale_histogram(names, last)
    assert hist == {-1: 6, 6: 29, 7: 50, 8: 50, 9: 50, 10: 50}


# Round-11 oracle-text changes NOT inside the r11 window, each with
# its evidence trail (the round-4 advisory's acknowledgement path —
# they take first priority in the round-12 front):
#   * events_bounce_rate — ORACLE-only fix: to_timestamp(us//1e6) is
#     a timestamptz whose CAST AS DATE follows the HOST zone; replaced
#     with the naive make_timestamp(us).  Found by the round-11
#     TZ=America/New_York full-registry sweep (31 vs 30 rows);
#     verified green under BOTH zones (.r11/verify_two.py output in
#     .r11/, plus the re-run TZ sweep) and in the r11 UTC sweeps.
#   * events_compaction_bins — query AND oracle now emit hour bounds
#     as epoch_us (first_hour_us/last_hour_us): raw TIMESTAMP columns
#     are host-zone-dependent in plain PySpark collect()
#     (datetime.fromtimestamp uses the driver zone).  Same sweep, same
#     dual-zone verification.
_R11_CHANGED_ACKED: list[str] = [
    "events_bounce_rate",
    "events_compaction_bins",
]


def test_changed_oracles_meet_the_gate_or_are_acknowledged():
    """Mechanical 'changed queries front first' (the round-4 advisory,
    previously hand-tracked prose): every query whose oracle text
    changed THIS round — per ORACLE_HASHES.json, regenerated by
    tools_oracle_hashes.py — must be in the driver window, in the
    new-query deferral set, or explicitly acknowledged above with the
    evidence trail.  The checked round is PINNED to the round the
    rotation was authored for (ADVICE r10: deriving it from the
    CORRECTNESS files on disk made the gate vacuous the moment the
    driver wrote the current round's file)."""
    import json

    with open(os.path.join(REPO_ROOT, "ORACLE_HASHES.json")) as fh:
        hashes = json.load(fh)
    # the file must cover the registry exactly (regenerate on changes)
    assert set(hashes) == set(QUERIES)
    import hashlib

    stale = [
        n for n, sql in ORACLE_SQL.items()
        if hashlib.sha256(sql.encode()).hexdigest()[:16] != hashes[n]["hash"]
    ]
    assert stale == [], (
        f"oracle text changed without regenerating ORACLE_HASHES.json "
        f"(run tools_oracle_hashes.py): {stale}"
    )
    changed = {n for n, v in hashes.items() if v["round"] >= _ROTATION_ROUND}
    window = set(list(QUERIES)[: freshness.WINDOW])
    covered = window | set(_r11_deferred()) | set(_R11_CHANGED_ACKED)
    assert changed <= covered, sorted(changed - covered)


def test_front_external_gate_closure_for_r10_changes():
    """Closure of the round-10 acknowledgement debt: every oracle that
    changed in round 10 OUTSIDE the round-10 window (the 9 names the
    round-10 test acknowledged with in-repo evidence) is fronted in
    THIS round's window, so its next driver row post-dates the
    change."""
    import json

    with open(os.path.join(REPO_ROOT, "ORACLE_HASHES.json")) as fh:
        hashes = json.load(fh)
    last = freshness.last_checked(REPO_ROOT, through_round=10)
    # round == 10 and a PRE-r10 driver row: an existing oracle that
    # changed (the brand-new round-10 queries also carry round == 10
    # but were never checked before — they front as never-checked,
    # not as changed).
    r10_changed_unwindowed = {
        n for n, v in hashes.items()
        if v["round"] == 10 and 0 <= last.get(n, -1) < 10
    }
    assert r10_changed_unwindowed == set(_R11_CHANGED)
    assert set(_R11_CHANGED) <= set(_R11_FRONT[: len(_R11_CHANGED)])
