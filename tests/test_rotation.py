"""The rotation front is derivation-checked (round-9 verdict #7):
the hand-written ``_R13_FRONT`` literal must equal the mechanical
derivation of the rotation policy from the driver's CORRECTNESS
record, and the staleness bookkeeping the rotation comments maintain
by hand must match the files on disk.

Round-11 rewrite (ADVICE r10): every derivation in this file is
PINNED to the record the rotation was computed from
(``through_round = _ROTATION_ROUND - 1``) instead of "whatever
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
from go_mailio_diskusage_handler_spark.queries.rotation_r13 import (  # noqa: E402
    _R13_CHANGED,
    _R13_FRONT,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The round this rotation was authored for.  Every assertion below
# derives from the CORRECTNESS record as it stood ENTERING this round
# (through_round = _ROTATION_ROUND - 1), so the suite stays green when
# the driver writes CORRECTNESS_r13.json and only needs revisiting
# when rotation_r14 is authored.
_ROTATION_ROUND = 13


def _r13_deferred():
    """The new-query deferral set, derived mechanically: every registry
    callable defined in this round's additions module(s) (q_round13*)
    registers at the tail and meets the external gate in round 14."""
    return [
        n for n, fn in QUERIES.items()
        if ".q_round13" in fn.__module__
    ]


def test_r13_front_matches_mechanical_derivation():
    """The literal _R13_FRONT == derive_front(registry, CORRECTNESS
    r01–r12).  through_round pins the derivation to the record that
    existed when the front was computed, so this stays green after the
    driver writes CORRECTNESS_r13."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    derived = freshness.derive_front(
        list(QUERIES),
        last,
        window=freshness.WINDOW,
        changed=_R13_CHANGED,
        deferred=_r13_deferred(),
    )
    assert derived == _R13_FRONT
    # and the rotation was actually applied: the registry's first
    # window IS the front, for both the queries and their oracles.
    assert list(QUERIES)[: len(_R13_FRONT)] == _R13_FRONT
    assert list(ORACLE_SQL)[: len(_R13_FRONT)] == _R13_FRONT


def test_derivation_is_idempotent_under_its_own_rotation():
    """Fronting the derived list preserves relative order within every
    staleness group, so re-deriving from the rotated registry yields
    the same front — the property that lets the test run AFTER the
    rotation is applied."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    names = list(QUERIES)  # already rotated by rotation_r13
    assert (
        freshness.derive_front(
            names, last, changed=_R13_CHANGED, deferred=_r13_deferred()
        )
        == _R13_FRONT
    )


def test_no_query_left_behind():
    """Freshness floor: every registry query either has a CORRECTNESS
    row within the last 4 driver rounds or sits inside the upcoming
    window — the invariant the rotation policy exists to maintain
    (never-checked queries MUST be in the front; nothing may go stale
    indefinitely while the window rotates past it).

    The floor is ``latest_round - 4``: a 250+-query registry over a
    50-slot window has a steady-state revisit period of just over 5
    rounds, so age 4 between checks is the tightest SUSTAINABLE bound
    (entering round 13: 8 never-checked + 4 r7 + 47 r8 = 59 > 50
    window slots — the 38-of-47 r8 split below is the overflow working
    itself off; the 9 leftover r8 rows are exactly age 4 entering
    round 14 and lead its front)."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    latest_round = _ROTATION_ROUND - 1
    window = set(list(QUERIES)[: freshness.WINDOW])
    deferred = set(_r13_deferred())
    violations = [
        n
        for n in QUERIES
        if last.get(n, -1) < latest_round - 4
        and n not in window
        and n not in deferred  # current-round additions gate next round
    ]
    assert violations == []
    # and the capacity arithmetic itself: nothing outside the window
    # may be older than the steady-state period allows, which means
    # every sub-floor query IS in the window — restated so a future
    # registry growth that breaks sustainability fails loudly here.
    backlog = [n for n in QUERIES if n not in deferred]
    assert len(backlog) <= 5 * freshness.WINDOW + freshness.WINDOW, (
        "registry outgrew the 6-round revisit capacity; renegotiate "
        "the floor or the window"
    )


def test_stale_histogram_matches_rotation_comment():
    """The bookkeeping in rotation_r13.py's comment: entering round 13
    the histogram is 8 never / 4 r7 / 47 r8 / 49 r9 / 50 r10 /
    50 r11 / 50 r12."""
    last = freshness.last_checked(REPO_ROOT, through_round=_ROTATION_ROUND - 1)
    names = [n for n in QUERIES if n not in set(_r13_deferred())]
    hist = freshness.stale_histogram(names, last)
    assert hist == {-1: 8, 7: 4, 8: 47, 9: 49, 10: 50, 11: 50, 12: 50}


# Round-13 oracle-text changes NOT inside the r13 window, each needing
# an evidence trail (the round-4 advisory's acknowledgement path —
# they take first priority in the round-14 front).  Empty this round:
# the single round-13 oracle edit (dq_embeddings_constraints — the
# ADVICE r12 empty-list guard) is fronted in the window itself as the
# changed query.
_R13_CHANGED_ACKED: list[str] = []


def test_changed_oracles_meet_the_gate_or_are_acknowledged():
    """Mechanical 'changed queries front first' (the round-4 advisory,
    previously hand-tracked prose): every query whose oracle text
    changed THIS round — per ORACLE_HASHES.json, regenerated by
    tools_oracle_hashes.py — must be in the driver window, in the
    new-query deferral set, or explicitly acknowledged above with the
    evidence trail."""
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
    covered = window | set(_r13_deferred()) | set(_R13_CHANGED_ACKED)
    assert changed <= covered, sorted(changed - covered)


def test_front_external_gate_closure_for_r12_changes():
    """Closure of the round-12 acknowledgement trail: every oracle
    that changed in round 12 (per ORACLE_HASHES.json) and had a
    pre-r12 driver row was fronted INSIDE the round-12 window itself
    (rotation_r12's _R12_CHANGED — _R12_CHANGED_ACKED was empty), so
    each one's round-12 driver row post-dates its change.  Verified
    here against the record: all four carry green r12 rows."""
    import json

    with open(os.path.join(REPO_ROOT, "ORACLE_HASHES.json")) as fh:
        hashes = json.load(fh)
    pre = freshness.last_checked(REPO_ROOT, through_round=11)
    # round == 12 and a PRE-r12 driver row: an existing oracle that
    # changed (the brand-new round-12 additions also carry round == 12
    # but had no earlier row — they front as never-checked, not as
    # changed; the r11 TZ fixes events_bounce_rate/compaction_bins
    # carry round == 11).
    r12_changed_existing = {
        n for n, v in hashes.items()
        if v["round"] == 12 and 0 <= pre.get(n, -1) < 12
    }
    # empty: the two r12 ADVICE edits (scalar_sql2023_aggregates,
    # text_hash_classifier) were THEMSELVES r11 tail additions with no
    # pre-r12 row — they fronted as changed AND never-checked at once.
    assert r12_changed_existing == set()
    # the four queries rotation_r12 fronted as changed all carry green
    # round-12 driver rows, closing both the r11 TZ-fix debt and the
    # r12 ADVICE edits.
    last = freshness.last_checked(REPO_ROOT, through_round=12)
    assert all(
        last.get(n) == 12
        for n in (
            "events_bounce_rate",
            "events_compaction_bins",
            "scalar_sql2023_aggregates",
            "text_hash_classifier",
        )
    )
