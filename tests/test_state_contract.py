"""Contract test pinning the transformWithState EMULATOR's semantics
to the documented StatefulProcessor API (round-11 verdict #7).

``google.protobuf`` is absent from this runtime and installs are out
of scope, so the real ``transformWithStateInPandas`` wire path cannot
run; this suite is the compensating control: it pins the emulator's
TTL and timer semantics to the published API contract, and pins the
emulator's SURFACE (method names, argument names) against pyspark's
own ``StatefulProcessorHandle``/``ValueState`` classes by reflection
— a pyspark upgrade that renames or re-shapes the API fails here
loudly instead of silently diverging from the emulation.

No SparkSession needed: the emulator is pure pandas by design.
"""
from __future__ import annotations

import inspect

import pandas as pd

from go_mailio_diskusage_handler_spark.streaming import stateful


# ---------------------------------------------------------------------------
# surface parity by reflection against pyspark's own classes
# ---------------------------------------------------------------------------

def test_emulated_handle_surface_matches_real_api():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessorHandle,
        ValueState,
    )

    real_handle = {m for m in dir(StatefulProcessorHandle)
                   if not m.startswith("_")}
    emulated = {m for m in dir(stateful._EmulatedHandle)
                if not m.startswith("_")}
    # every emulated method must exist on the real handle (no invented
    # API), and the subset the processors rely on must be emulated
    assert emulated <= real_handle, emulated - real_handle
    assert {"getValueState", "registerTimer", "deleteTimer",
            "listTimers"} <= emulated
    # argument-name parity for the one defaulted kwarg processors pass
    real_params = list(
        inspect.signature(StatefulProcessorHandle.getValueState).parameters
    )
    emu_params = list(
        inspect.signature(stateful._EmulatedHandle.getValueState).parameters
    )
    assert "ttlDurationMs" in real_params and "ttlDurationMs" in emu_params
    # ValueState surface
    real_vs = {m for m in dir(ValueState) if not m.startswith("_")}
    emu_vs = {m for m in dir(stateful._EmulatedValueState)
              if not m.startswith("_")}
    assert emu_vs <= real_vs, emu_vs - real_vs
    assert {"get", "update", "clear", "exists"} <= emu_vs


# ---------------------------------------------------------------------------
# a processor exercising TTL + timers through the documented API
# ---------------------------------------------------------------------------

class _SessionCloseProcessor(stateful.StatefulProcessor):
    """Counts per-key rows in TTL'd state and registers a
    processing-time timer 5 s out on every input batch; on expiry it
    emits a close record carrying whatever the (possibly TTL-expired)
    state still shows, then clears."""

    TTL_MS = 10_000
    TIMER_DELAY_MS = 5_000

    def init(self, handle):
        self._n = handle.getValueState(
            "n", "n bigint", ttlDurationMs=self.TTL_MS
        )
        self._handle = handle

    def handleInputRows(self, key, rows, timerValues):
        n = self._n.get() if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update(n)
        now = timerValues.getCurrentProcessingTimeInMs()
        self._handle.registerTimer(now + self.TIMER_DELAY_MS)
        yield pd.DataFrame({"user_id": [key[0]], "kind": ["input"],
                            "n": [n], "at_ms": [now]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        n = self._n.get() if self._n.exists() else -1  # -1 = TTL'd away
        self._n.clear()
        yield pd.DataFrame({
            "user_id": [key[0]], "kind": ["timer"], "n": [n],
            "at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
        })

    def close(self):
        pass


def _batch(users):
    return pd.DataFrame({"user_id": users, "value": [1.0] * len(users)})


def test_timer_fires_after_input_and_in_expiry_key_order():
    """Within a micro-batch, input rows process first and every timer
    with expiry <= batch processing time fires in (expiry, key)
    order, exactly once."""
    out = stateful.emulate_transform_with_state(
        _SessionCloseProcessor(),
        [_batch([2, 10]), _batch([10])],
        ["user_id"],
        batch_times_ms=[0, 6_000],
    )
    rows = list(out.itertuples(index=False))
    # batch 0 (t=0): inputs for keys 2 and 10 (value-sorted), timers
    # registered at 5000.  batch 1 (t=6000): input for 10 first, THEN
    # both t=5000 timers fire in key order 2, 10.
    assert [(r.kind, r.user_id) for r in rows] == [
        ("input", 2), ("input", 10),
        ("input", 10),
        ("timer", 2), ("timer", 10),
    ]
    # state survived to the timer (TTL 10 s > 5-6 s elapsed): counts
    # visible at close, and the batch-1 input saw batch-0 state
    assert [r.n for r in rows] == [1, 1, 2, 1, 2]
    # fired timers are removed — nothing re-fires later
    out2 = stateful.emulate_transform_with_state(
        _SessionCloseProcessor(), [_batch([7]), pd.DataFrame({"user_id": [],
        "value": []}), pd.DataFrame({"user_id": [], "value": []})],
        ["user_id"], batch_times_ms=[0, 6_000, 20_000],
    )
    kinds = list(out2["kind"])
    assert kinds.count("timer") == 1


def test_ttl_expires_from_last_update_not_last_read():
    """ttlDurationMs measures processing time since the last update:
    a value updated at t=0 with TTL 10 s is visible at t=6 s and gone
    at t=12 s — exists() False, get() None, as if cleared."""
    class Probe(stateful.StatefulProcessor):
        def init(self, handle):
            self._v = handle.getValueState("v", "n bigint",
                                           ttlDurationMs=10_000)

        def handleInputRows(self, key, rows, timerValues):
            seen = self._v.get() if self._v.exists() else None
            for pdf in rows:
                pass
            if seen is None:
                self._v.update((1,))
            yield pd.DataFrame({"user_id": [key[0]],
                                "seen": [-1 if seen is None else seen[0]]})

        def close(self):
            pass

    out = stateful.emulate_transform_with_state(
        Probe(), [_batch([1]), _batch([1]), _batch([1])], ["user_id"],
        batch_times_ms=[0, 6_000, 12_000],
    )
    # t=0: no state (-1), sets it.  t=6s: alive (1).  t=12s: the t=0
    # update is past TTL — reads as absent again (-1).
    assert list(out["seen"]) == [-1, 1, -1]


def test_delete_timer_cancels_and_list_timers_is_sorted():
    class T(stateful.StatefulProcessor):
        def init(self, handle):
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                pass
            self._handle.registerTimer(9_000)
            self._handle.registerTimer(3_000)
            assert list(self._handle.listTimers()) == [3_000, 9_000]
            self._handle.deleteTimer(3_000)
            yield pd.DataFrame({"user_id": [key[0]]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame({"user_id": [key[0]],
                                "ts": [expiredTimerInfo.getExpiryTimeInMs()]})

        def close(self):
            pass

    out = stateful.emulate_transform_with_state(
        T(), [_batch([5]), pd.DataFrame({"user_id": [], "value": []})],
        ["user_id"], batch_times_ms=[0, 10_000],
    )
    # only the 9 s timer survives to fire; the deleted 3 s one never does
    assert list(out.get("ts", pd.Series(dtype=float)).dropna()) == [9_000]


def test_time_mode_none_keeps_prior_contract():
    """batch_times_ms=None == timeMode 'None': clock pinned at 0, no
    timer pass, TTL never elapses — byte-identical behavior to the
    pre-round-12 emulator for the existing processors."""
    b0 = pd.DataFrame({"user_id": [1, 1, 2], "value": [1.0, 2.0, 5.0]})
    b1 = pd.DataFrame({"user_id": [2], "value": [3.0]})
    out = stateful.emulate_transform_with_state(
        stateful.UserTotalsProcessor(), [b0, b1], ["user_id"]
    )
    last = out.groupby("user_id").last()
    assert last.loc[1, "total_value"] == 3.0 and last.loc[1, "n_events"] == 2
    assert last.loc[2, "total_value"] == 8.0 and last.loc[2, "n_events"] == 2
