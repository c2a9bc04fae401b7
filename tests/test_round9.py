"""Round-9 regression tests: the ADVICE-r8 fixes (attempt-unique
writer file names, streamed md5, locked append commit, explicit NULL
policies in the DQ suites, the de-watermarked PSI stream) plus the
stream-writer replay-idempotence pin the round-8 verdict asked for.
"""
from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from conftest import SF_CORRECT  # noqa: F401  (shared fixture constants)


# ---------------------------------------------------------------------------
# Inventory writer: attempt-unique names / replay idempotence / lock
# ---------------------------------------------------------------------------


def _register(spark):
    from go_mailio_diskusage_handler_spark.sources.inventory_source import (
        MailioInventoryDataSource,
    )

    spark.dataSource.register(MailioInventoryDataSource)


def test_batch_writer_file_names_are_attempt_unique(spark, tmp_path):
    """Every data file name must carry the task ATTEMPT id (ADVICE r8):
    a speculative/zombie retry then writes a distinct path instead of
    racing a non-atomic write against the attempt the manifest already
    describes."""
    _register(spark)
    out = tmp_path / "inv"
    (
        spark.createDataFrame(
            [("alice/a", 1), ("bob/b", 2)], "key string, size long"
        )
        .repartition(2)
        .write.format("mailio_inventory")
        .option("path", str(out))
        .mode("append")
        .save()
    )
    names = sorted(p.name for p in out.glob("data-*.parquet"))
    # data-{job token}-{partition:05d}-{taskAttemptId}.parquet
    pat = re.compile(r"^data-[0-9a-f]{8}-\d{5}-\d+\.parquet$")
    assert names and all(pat.match(n) for n in names), names
    manifest = json.loads((out / "manifest.json").read_text())
    assert sorted(e["key"] for e in manifest["files"]) == names


def test_stream_writer_replayed_batch_republishes_same_manifest(tmp_path):
    """Replaying an already-committed batch id (driver restart after
    commit but before the checkpoint recorded it) must atomically
    RE-POINT manifest-batch-{id}.json at the replay's files —
    exactly-once at the manifest level — leaving the first attempt's
    files unlisted for vacuum, never double-listed."""
    from go_mailio_diskusage_handler_spark.sources.inventory_source import (
        MailioInventoryStreamWriter,
        _InventoryCommit,
        vacuum_uncommitted,
    )

    out = tmp_path / "sink"
    out.mkdir()

    def fake_files(tag: str) -> list[_InventoryCommit]:
        msgs = []
        for i in range(2):
            name = f"data-{tag}-{i:05d}-0.parquet"
            (out / name).write_bytes(b"PAR1" + tag.encode())
            msgs.append(_InventoryCommit(name, 4 + len(tag), "x" * 32))
        return msgs

    w1 = MailioInventoryStreamWriter({"path": str(out)}, overwrite=False)
    w1.commit(fake_files("aaaa0001"), batchId=7)
    first = json.loads((out / "manifest-batch-7.json").read_text())
    assert len(first["files"]) == 2 and first["batchId"] == 7

    # replayed batch: a NEW writer instance (fresh query-run token)
    # re-commits the SAME batch id with different task files
    w2 = MailioInventoryStreamWriter({"path": str(out)}, overwrite=False)
    w2.commit(fake_files("bbbb0002"), batchId=7)
    manifests = sorted(out.glob("manifest-batch-*.json"))
    assert [m.name for m in manifests] == ["manifest-batch-7.json"]
    replayed = json.loads((out / "manifest-batch-7.json").read_text())
    keys = {e["key"] for e in replayed["files"]}
    assert keys == {f"data-bbbb0002-{i:05d}-0.parquet" for i in range(2)}
    # first attempt's files are on disk but unlisted -> vacuum's job
    removed = sorted(vacuum_uncommitted(str(out), min_age_seconds=0.0))
    assert removed == [f"data-aaaa0001-{i:05d}-0.parquet" for i in range(2)]


def test_concurrent_append_jobs_lose_no_manifest_entries(spark, tmp_path):
    """The flock around the append commit's read-merge-replace
    (ADVICE r8): two append jobs committing concurrently must both
    land in manifest.json — without mutual exclusion the later
    os.replace silently drops the earlier job's entries."""
    import threading

    _register(spark)
    out = tmp_path / "inv"
    errs = []

    def write(rows):
        try:
            (
                spark.createDataFrame(rows, "key string, size long")
                .coalesce(1)
                .write.format("mailio_inventory")
                .option("path", str(out))
                .mode("append")
                .save()
            )
        except Exception as exc:  # surfaced below; thread must not die silent
            errs.append(exc)

    batches = [[(f"u{j}/f{j}", j + 1)] for j in range(4)]
    threads = [threading.Thread(target=write, args=(b,)) for b in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    manifest = json.loads((out / "manifest.json").read_text())
    assert sorted(e["key"] for e in manifest["files"]) == sorted(
        p.name for p in out.glob("data-*.parquet")
    )
    back = (
        spark.read.format("mailio_inventory")
        .option("manifest", str(out / "manifest.json"))
        .load()
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        r for b in batches for r in b
    )


def test_writer_md5_is_streamed_and_correct(tmp_path):
    """The write kernel hashes the written file in bounded chunks; the
    digest/size must still match a whole-file read."""
    import hashlib

    from go_mailio_diskusage_handler_spark.sources.inventory_source import (
        _write_inventory_part,
    )

    rows = [{"key": f"u/{i}", "size": i} for i in range(5000)]
    msg = _write_inventory_part(str(tmp_path), "part.parquet", iter(rows))
    raw = (tmp_path / "part.parquet").read_bytes()
    assert msg.size == len(raw)
    assert msg.md5 == hashlib.md5(raw).hexdigest()


# ---------------------------------------------------------------------------
# DQ suites: explicit NULL policy + empty-table hardening (ADVICE r8)
# ---------------------------------------------------------------------------


def test_inventory_constraints_count_null_key_as_malformed(spark):
    """A NULL key must count in BOTH completeness:key and
    malformed_frac:key — a bare SUM over the well-formed flag would
    silently drop the NULL while the DuckDB oracle's CASE...ELSE 1
    counts it."""
    from go_mailio_diskusage_handler_spark.operators import dq

    inv = spark.createDataFrame(
        [("a/b", 1), (None, 2), ("noslash", 3)], "key string, size long"
    )
    rows = {r["rule"]: r for r in dq.inventory_constraint_suite(inv).collect()}
    assert rows["completeness:key"]["metric"] == 1.0
    assert rows["completeness:key"]["status"] == "FAIL"
    # malformed = the NULL key AND the slashless key -> 2/3
    assert rows["malformed_frac:key"]["metric"] == pytest.approx(2 / 3, abs=1e-6)


def test_constraint_suite_empty_orders_is_well_defined(spark):
    """Empty input: every rule must report PASS with a non-NULL metric
    (SUM over zero rows is NULL; un-coalesced it read FAIL-with-NULL
    for all five rules)."""
    from go_mailio_diskusage_handler_spark.operators import dq

    orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double",
    )
    customer = spark.createDataFrame([], "c_custkey long")
    rows = {r["rule"]: r for r in dq.constraint_suite(orders, customer).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["status"] == "PASS", r
        assert r["metric"] is not None
    # the floored denominator makes empty-table completeness read as
    # vacuously complete (1.0); the count-valued rules read 0.0
    assert rows["completeness:o_custkey"]["metric"] == 1.0
    assert rows["domain:o_orderstatus"]["metric"] == 0.0
    assert rows["referential:o_custkey->c_custkey"]["metric"] == 0.0


def test_inventory_constraints_empty_table_is_well_defined(spark):
    from go_mailio_diskusage_handler_spark.operators import dq

    inv = spark.createDataFrame([], "key string, size long")
    rows = dq.inventory_constraint_suite(inv).collect()
    assert rows and all(
        r["status"] == "PASS" and r["metric"] == 0.0 for r in rows
    )


# ---------------------------------------------------------------------------
# PSI stream: no inert watermark (ADVICE r8)
# ---------------------------------------------------------------------------


def test_binned_psi_counts_has_no_watermark(spark):
    """binned_psi_counts aggregates on non-event-time keys, so a
    watermark could neither bound state nor evict rows; the plan must
    not advertise late-data semantics it does not have."""
    from go_mailio_diskusage_handler_spark.operators import dq
    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    ev = load_table(spark, SF_CORRECT, "events")
    bounds = dq.reference_decile_bounds(
        ev.select(
            "event_type", "value", (F.unix_timestamp("ts") < F.lit(1e18)).alias("is_ref")
        ).where("is_ref")
    )
    plan = (
        windows.binned_psi_counts(ev, bounds, split_epoch=0.0)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "EventTimeWatermark" not in plan
