"""Core disk-usage pipeline: correctness vs DuckDB oracle + plan shape."""

from __future__ import annotations

import pytest

from go_mailio_diskusage_handler_spark import registry
from go_mailio_diskusage_handler_spark.operators import core
from go_mailio_diskusage_handler_spark.sources.tables import load_table

from conftest import SF_CORRECT, SF_SMOKE, compare_with_oracle

CORE_QUERIES = [
    "du_core",
    "du_lookup",
    "du_multifile",
    "du_incremental",
    "du_heavy_users",
    "du_top_growth",
    "du_scd2_history",
    "du_quota_alerts",
    "du_largest_files",
]


@pytest.mark.parametrize("name", CORE_QUERIES)
def test_oracle_parity(spark, ddb, name):
    compare_with_oracle(spark, ddb, name, registry.QUERIES, registry.ORACLE_SQL)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"address", "size_bytes", "number_files"}


def test_every_query_has_callable_shape(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_column_pruning_reaches_scan(spark):
    """The 2-of-21 projection must be pushed into the Parquet reader
    (reference does it by hand at handler.go:207-219; Catalyst must do
    it for us — ReadSchema should only list the used lineitem cols)."""
    inv = core.inventory_from_lineitem(load_table(spark, SF_SMOKE, "lineitem"))
    plan = core.disk_usage(inv)._jdf.queryExecution().executedPlan().toString()
    assert "l_orderkey" in plan
    # untouched wide columns must NOT be read
    for col in ("l_comment", "l_shipdate", "l_partkey", "l_quantity"):
        assert col not in plan, f"column {col} not pruned:\n{plan}"


def test_predicate_pushdown_reaches_scan(spark):
    """A filter on a stored column must reach the Parquet reader as a
    pushed filter (row-group/page skipping at scale), not run only
    post-scan."""
    from pyspark.sql import functions as F

    from go_mailio_diskusage_handler_spark import plans

    orders = load_table(spark, SF_SMOKE, "orders")
    df = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = plans.formatted(df)
    assert "PushedFilters: [" in plan, plan
    assert "EqualTo(o_orderstatus,F)" in plan, plan


def test_lookup_empty_for_unknown_address(spark):
    """Reference returns ErrNotFound for unknown address (handler.go:259-261)."""
    inv = core.inventory_from_lineitem(load_table(spark, SF_SMOKE, "lineitem"))
    du = core.disk_usage(inv)
    assert core.disk_usage_lookup(du, "no-such-address").count() == 0


def test_observed_metrics_match_quality_gate(spark):
    """df.observe counters must equal the standalone quality aggregate
    — same invariants, zero extra passes."""
    inv = core.inventory_from_lineitem(load_table(spark, SF_SMOKE, "lineitem"))
    du, obs = core.disk_usage_observed(inv)
    du.count()  # first action materializes the metrics
    gate = core.inventory_quality(inv).collect()[0]
    assert obs.get["total_rows"] == gate["total_rows"]
    assert obs.get["malformed_keys"] == gate["malformed_keys"]


def test_heavy_users_no_sort_no_window(spark):
    """heavy_users compares against BROADCAST scalars: the plan must
    contain no Sort/Window over the aggregate, and the 1-row stats
    side must broadcast."""
    from go_mailio_diskusage_handler_spark import plans

    inv = core.inventory_from_lineitem(load_table(spark, SF_SMOKE, "lineitem"))
    df = core.heavy_users(core.disk_usage(inv), 3.0)
    plan = plans.executed_plan(df)
    assert "Window" not in plan, plan
    assert "Broadcast" in plan, plan


def test_scd2_invariants(spark):
    """Every address has EXACTLY one current version; closed versions
    end at the new snapshot day; a changed address contributes one
    closed + one open row."""
    import collections

    from go_mailio_diskusage_handler_spark import registry

    rows = registry.QUERIES["du_scd2_history"](spark, SF_CORRECT).collect()
    by_addr = collections.defaultdict(list)
    for r in rows:
        by_addr[r.address].append(r)
        if r.is_current:
            assert r.valid_to == "9999-12-31"
        else:
            assert r.valid_to == "2024-01-02"
    deleted = 0
    for addr, vs in by_addr.items():
        cur = [v for v in vs if v.is_current]
        assert len(cur) <= 1, addr
        if not cur:
            deleted += 1
            assert len(vs) == 1 and not vs[0].is_current
    assert deleted > 0  # the slice construction guarantees deletions


def test_largest_files_shares_one_window_exchange(spark):
    """The rank window and the share-denominator SUM window both key
    on address — the plan must pay ONE exchange, not two."""
    from go_mailio_diskusage_handler_spark import plans, registry

    df = registry.QUERIES["du_largest_files"](spark, SF_CORRECT)
    assert plans.shuffle_count(df) == 1, plans.executed_plan(df)
