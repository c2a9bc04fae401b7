"""Pins for the three round-11 ADVICE items (ADVICE.md, round 11):

1. med_price now rounds to 4 dp, and the REAL invariant is pinned: an
   even-count median interpolates two middle values that differ in
   general, but 2-decimal prices put the true median on the 0.005
   grid — a subset of the 1e-4 rounding grid — so ROUND(,4) collapses
   any ulp-level interpolation-formula difference between engines.
2. text_hash_classifier's logistic link is the algebraic sigmoid
   0.5 + x/(2·(1+|x|)) — every op IEEE-correctly-rounded, so the score
   is BIT-identical across Spark / DuckDB / CPython, unlike exp().
3. stat_crosstab_priority's oracle hard-codes the o_orderstatus pivot
   domain {F, O, P}; that is a FIXTURE CONTRACT asserted here at every
   test scale, so a fixture missing a status fails with a data-contract
   message instead of an opaque column-set mismatch.
"""
from __future__ import annotations

import math

import duckdb
import pytest


# ---------------------------------------------------------------------------
# 1. even-count median: differing middle values, ROUND(,4) on the grid
# ---------------------------------------------------------------------------

def test_even_count_median_round_grid(spark):
    """Even-count group whose two middle values DIFFER (the case the
    old comment wrongly excluded): both engines interpolate, and
    ROUND(,4) lands on the same grid point because 2-decimal inputs
    make the true median a multiple of 0.005 ⊂ the 1e-4 grid."""
    # middle pair (101.01, 202.04) -> true median 151.525, on-grid
    vals = [50.00, 101.01, 202.04, 300.07]
    sdf = spark.createDataFrame([(v,) for v in vals], "price double")
    from pyspark.sql import functions as F

    spark_med = sdf.agg(F.round(F.median("price"), 4)).collect()[0][0]
    con = duckdb.connect()
    # cast to DOUBLE: the fixture column is DOUBLE, and DuckDB's
    # median only interpolates for continuous types (over DECIMAL it
    # picks an element — a different operator than the one under test)
    duck_med = con.execute(
        "SELECT ROUND(median(CAST(price AS DOUBLE)), 4) FROM"
        " (VALUES (50.00), (101.01), (202.04), (300.07)) t(price)"
    ).fetchone()[0]
    con.close()
    assert spark_med == duck_med == 151.525
    # the grid argument itself: mean of two 2-decimal values is a
    # multiple of 0.005, and every such multiple is exactly a 1e-4
    # grid point after rounding (never a tie midpoint).
    assert (151.525 * 10000) == int(151.525 * 10000)


# ---------------------------------------------------------------------------
# 2. algebraic sigmoid bit-identity across engines
# ---------------------------------------------------------------------------

def _alg_sigmoid(s: int, n: int) -> float:
    x = (s / (30.0 * n)) * 8.0
    return 0.5 + (x / (2.0 * (1.0 + abs(x))))


@pytest.mark.parametrize(
    "s,n",
    [(7, 13), (-11, 9), (0, 5), (123, 41), (-999, 1000), (30, 1), (-30, 1),
     (1, 997), (500, 501)],
)
def test_algebraic_sigmoid_bit_identity(spark, s, n):
    """The identical expression tree of correctly-rounded IEEE ops
    (+ - * / abs) yields the identical BIT PATTERN in CPython, DuckDB,
    and Spark — no tolerance, exact ==.  This is the property the
    exp() form lacked (libm exp differs in the last ulp)."""
    py = _alg_sigmoid(s, n)
    con = duckdb.connect()
    duck = con.execute(
        "SELECT 0.5 + (x / (2.0 * (1.0 + abs(x)))) FROM "
        f"(SELECT (({s} / (30.0 * {n})) * 8.0) AS x)"
    ).fetchone()[0]
    con.close()
    sp = spark.sql(
        f"SELECT 0.5 + (x / (2.0 * (1.0 + abs(x)))) AS p FROM "
        f"(SELECT ((CAST({s} AS DOUBLE) / (30.0 * {n})) * 8.0) AS x)"
    ).collect()[0][0]
    assert math.isclose(py, duck, rel_tol=0.0, abs_tol=0.0)
    assert math.isclose(py, sp, rel_tol=0.0, abs_tol=0.0)
    assert 0.0 < py < 1.0


# ---------------------------------------------------------------------------
# 3. crosstab pivot-domain fixture contract
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_crosstab_status_domain_contract(sf):
    """STAT_CROSSTAB_ORACLE's hard-coded {F, O, P} column set is valid
    iff the fixture realizes all three statuses; assert that contract
    directly so a divergent fixture fails HERE, loudly, as a data
    issue."""
    con = duckdb.connect()
    got = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT o_orderstatus FROM "
            f"'/root/testdata/sf{sf}/orders.parquet'"
        ).fetchall()
    }
    con.close()
    assert got == {"F", "O", "P"}, (
        f"fixture sf{sf} violates the crosstab pivot-domain contract: "
        f"stat_crosstab_priority's oracle assumes {{F,O,P}}, got {got}"
    )
