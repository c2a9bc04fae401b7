"""Cross-engine SQL fuzz: generated filter/aggregate queries run on
BOTH engines and value-compared — the systematic extension of the
registry's hand-written oracle pairs.

The grammar emits one SQL text that parses identically in Spark and
DuckDB (common ISO subset: comparisons, BETWEEN/IN, AND/OR/NOT, CASE,
year(), GROUP BY over low-cardinality keys) and keeps every aggregate
in EXACT arithmetic (COUNT / MIN / MAX / BIGINT sums of cent-scaled
values) so the only legitimate compare noise class — float-sum
addition order — is excluded BY CONSTRUCTION, per the round-11
exact-integer-sum rule.  Seeds are fixed, so failures replay.
"""
from __future__ import annotations

import random

import pytest

from conftest import normalize


# --- deterministic query generator -----------------------------------------

NUM_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
CENT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def _pred(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:
        c = rng.choice(NUM_COLS)
        return f"{c} {rng.choice(['<', '<=', '>', '>=', '='])} {rng.randrange(1, 60000)}"
    if kind == 1:
        c = rng.choice(CENT_COLS)
        return f"{c} BETWEEN {rng.randrange(0, 40)} AND {rng.randrange(40, 60000)}"
    if kind == 2:
        c = rng.choice(STR_COLS)
        vals = ", ".join(f"'{v}'" for v in rng.sample(["A", "N", "R", "O", "F"], 2))
        return f"{c} IN ({vals})"
    if kind == 3:
        return f"year(l_shipdate) {rng.choice(['<=', '>=', '='])} {rng.randrange(1995, 2002)}"
    if kind == 4:
        a, b = rng.sample(NUM_COLS, 2)
        return f"{a} % {rng.randrange(2, 13)} = {b} % {rng.randrange(2, 7)}"
    return f"NOT ({_pred(rng)})"


def _predicate(rng: random.Random, depth: int = 2) -> str:
    if depth == 0 or rng.random() < 0.4:
        return _pred(rng)
    op = rng.choice(["AND", "OR"])
    return f"({_predicate(rng, depth - 1)} {op} {_predicate(rng, depth - 1)})"


def _agg(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        return "CAST(COUNT(*) AS BIGINT) AS n"
    if kind == 1:
        c = rng.choice(NUM_COLS)
        return f"CAST({rng.choice(['MIN', 'MAX'])}({c}) AS BIGINT) AS m"
    if kind == 2:
        c = rng.choice(CENT_COLS)
        # exact: cent-scaled BIGINT sum
        return f"CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS BIGINT) AS s"
    if kind == 3:
        c = rng.choice(STR_COLS)
        return f"CAST(COUNT(*) AS BIGINT) AS n, MIN({c}) AS lo, MAX({c}) AS hi"
    c = rng.choice(NUM_COLS)
    p = _pred(rng)
    return (
        f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS n_case, "
        f"CAST(MAX(CASE WHEN {p} THEN {c} END) AS BIGINT) AS m_case"
    )


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    where = _predicate(rng)
    agg = _agg(rng)
    if rng.random() < 0.7:
        g = rng.choice(GROUP_COLS)
        return f"SELECT {g}, {agg} FROM lineitem WHERE {where} GROUP BY {g}"
    return f"SELECT {agg} FROM lineitem WHERE {where}"


SEEDS = list(range(1100, 1140))  # 40 deterministic queries


@pytest.mark.parametrize("seed", SEEDS)
def test_generated_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- join grammar: lineitem x orders, inner/left, optional HAVING ----------

O_NUM = ["o_orderkey", "o_custkey"]
O_STR = ["o_orderstatus", "o_orderpriority"]


def gen_join_query(seed: int) -> str:
    rng = random.Random(seed)
    join = rng.choice(["JOIN", "LEFT JOIN"])
    # a predicate over either side; LEFT JOIN + right-side predicate in
    # WHERE exercises null-elimination semantics in both engines
    side_pred = rng.choice(
        [
            _predicate(rng, 1),
            f"o_orderstatus {rng.choice(['=', '<>'])} '{rng.choice(['F', 'O', 'P'])}'",
            f"o_custkey % {rng.randrange(2, 9)} = 0",
        ]
    )
    g = rng.choice(["o_orderpriority", "l_returnflag", "o_orderstatus"])
    agg = (
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(o_custkey) AS BIGINT) AS n_right, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s"
    )
    q = (
        f"SELECT {g}, {agg} FROM lineitem {join} orders"
        f" ON l_orderkey = o_orderkey WHERE {side_pred} GROUP BY {g}"
    )
    if rng.random() < 0.5:
        q += f" HAVING COUNT(*) >= {rng.randrange(1, 50)}"
    return q


JOIN_SEEDS = list(range(2200, 2220))  # 20 deterministic join queries


@pytest.mark.parametrize("seed", JOIN_SEEDS)
def test_generated_join_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_join_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- window grammar: deterministic frames over unique ordering keys --------


def gen_window_query(seed: int) -> str:
    rng = random.Random(seed)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_orderkey % 7"])
    # the synthetic lineitem carries DUPLICATE (l_orderkey,
    # l_linenumber) pairs (~14k at sf0.01), so a total order needs the
    # DISTINCT row set ordered by every selected column — then every
    # ranking/frame below is deterministic in both engines
    order = "l_orderkey, l_linenumber, l_partkey, l_suppkey, cents"
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {rng.randrange(1, 9)} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN CURRENT ROW AND {rng.randrange(1, 9)} FOLLOWING",
        ]
    )
    fn = rng.choice(
        [
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order})",
            f"CAST(SUM(cents) OVER (PARTITION BY {part} ORDER BY {order} {frame}) AS BIGINT)",
            f"CAST(LAG(l_suppkey, {rng.randrange(1, 4)}, -1) OVER (PARTITION BY {part} ORDER BY {order}) AS BIGINT)",
            f"CAST(LEAD(l_partkey, {rng.randrange(1, 4)}, 0) OVER (PARTITION BY {part} ORDER BY {order}) AS BIGINT)",
            f"CAST(MIN(l_partkey) OVER (PARTITION BY {part} ORDER BY {order} {frame}) AS BIGINT)",
        ]
    )
    where = _predicate(rng, 1)
    return (
        f"SELECT l_orderkey, l_linenumber, {fn} AS w FROM ("
        f"SELECT DISTINCT l_orderkey, l_linenumber, l_partkey, l_suppkey,"
        f" l_returnflag, l_linestatus,"
        f" CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents"
        f" FROM lineitem WHERE {where}) t"
    )


WINDOW_SEEDS = list(range(3300, 3320))  # 20 deterministic window queries


@pytest.mark.parametrize("seed", WINDOW_SEEDS)
def test_generated_window_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_window_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- date grammar: the dialect overlap where the round-11 TZ bugs lived ----


def gen_date_query(seed: int) -> str:
    rng = random.Random(seed)
    d = f"DATE '{rng.randrange(1995, 2001)}-{rng.randrange(1, 13):02d}-{rng.randrange(1, 28):02d}'"
    part = rng.choice(["year", "month", "quarter"])
    where = rng.choice(
        [
            f"l_shipdate {rng.choice(['<', '>='])} {d}",
            f"date_trunc('{part}', l_shipdate) = date_trunc('{part}', {d})",
            f"month(l_shipdate) IN ({rng.randrange(1, 7)}, {rng.randrange(7, 13)})",
            f"day(l_shipdate) BETWEEN {rng.randrange(1, 10)} AND {rng.randrange(10, 29)}",
        ]
    )
    g = rng.choice(
        [
            "year(l_shipdate)",
            "month(l_shipdate)",
            "CAST(date_trunc('month', l_shipdate) AS DATE)",
        ]
    )
    return (
        f"SELECT {g} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(MIN(l_orderkey) AS BIGINT) AS lo "
        f"FROM lineitem WHERE {where} GROUP BY g"
    )


DATE_SEEDS = list(range(4400, 4420))


@pytest.mark.parametrize("seed", DATE_SEEDS)
def test_generated_date_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_date_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- string grammar: shared-dialect string function coverage ---------------


def gen_string_query(seed: int) -> str:
    rng = random.Random(seed)
    base = rng.choice(["p_type", "p_brand", "p_name"]) if rng.random() < 0.5 \
        else rng.choice(["o_orderpriority", "o_orderstatus"])
    table = "part" if base.startswith("p_") else "orders"
    expr = rng.choice(
        [
            f"upper({base})",
            f"lower({base})",
            f"substring({base}, {rng.randrange(1, 4)}, {rng.randrange(2, 6)})",
            f"replace({base}, '{rng.choice(['#', '-', 'a', 'E'])}', '_')",
            f"trim({base})",
            f"concat({base}, '|', {base})",
        ]
    )
    pred = rng.choice(
        [
            f"length({base}) {rng.choice(['>', '<=', '='])} {rng.randrange(2, 18)}",
            f"{base} LIKE '%{rng.choice(['1', '2', 'R', 'E', 'o'])}%'",
            f"instr({base}, '{rng.choice(['#', '1', 'M', 'd'])}') > 0",
        ]
    )
    return (
        f"SELECT {expr} AS e, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} WHERE {pred} GROUP BY e"
    )


STRING_SEEDS = list(range(5500, 5520))


@pytest.mark.parametrize("seed", STRING_SEEDS)
def test_generated_string_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_string_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- set-op grammar: UNION / INTERSECT / EXCEPT with ALL variants ----------


def gen_setop_query(seed: int) -> str:
    rng = random.Random(seed)
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
         "EXCEPT", "EXCEPT ALL"]
    )
    col = rng.choice(["o_custkey", "o_orderpriority", "o_orderstatus"])
    p1 = _pred_orders(rng)
    p2 = _pred_orders(rng)
    # aggregate AFTER the set op so multiset semantics survive into a
    # deterministic, small result
    return (
        f"SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        f"SELECT {col} FROM orders WHERE {p1} "
        f"{op} "
        f"SELECT {col} FROM orders WHERE {p2}) t GROUP BY k"
    )


def _pred_orders(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return f"o_custkey % {rng.randrange(2, 9)} = {rng.randrange(0, 2)}"
    if kind == 1:
        return f"o_totalprice BETWEEN {rng.randrange(0, 200000)} AND {rng.randrange(200000, 600000)}"
    if kind == 2:
        return f"o_orderstatus = '{rng.choice(['F', 'O', 'P'])}'"
    return f"year(o_orderdate) {rng.choice(['<=', '>='])} {rng.randrange(1996, 2001)}"


SETOP_SEEDS = list(range(6600, 6620))


@pytest.mark.parametrize("seed", SETOP_SEEDS)
def test_generated_setop_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_setop_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- subquery grammar: correlated scalar / EXISTS / IN decorrelation -------
# VERDICT r11 #5: the registry's decorrelation surface
# (sql_correlated_above_avg, sql_order_priority) covers only pointwise
# shapes; this grammar sweeps Catalyst's subquery rewrites — EXISTS /
# NOT EXISTS → semi/anti join, [NOT] IN → semi/anti (inner key is the
# non-null l_orderkey, so null-aware anti stays value-equivalent),
# correlated scalar aggregates → left outer aggregate join — against
# DuckDB's independent decorrelator.  All comparisons are exact-integer
# (cent-scaled BIGINT sums, COUNTs), per the round-11 float rule.


def _pred_l(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return f"l_quantity {rng.choice(['<', '>='])} {rng.randrange(5, 45)}"
    if kind == 1:
        return f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'"
    if kind == 2:
        return f"l_discount BETWEEN 0.0{rng.randrange(0, 5)} AND 0.0{rng.randrange(5, 10)}"
    return f"l_suppkey % {rng.randrange(2, 7)} = 0"


def gen_subquery_query(seed: int) -> str:
    rng = random.Random(seed)
    shape = rng.randrange(4)
    if shape == 0:
        # [NOT] EXISTS, correlated on the join key + an inner predicate
        q = rng.choice(["EXISTS", "NOT EXISTS"])
        sub = (
            f"{q} (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey"
            f" AND {_pred_l(rng)})"
        )
    elif shape == 1:
        # [NOT] IN over the non-null inner key (anti stays value-safe)
        q = rng.choice(["IN", "NOT IN"])
        sub = (
            f"o_orderkey {q} (SELECT l_orderkey FROM lineitem"
            f" WHERE {_pred_l(rng)})"
        )
    elif shape == 2:
        # correlated scalar SUM in cents vs the order's own total
        sub = (
            f"CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            f" {rng.choice(['>', '<='])}"
            f" (SELECT COALESCE(SUM(CAST(ROUND(l_extendedprice * 100)"
            f" AS BIGINT)), 0) FROM lineitem"
            f" WHERE l_orderkey = o_orderkey AND {_pred_l(rng)})"
        )
    else:
        # correlated COUNT threshold
        sub = (
            f"(SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey"
            f" AND {_pred_l(rng)}) {rng.choice(['>=', '='])} {rng.randrange(0, 4)}"
        )
    g = rng.choice(["o_orderpriority", "o_orderstatus"])
    outer = _pred_orders(rng)
    return (
        f"SELECT {g} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s "
        f"FROM orders WHERE {outer} AND {sub} GROUP BY k"
    )


SUBQUERY_SEEDS = list(range(7700, 7750))  # 50 deterministic queries


@pytest.mark.parametrize("seed", SUBQUERY_SEEDS)
def test_generated_subquery_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_subquery_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql


# --- frame grammar: RANGE vs ROWS boundary arithmetic + QUALIFY-style ------
# round-12 verdict #6: the registry's window queries are hand-written
# and the window grammar above covers functions but not frame-boundary
# arithmetic.  This grammar sweeps the corners that differ most across
# dialects: RANGE frames with numeric offsets (peer-inclusive, so
# deterministic even under order-key ties), RANGE over a NULLABLE key
# under every explicit NULLS FIRST/LAST × ASC/DESC combination (the
# null peer group's frame membership is the classic cross-engine
# divergence; Spark's default null ordering is NULLS FIRST for ASC
# while DuckDB's is NULLS LAST, so the grammar ALWAYS emits the
# ordering explicitly), ROWS frames over a total order threaded
# through the nullable key, and a QUALIFY-style rank cut (emitted as
# the shared-dialect subquery-filter form — Spark has no QUALIFY
# keyword) so every query also exercises ranked-row filtering.
# Aggregates stay in exact BIGINT cents per the round-11 rule.


def gen_frame_query(seed: int) -> str:
    rng = random.Random(seed)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_orderkey % 5"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    dirn = rng.choice(["ASC", "DESC"])
    k = rng.randrange(1, 4)
    lo, hi = rng.randrange(0, 500), rng.randrange(0, 500)
    # total order: the nullable key under its explicit direction +
    # null placement, then enough unique columns that ROW_NUMBER and
    # every ROWS frame below are deterministic in both engines
    total = (
        f"nk {dirn} {nulls}, l_orderkey, l_linenumber, l_partkey,"
        f" l_suppkey, cents"
    )
    fn = rng.choice(
        [
            # RANGE offset arithmetic over the non-null BIGINT measure
            f"CAST(SUM(cents) OVER (PARTITION BY {part} ORDER BY cents"
            f" RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) AS BIGINT)",
            f"CAST(COUNT(*) OVER (PARTITION BY {part} ORDER BY cents {dirn}"
            f" RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW) AS BIGINT)",
            # RANGE + nullable key: UNBOUNDED..CURRENT includes the
            # whole null peer group for null rows in both engines
            f"CAST(SUM(cents) OVER (PARTITION BY {part} ORDER BY nk {dirn}"
            f" {nulls} RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            f" AS BIGINT)",
            # RANGE offsets + nullable key: null rows' frame is exactly
            # the null peer group under every NULLS placement (probed
            # green on all four dirn×nulls combos before landing)
            f"CAST(SUM(cents) OVER (PARTITION BY {part} ORDER BY nk {dirn}"
            f" {nulls} RANGE BETWEEN {rng.randrange(1, 4)} PRECEDING AND"
            f" {rng.randrange(0, 3)} FOLLOWING) AS BIGINT)",
            # ROWS frame over the nullable-key total order
            f"CAST(MAX(cents) OVER (PARTITION BY {part} ORDER BY {total}"
            f" ROWS BETWEEN {rng.randrange(1, 6)} PRECEDING AND"
            f" {rng.randrange(0, 4)} FOLLOWING) AS BIGINT)",
        ]
    )
    where = _predicate(rng, 1)
    return (
        "WITH t AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey,"
        " l_suppkey, l_returnflag, l_linestatus,"
        " CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,"
        " NULLIF(l_suppkey % 7, 3) AS nk"
        f" FROM lineitem WHERE {where})"
        f" SELECT l_orderkey, l_linenumber, w FROM ("
        f"SELECT l_orderkey, l_linenumber, {fn} AS w,"
        f" ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total}) AS rk"
        f" FROM t) q WHERE rk <= {k}"
    )


FRAME_SEEDS = list(range(9000, 9050))  # 50 deterministic frame queries


@pytest.mark.parametrize("seed", FRAME_SEEDS)
def test_generated_frame_query_matches_duckdb(spark, ddb, seed):
    from go_mailio_diskusage_handler_spark.sql import register_views
    from conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = gen_frame_query(seed)
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    orows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert len(srows) == len(orows), sql
    assert normalize(srows) == normalize(orows), sql
