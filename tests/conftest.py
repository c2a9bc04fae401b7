from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mailio_diskusage_handler_spark.session import build_session  # noqa: E402
from go_mailio_diskusage_handler_spark.sources.tables import TABLES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with fixture tables registered as views,
    mirroring the driver's oracle harness."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_CORRECT}/{name}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, ndigits: int = 6):
    """Order-insensitive, float-rounded canonical form of a result set."""

    def norm(v):
        # duckdb returns list columns as numpy arrays; canonicalize any
        # container/np-scalar so == and the sort key behave.
        if hasattr(v, "item") and getattr(v, "shape", None) == ():
            v = v.item()
        if hasattr(v, "tolist"):
            v = v.tolist()
        if isinstance(v, float):
            # NaN != NaN would flag every null-padded numeric cell
            # (outer joins): both engines surface SQL NULL as float64
            # NaN through pandas, so canonicalize to a sentinel the
            # same way the contract-verify harness does.
            if v != v:
                return "nan"
            return round(v, ndigits)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    def key(row):
        return tuple((v is None, str(v)) for v in row)

    return sorted((tuple(norm(v) for v in row) for row in rows), key=key)


# pandas dtype.kind -> coarse type group.  The driver's value hash is
# TYPE-sensitive: a DuckDB HUGEINT renders as float64 ("150.0") while
# Spark returns bigint ("150") — numerically equal, hash-different.
# Round 6 shipped 7 driver reds from exactly that, invisible to a
# pure ==-compare (150.0 == 150 is True).  So the gate now also
# requires both engines to land in the same pandas dtype GROUP.
_KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "O": "obj", "M": "dt", "m": "td", "c": "complex"}


def assert_dtype_parity(name, cols, spark_pdf, oracle_pdf):
    """Fail when any column's pandas dtype group differs between the
    Spark result and the DuckDB oracle result — the driver's
    type-sensitive hash would flag it even if values are equal."""
    for c in cols:
        ks = _KIND_GROUP.get(spark_pdf[c].dtype.kind, spark_pdf[c].dtype.kind)
        ko = _KIND_GROUP.get(oracle_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind)
        assert ks == ko, (
            f"{name}.{c}: dtype-group mismatch spark={spark_pdf[c].dtype} "
            f"oracle={oracle_pdf[c].dtype} — driver hash is type-sensitive; "
            f"add an explicit CAST in the oracle SQL or the Spark query"
        )


def compare_with_oracle(spark, ddb, name: str, queries: dict, oracles: dict,
                        sf_dir: str = SF_CORRECT):
    """Run one registered query against its DuckDB oracle like the
    driver does: same column order (sorted by name), value compare,
    plus a pandas dtype-group parity check (see assert_dtype_parity)."""
    sdf = queries[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    spdf = sdf.select(*cols).toPandas()
    spark_rows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    ora = ddb.execute(oracles[name]).df()
    assert sorted(ora.columns.tolist()) == cols, (
        f"{name}: column mismatch spark={cols} oracle={sorted(ora.columns.tolist())}"
    )
    assert_dtype_parity(name, cols, spdf, ora)
    oracle_rows = [tuple(r) for r in ora[cols].itertuples(index=False, name=None)]
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    a, b = normalize(spark_rows), normalize(oracle_rows)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first 3: {mism[:3]}"
