"""Static type-hygiene gate over every registered oracle.

DuckDB types an un-cast integer ``SUM(...)`` as HUGEINT; pandas
``.df()`` renders HUGEINT as float64 ("150.0") while the Spark side
returns bigint ("150").  The driver's correctness hash is
type-sensitive, so the values match but the hash does not — round 6
shipped 7 driver reds (and 12 latent copies) from exactly this.

This test DESCRIBEs all 196 oracle queries (no execution — DuckDB
binds the plan and reports output types) and fails on any column in
the HUGEINT family, forcing an explicit ``CAST(... AS BIGINT)`` at
authoring time.  Runtime dtype parity between the two engines is
separately enforced per-query by ``conftest.assert_dtype_parity``.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mailio_diskusage_handler_spark import registry  # noqa: E402
from go_mailio_diskusage_handler_spark.sources.tables import TABLES  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"

# DuckDB output types that pandas renders as float64/uint — these can
# never hash-match a Spark integer column under the driver's compare.
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
              "UTINYINT", "INT128"}


@pytest.fixture(scope="module")
def ddb_tiny():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_TINY}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLE_SQL))
def test_oracle_has_no_hugeint_columns(ddb_tiny, name):
    desc = ddb_tiny.execute(f"DESCRIBE ({registry.ORACLE_SQL[name]})").fetchall()
    hits = [(col, typ) for col, typ, *_ in desc if typ in _FORBIDDEN]
    assert not hits, (
        f"{name}: oracle columns typed in the HUGEINT family {hits} — "
        f"pandas renders these float64, the driver's type-sensitive hash "
        f"will mismatch Spark's bigint; wrap with CAST(... AS BIGINT)"
    )


def test_dtype_parity_gate_catches_hugeint_class(ddb_tiny):
    """Meta-test: the round-7 gate must FAIL on exactly the defect
    class that slipped through round 6 — a DuckDB HUGEINT (rendered
    float64) against a Spark bigint with numerically equal values —
    and pass once the oracle casts."""
    import pandas as pd
    import pytest as _pytest

    from conftest import assert_dtype_parity

    bad = ddb_tiny.execute(
        "SELECT SUM(x) AS s FROM (SELECT 150 AS x)"
    ).df()  # HUGEINT -> float64
    good = ddb_tiny.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 150 AS x)"
    ).df()
    spark_like = pd.DataFrame({"s": pd.array([150], dtype="int64")})
    assert bad["s"].dtype.kind == "f" and good["s"].dtype.kind == "i"
    with _pytest.raises(AssertionError, match="dtype-group mismatch"):
        assert_dtype_parity("meta", ["s"], spark_like, bad)
    assert_dtype_parity("meta", ["s"], spark_like, good)
