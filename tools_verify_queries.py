"""Driver-style oracle verification for a subset of queries.

Runs each named query against its DuckDB oracle exactly like the
driver does (sorted columns, row count, dtype-group parity,
order-insensitive 6-digit value compare) at one or more scale
factors.  Used in optimization rounds to prove a restructured query
still computes the identical result BEFORE committing.

Usage:
    python tools_verify_queries.py [--sf /root/testdata/sf0.01] q1 q2 ...
    python tools_verify_queries.py ALL          # every registered query
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import duckdb  # noqa: E402

from go_mailio_diskusage_handler_spark import registry  # noqa: E402
from go_mailio_diskusage_handler_spark.session import build_session  # noqa: E402
from go_mailio_diskusage_handler_spark.sources.tables import TABLES  # noqa: E402

from conftest import compare_with_oracle  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    names = args.queries
    if names == ["ALL"]:
        names = [n for n in registry.QUERIES if n in registry.ORACLE_SQL]

    spark = build_session("verify-r15")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    n_pass = n_fail = 0
    for name in names:
        if name not in registry.ORACLE_SQL:
            print(f"{name}: NO-ORACLE (rows-only query), skipping")
            continue
        try:
            compare_with_oracle(
                spark, con, name, registry.QUERIES, registry.ORACLE_SQL,
                sf_dir=args.sf,
            )
            print(f"{name}: OK")
            n_pass += 1
        except Exception:
            print(f"{name}: FAIL")
            traceback.print_exc(limit=3)
            n_fail += 1
        finally:
            spark.catalog.clearCache()
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
