"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship disk-usage aggregation at
sf0.001.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives
the DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
Column names/aliases are kept identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_mailio_diskusage_handler_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["du_core"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for each queries() key (omitted ⇒ rows-only)."""
    return dict(registry.ORACLE_SQL)
