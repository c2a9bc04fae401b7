"""Shared registry state: the QUERIES / ORACLE_SQL dicts and the
``register`` decorator every ``q_*`` family module populates.

This is the single source of truth consumed by ``__spark_entry__.py``,
``bench.py``, and the tests.  Convention: each Spark query aliases
every computed column, and the oracle SQL uses the *same* aliases so
the driver's order-insensitive value hash lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
