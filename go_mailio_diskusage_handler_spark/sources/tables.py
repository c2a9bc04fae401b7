"""Parquet table sources over the driver fixtures.

Maps the reference's Parquet scan (O4, ``/root/reference/handler.go:
170-198`` — Arrow ``ReadTable`` then 5-row batches) to Spark's
vectorized Parquet reader: one task per row-group split, 4096-row
columnar batches, column pruning and predicate pushdown handled by
Catalyst.  At 100 TB the same one-liner fans out to one task per
~128 MB split; nothing here is driver-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. ``sf_dir`` is e.g. /root/testdata/sf0.01."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def read_inventory(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Multi-file inventory scan (reference O12, ``handler.go:83-91``).

    The reference loops over manifest files sequentially and — the §2
    semantic trap — lets each file's aggregate OVERWRITE the previous
    one (``handler.go:231,252``).  Spark reads every path in one scan
    and aggregates across all of them, which is the README's stated
    intent ("stores all accumulated file information", README.md:15-17).
    Per-file error skip (handler.go:86-89) maps to
    ``spark.sql.files.ignoreCorruptFiles``.
    """
    return spark.read.parquet(*paths)
