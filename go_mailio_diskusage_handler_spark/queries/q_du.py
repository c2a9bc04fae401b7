"""Reference disk-usage pipeline (SURVEY §2 O5-O12): du_core and friends.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core
from ..sources.tables import load_table
from ._base import register


# ---------------------------------------------------------------------------
# Shared SQL fragment: the synthesized S3-inventory view over lineitem
# (mirrors operators.core.inventory_from_lineitem exactly).
# ---------------------------------------------------------------------------
INVENTORY_SQL = """
    SELECT CASE WHEN l_linenumber = 7 THEN CAST(l_orderkey AS VARCHAR)
                ELSE CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR)
           END AS key,
           l_extendedprice AS size
    FROM lineitem
"""

DU_CORE_SQL = f"""
    WITH inventory AS ({INVENTORY_SQL})
    SELECT split_part(key, '/', 1) AS address,
           ROUND(SUM(size), 2) AS size_bytes,
           COUNT(*) AS number_files
    FROM inventory
    WHERE len(string_split(key, '/')) >= 2
    GROUP BY address
"""


@register("du_core", DU_CORE_SQL)
def du_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O5-O8: project → derive address → guard → SUM/COUNT.

    See operators/core.py; parity with /root/reference/handler.go:203-252.
    """
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return core.disk_usage(inv)


@register(
    "du_lookup",
    f"SELECT * FROM ({DU_CORE_SQL}) WHERE address = '42'",
)
def du_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O11 GetDiskUsage: point lookup of one address."""
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return core.disk_usage_lookup(core.disk_usage(inv), "42")


@register(
    "du_multifile",
    f"""
    WITH inventory AS ({INVENTORY_SQL} UNION ALL {INVENTORY_SQL})
    SELECT split_part(key, '/', 1) AS address,
           ROUND(SUM(size), 2) AS size_bytes,
           COUNT(*) AS number_files
    FROM inventory
    WHERE len(string_split(key, '/')) >= 2
    GROUP BY address
    """,
)
def du_multifile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O12: aggregate ACROSS all manifest files in one pass.

    The reference's per-file loop overwrites prior aggregates (the §2
    last-file-wins trap, handler.go:231,252); this implements the
    documented intent (README.md:15-17) — one groupBy over the union
    of every file.  Modeled here as the same table scanned twice, i.e.
    a two-file manifest with identical contents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    inv = core.inventory_from_lineitem(li.unionByName(li))
    return core.disk_usage(inv)


