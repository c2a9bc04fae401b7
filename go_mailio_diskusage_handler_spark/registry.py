"""Query registry: every implemented operator as a named (spark,
sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the single source of truth consumed by ``__spark_entry__.py``,
``bench.py``, and the tests.  Convention: each Spark query aliases
every computed column, and the oracle SQL uses the *same* aliases so
the driver's order-insensitive value hash lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .functions import scalars
from .operators import core, relational
from .sources.tables import load_table

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


# ---------------------------------------------------------------------------
# [EXT] Relational breadth (SURVEY §2.1): joins, windows, sorts/top-k,
# set ops, rollup, distinct
# ---------------------------------------------------------------------------


@register(
    "topk_addresses",
    f"""
    SELECT * FROM ({DU_CORE_SQL})
    ORDER BY size_bytes DESC, address ASC LIMIT 10
    """,
)
def topk_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k users by usage → TakeOrderedAndProject (no global sort)."""
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return relational.top_k_addresses(core.disk_usage(inv), 10)


@register(
    "window_top_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        FROM orders
    ) WHERE rank <= 3
    """,
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_orders_per_customer(load_table(spark, sf_dir, "orders"), 3)


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.running_total_per_customer(load_table(spark, sf_dir, "orders"))


@register(
    "join_revenue_by_region",
    """
    SELECT r_name,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS order_count
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.revenue_by_region(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998
    )
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1998 orders (non-empty at every fixture SF,
    so the oracle hash actually discriminates)."""
    return relational.customers_without_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        year=1998,
    )


@register(
    "setop_lapsed_customers",
    """
    SELECT o_custkey AS lapsed_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1999-01-01'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    """,
)
def setop_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.lapsed_customers(load_table(spark, sf_dir, "orders"), "1999-01-01")


@register(
    "rollup_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           COUNT(*) AS order_count
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.rollup_order_stats(load_table(spark, sf_dir, "orders"))


@register(
    "distinct_customers_per_status",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.distinct_customers_per_status(load_table(spark, sf_dir, "orders"))


# HLL sketch estimates are engine-specific → rows-only check (no oracle);
# tests/test_relational.py bounds the relative error instead.
@register("approx_distinct_customers")
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.approx_distinct_customers(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# [EXT] Scalar function families: date, math, JSON, array + event windows
# ---------------------------------------------------------------------------


@register(
    "scalar_monthly_orders",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS order_count,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY order_month
    """,
)
def scalar_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.monthly_order_stats(load_table(spark, sf_dir, "orders"))


@register(
    "scalar_math_buckets",
    """
    SELECT l_orderkey % 8 AS bucket,
           COUNT(*) AS row_count,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS discounted_revenue,
           ROUND(AVG(sqrt(l_extendedprice)), 4) AS avg_sqrt_price
    FROM lineitem GROUP BY bucket
    """,
)
def scalar_math_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.math_buckets(load_table(spark, sf_dir, "lineitem"), 8)


@register(
    "scalar_json_events",
    """
    SELECT event_type,
           COUNT(*) AS event_count,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.json_event_stats(load_table(spark, sf_dir, "events"))


@register(
    "scalar_embedding_arrays",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           label
    FROM embeddings
    """,
)
def scalar_embedding_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.embedding_array_stats(load_table(spark, sf_dir, "embeddings"))


@register(
    "events_tumbling_window",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS event_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY window_start, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.tumbling_event_windows(load_table(spark, sf_dir, "events"), 10)
