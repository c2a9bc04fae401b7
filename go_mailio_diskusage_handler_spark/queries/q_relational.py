"""Relational breadth (SURVEY §2.1): joins, windows, sorts/top-k, set ops.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core, relational
from ..sources.tables import load_table
from ._base import register
from .q_du import DU_CORE_SQL


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


# Sketch estimates are engine-specific, so each query emits a
# deterministic invariant (exact value + within-tolerance boolean) and
# the oracle recomputes the exact side with a constant-true bound.
@register(
    "approx_distinct_customers",
    """
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS within_tol
    FROM orders
    """,
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.approx_distinct_customers(load_table(spark, sf_dir, "orders"))


@register(
    "approx_order_percentiles",
    """
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99_exact,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM orders
    """,
)
def approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK quantile sketch vs exact percentiles as a hashable invariant."""
    return relational.approx_order_percentiles(load_table(spark, sf_dir, "orders"))


@register(
    "approx_top_event_types",
    """
    SELECT event_type, n_events, TRUE AS sketch_exact
    FROM (SELECT event_type, COUNT(*) AS n_events,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rk
          FROM events GROUP BY event_type)
    WHERE rk <= 5
    """,
)
def approx_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitter sketch vs the exact top-k as a
    hashable invariant (sketch exact at fixture cardinalities)."""
    return relational.approx_top_event_types(load_table(spark, sf_dir, "events"))


