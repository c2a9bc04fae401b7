"""SQL surface: textual spark.sql over registered views (sql.py).

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import relational
from ..sources.tables import load_table
from ._base import register


# ---------------------------------------------------------------------------
# [EXT] SQL surface: textual spark.sql over registered views (sql.py)
# ---------------------------------------------------------------------------
from .. import sql as sql_surface  # noqa: E402


@register("sql_pricing_summary", sql_surface.PRICING_SUMMARY_SQL)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape via spark.sql — the oracle IS the query text
    (one ANSI string, two engines)."""
    return sql_surface.pricing_summary(spark, sf_dir)


@register("sql_shipping_priority", sql_surface.SHIPPING_PRIORITY_SQL)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via spark.sql (broadcast dims, exact-decimal
    revenue)."""
    return sql_surface.shipping_priority(spark, sf_dir)


@register("sql_order_priority", sql_surface.ORDER_PRIORITY_SQL)
def sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join
    (sql.order_priority_counts)."""
    return sql_surface.order_priority_counts(spark, sf_dir)


@register("sql_large_orders", sql_surface.LARGE_ORDERS_SQL)
def sql_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING (sql.large_orders)."""
    return sql_surface.large_orders(spark, sf_dir)


@register("sql_local_supplier_volume", sql_surface.LOCAL_SUPPLIER_VOLUME_SQL)
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape via spark.sql (sql.local_supplier_volume)."""
    return sql_surface.local_supplier_volume(spark, sf_dir)


@register("sql_correlated_above_avg", sql_surface.CORRELATED_ABOVE_AVG_SQL)
def sql_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated by Catalyst into
    agg + join (sql.correlated_above_avg)."""
    return sql_surface.correlated_above_avg(spark, sf_dir)


@register("sql_grouping_sets", sql_surface.GROUPING_SETS_SQL)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over orders — one Expand, one shuffle, four
    groupings (see sql.grouping_sets_revenue)."""
    return sql_surface.grouping_sets_revenue(spark, sf_dir)


ORDER_GAPS_SQL = """
    SELECT o_custkey,
           o_orderkey,
           COALESCE(date_diff('day', lag(o_orderdate)  OVER w, o_orderdate), -1)
               AS days_since_prev,
           COALESCE(date_diff('day', o_orderdate, lead(o_orderdate) OVER w), -1)
               AS days_until_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_order_gaps", ORDER_GAPS_SQL)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD inter-order gaps per customer (relational.order_gaps)."""
    return relational.order_gaps(load_table(spark, sf_dir, "orders"))


UNPIVOT_MEASURES_SQL = """
    WITH u AS (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(val AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_val,
           ROUND(MIN(val), 4) AS min_val,
           ROUND(MAX(val), 4) AS max_val
    FROM u GROUP BY measure
"""


@register("unpivot_lineitem_measures", UNPIVOT_MEASURES_SQL)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt + per-measure stats (relational.unpivot_lineitem_measures)."""
    return relational.unpivot_lineitem_measures(load_table(spark, sf_dir, "lineitem"))


MOVING_SPEND_SQL = """
    SELECT o_custkey,
           o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                    PARTITION BY o_custkey
                    ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS trailing_30d_spend
    FROM orders
"""


@register("window_moving_spend", MOVING_SPEND_SQL)
def window_moving_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day RANGE-frame spend per customer
    (relational.moving_monthly_spend)."""
    return relational.moving_monthly_spend(load_table(spark, sf_dir, "orders"))


#: Oracle states the same bands as relational.PRICE_BANDS — keep in sync.
RANGE_JOIN_BANDS_SQL = """
    SELECT band,
           COUNT(*) AS order_count,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    JOIN (VALUES ('low',       0.0, 100000.0),
                 ('mid',  100000.0, 250000.0),
                 ('high', 250000.0, 600000.0)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
"""


@register("range_join_price_bands", RANGE_JOIN_BANDS_SQL)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via grid bucketization — interval predicate turned
    into an equi-join (relational.price_band_revenue)."""
    return relational.price_band_revenue(load_table(spark, sf_dir, "orders"))


