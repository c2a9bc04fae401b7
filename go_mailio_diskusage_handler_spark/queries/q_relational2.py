"""Relational breadth round 2: pivot, exact percentiles, cube.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core, relational
from ..sources.tables import load_table
from ._base import register
from ..operators import sessions  # noqa: E402


# ---------------------------------------------------------------------------
# [EXT] Relational breadth round 2: pivot, exact percentiles, cube,
# inventory diff, native session windows
# ---------------------------------------------------------------------------
_INV_KEY_SQL = """CASE WHEN l_linenumber = 7 THEN CAST(l_orderkey AS VARCHAR)
                 ELSE CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR)
            END"""


@register(
    "inventory_diff",
    f"""
    WITH old_inv AS (SELECT {_INV_KEY_SQL} AS key FROM lineitem WHERE l_linenumber <= 5),
    new_inv AS (SELECT {_INV_KEY_SQL} AS key FROM lineitem WHERE l_linenumber >= 2),
    tagged AS (SELECT key, 1 AS o, 0 AS n FROM old_inv
               UNION ALL SELECT key, 0 AS o, 1 AS n FROM new_inv),
    pk AS (SELECT key, MAX(o) AS in_old, MAX(n) AS in_new FROM tagged GROUP BY key)
    SELECT key, CASE WHEN in_new = 1 THEN 'added' ELSE 'deleted' END AS change
    FROM pk WHERE in_old <> in_new
    """,
)
def inventory_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day inventory diff (added/deleted object keys) between
    two snapshots, modeled as linenumber-sliced views of lineitem."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    inv_old = core.inventory_from_lineitem(li.filter(F.col("l_linenumber") <= 5))
    inv_new = core.inventory_from_lineitem(li.filter(F.col("l_linenumber") >= 2))
    return core.inventory_diff(inv_old, inv_new)


@register(
    "pivot_status_revenue",
    """
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS "F",
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS "O",
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pivot_revenue(load_table(spark, sf_dir, "orders"))


@register(
    "percentile_order_value",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95,
           ROUND(AVG(o_totalprice), 2) AS mean_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_value_percentiles(load_table(spark, sf_dir, "orders"))


@register(
    "cube_lineitem_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS row_count,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.cube_lineitem_flags(load_table(spark, sf_dir, "lineitem"))


@register(
    "events_session_window",
    f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    m AS (SELECT user_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                           OR us - lag(us) OVER w >= {sessions.DEFAULT_GAP_MINUTES * 60 * 1_000_000}
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (SELECT user_id, us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM m)
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + {sessions.DEFAULT_GAP_MINUTES * 60 * 1_000_000} AS session_end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (gap-close rule is >=, unlike the
    lag-based sessionize's >; see operators.sessions docstring)."""
    return sessions.session_window_stats(load_table(spark, sf_dir, "events"))


