"""Scalar function families: date, math, JSON, array + event windows.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import scalars
from ..sources.tables import load_table
from ._base import register


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
    "scalar_map_props",
    """
    WITH kv AS (
        SELECT event_type,
               unnest(json_keys(props)) AS prop_key,
               props
        FROM events
    )
    SELECT event_type, prop_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT))
                AS BIGINT) AS sum_value
    FROM kv GROUP BY event_type, prop_key
    """,
)
def scalar_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType via from_json + explode (scalars.map_event_props)."""
    return scalars.map_event_props(load_table(spark, sf_dir, "events"))


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


@register(
    "events_window_users",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '60 minutes', ts)) AS BIGINT)
               AS window_start,
           COUNT(DISTINCT user_id) AS distinct_users,
           TRUE AS sketch_ok
    FROM events GROUP BY window_start
    """,
)
def events_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event-time window: exact + HLL sketch
    invariant in one grouped aggregate (scalars.windowed_distinct_users
    — the streaming-feasible form of the metric)."""
    return scalars.windowed_distinct_users(load_table(spark, sf_dir, "events"), 60)


@register(
    "events_bitmap_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users
    FROM events WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
)
def events_bitmap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct via two-level bitmap aggregation
    (scalars.bitmap_distinct_users) — hash-matches COUNT(DISTINCT)
    by construction, no tolerance band."""
    return scalars.bitmap_distinct_users(load_table(spark, sf_dir, "events"))


@register(
    "scalar_variant_props",
    """
    WITH k AS (SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k
               FROM events)
    SELECT k % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM k GROUP BY k_bucket
    """,
)
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT path: parse_json once, typed variant_get
    extraction (scalars.variant_prop_stats)."""
    return scalars.variant_prop_stats(load_table(spark, sf_dir, "events"))


@register(
    "events_sketch_merge",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merge_ok
    FROM events WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
)
def events_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level DataSketches rollup: per-day hll_sketch_agg partials
    → hll_union_agg per type, estimate asserted against the exact
    count (scalars.mergeable_user_sketches — the re-aggregatable
    sketch pattern)."""
    return scalars.mergeable_user_sketches(load_table(spark, sf_dir, "events"))


