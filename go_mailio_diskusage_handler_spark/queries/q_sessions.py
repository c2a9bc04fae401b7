"""Multimodal plumbing + sessionization + sliding windows.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import scalars
from ..sources.tables import load_table
from ._base import register


# ---------------------------------------------------------------------------
# [EXT] Multimodal plumbing + sessionization + sliding windows
# ---------------------------------------------------------------------------
from ..operators import multimodal, sessions  # noqa: E402


@register(
    "media_metadata",
    """
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.media_metadata(load_table(spark, sf_dir, "documents"))


@register(
    "media_decode_features",
    """
    WITH m AS (SELECT doc_id,
                      ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
                          AS media_type,
                      octet_length(encode(text)) AS nb
               FROM documents)
    SELECT doc_id, media_type,
           CAST(nb AS INTEGER) AS n_bytes,
           CAST(16 + nb % 625 AS INTEGER) AS width,
           CAST(16 + (nb * 7) % 475 AS INTEGER) AS height,
           CAST(1 + nb % 24 AS INTEGER) AS n_frames
    FROM m
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing with the deterministic fake kernel —
    the Python/Arrow path itself is oracle-checked."""
    return multimodal.decode_features(load_table(spark, sf_dir, "documents"))


@register(
    "media_frame_sample",
    """
    WITH m AS (SELECT doc_id,
                      ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
                          AS media_type,
                      octet_length(encode(text)) AS nb
               FROM documents),
    v AS (SELECT doc_id, 1 + nb % 24 AS n_frames FROM m WHERE media_type = 'video')
    SELECT doc_id, CAST(u.f AS INTEGER) AS frame_idx
    FROM v, UNNEST(range(0, n_frames, 8)) AS u(f)
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample(load_table(spark, sf_dir, "documents"), 8)


@register(
    "events_sessionize",
    f"""
    WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
    m AS (SELECT user_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                           OR us - lag(us) OVER w > {sessions.DEFAULT_GAP_MINUTES * 60 * 1_000_000}
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM m)
    SELECT user_id,
           MIN(us) AS session_start_us,
           COUNT(*) AS n_events,
           MAX(us) - MIN(us) AS duration_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessions.sessionize(load_table(spark, sf_dir, "events"))


@register(
    "events_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    v AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
          WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
          GROUP BY e.user_id)
    SELECT u.user_id,
           v.t1 AS step_1_us, c.t2 AS step_2_us, p.t3 AS step_3_us,
           CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                     WHEN c.t2 IS NOT NULL THEN 2
                     WHEN v.t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS steps_completed
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user in ONE shuffle via
    a sorted per-user fold (sessions.funnel); the oracle states the
    same semantics as three chained min-aggregate joins."""
    return sessions.funnel(load_table(spark, sf_dir, "events"))


@register(
    "events_sliding_window",
    """
    WITH ex AS (
        SELECT event_type, ts,
               time_bucket(INTERVAL '5 minutes', ts) - (u.o * INTERVAL '5 minutes')
                   AS wstart
        FROM events, UNNEST([0, 1]) AS u(o)
    )
    SELECT CAST(epoch(wstart) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS event_count
    FROM ex
    WHERE ts >= wstart AND ts < wstart + INTERVAL '10 minutes'
    GROUP BY window_start, event_type
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scalars.sliding_event_windows(load_table(spark, sf_dir, "events"), 10, 5)


