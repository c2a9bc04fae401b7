"""[EXT] Binned point-in-interval join — the reusable operator behind
``events_interval_join``.

Open-source Spark has no native strategy for a pure range join (the
``RANGE_JOIN`` bin hint is a Databricks extension): a join whose only
condition is ``point ∈ [start, end)`` plans as
BroadcastNestedLoopJoin, O(|intervals|·|points|) comparisons.  The
standard rewrite is BINNING — the same idea the Databricks hint
implements, built manually from public primitives:

* every interval is exploded to the fixed-width time bins it overlaps
  (``ceil(len/width) + 1`` rows per interval);
* every point carries its single bin;
* the join is HASH equality on the bin, with the exact
  ``[start, end)`` predicate evaluated inside the join.

Each point lives in exactly ONE bin, so every matching
(interval, point) pair is produced exactly once — no post-join dedup,
and the rewrite is EXACT (equal to the theta join row-for-row, which
is what the registry oracle checks).

Bin-width choice is the one tuning knob and it only affects COST,
never results (pinned by test): replication is
O(interval_len / width) rows per interval, while a too-wide bin makes
each hash bucket carry points that mostly fail the range predicate.
Set it near the median interval length — hour bins for hour-scale
windows, day bins for day-scale.  At 100 TB the points side shuffles
by bin; calendar skew (one hot day) is visible to AQE's skew split
because the bin IS the shuffle key, or salt the bin further by
hashing the point timestamp's sub-bin remainder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: seconds per supported bin width
BIN_WIDTHS = {"day": 86400, "hour": 3600, "minute": 60}


def _bin_of(ts: Column, width_sec: int) -> Column:
    """The bin index of one instant: epoch seconds floor-divided by
    the width.  floor() (not integer cast) so pre-1970 instants land
    in the right bin too."""
    return F.floor(F.unix_timestamp(ts) / F.lit(width_sec)).cast("long")


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    *,
    start: str = "s",
    end: str = "e",
    point_ts: str = "ts",
    bin_width: str = "day",
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them —
    ``points[point_ts] ∈ [intervals[start], intervals[end])`` — as a
    binned hash equi-join.  Returns the joined frame carrying every
    column of both inputs (the caller aggregates); column names must
    not collide apart from the bin key the operator adds and drops.
    """
    if bin_width not in BIN_WIDTHS:
        raise ValueError(
            f"bin_width must be one of {sorted(BIN_WIDTHS)}, got {bin_width!r}"
        )
    width = BIN_WIDTHS[bin_width]
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(start), width),
                # end is EXCLUSIVE, but a partial trailing bin still
                # holds matches; the range predicate below trims it
                _bin_of(F.col(end), width),
            )
        ),
    )
    pt = points.withColumn("__bin", _bin_of(F.col(point_ts), width))
    return (
        iv.join(pt, on="__bin", how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
        )
        .drop("__bin")
    )
