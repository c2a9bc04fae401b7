"""[EXT] Small-file compaction sink.

At 100 TB the write path matters as much as the read path.  A pipeline
stage that emits millions of KB-sized files makes every downstream
scan pay per-file listing/open/footer overhead (and makes the S3
LIST itself a bottleneck); one that emits a handful of multi-GB files
kills read parallelism and retries.  The reference never faces this —
it writes nothing (its sink is an in-memory map, handler.go:252) —
but any materialized stage of this engine does.

The scale-correct tool is AQE **rebalance** (`df.hint("rebalance")`,
SPARK-35725): at runtime AQE splits oversized shuffle partitions and
coalesces undersized ones toward
``spark.sql.adaptive.advisoryPartitionSizeInBytes``, so output files
land near the target size with NO extra counting pass and no
hand-tuned ``repartition(n)`` constant that rots as data grows.
``maxRecordsPerFile`` is the belt-and-braces cap for skewed rows.

Clustering: when a ``cluster_by`` key is given, rows are range-
rebalanced and sorted within partitions on it, so Parquet row-group
min/max stats become selective for later filters on that key (poor
man's Z-order for the 1-key case).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleaved Z-order key over two non-negative int columns.

    Sorting by one column makes row-group min/max stats selective for
    that column only; interleaving the bits of two columns gives a
    space-filling-curve order where files stay locally bounded in BOTH
    dimensions, so scans filtering on either column prune row groups.
    This is the 2-key core of what lakehouse engines call Z-ordering /
    multi-dimensional clustering.

    Values must fit ``bits`` bits (map unbounded domains to a rank or
    hash bucket first); the interleave is 2·bits bitwise ops, all
    whole-stage-codegen JVM expressions.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z.bitwiseOR(abit.cast("bigint")).bitwiseOR(bbit.cast("bigint"))
    return z


def write_compacted(
    df: DataFrame,
    path: str,
    *,
    cluster_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> None:
    """Write ``df`` as Parquet with AQE-sized, optionally clustered files.

    ``zorder_by=(col_a, col_b)`` clusters on the interleaved
    :func:`zorder_key` instead of a single-column sort — row-group
    stats stay selective for filters on either column.
    """
    out = df
    if zorder_by is not None:
        zk = zorder_key(F.col(zorder_by[0]), F.col(zorder_by[1]))
        out = (
            df.withColumn("_zorder", zk)
            .hint("rebalance", "_zorder")
            .sortWithinPartitions("_zorder")
            .drop("_zorder")
        )
    elif cluster_by:
        out = out.hint("rebalance", *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        out = out.hint("rebalance")
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
