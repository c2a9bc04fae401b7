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

from pyspark.sql import DataFrame


def write_compacted(
    df: DataFrame,
    path: str,
    *,
    cluster_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as Parquet with AQE-sized, optionally clustered files."""
    out = df
    if cluster_by:
        out = out.hint("rebalance", *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        out = out.hint("rebalance")
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
