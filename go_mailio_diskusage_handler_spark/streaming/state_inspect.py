"""[EXT] State data source: batch-read a streaming query's STATE STORE
from its checkpoint (Spark 4, ``spark.read.format("statestore")`` /
``"state-metadata"``) — the operational debugging surface for stateful
streams.

Why it matters at 100 TB: a production stateful query (windowed aggs,
stream-stream joins, dedup) carries state you cannot otherwise see —
"why is this window still open", "how big is the join buffer", "which
keys dominate state" are all questions about the CHECKPOINT, not the
output.  The state source answers them with plain batch SQL over the
RocksDB/HDFS state files, no query restart, no custom tooling: state
files are read partition-parallel like any other source, so state
inspection scales with the cluster, not the driver.

Both readers are thin: the value is pinning the surface (options,
shapes, and the fact that the store outlives the query) with tests
that reconcile state contents against the stream's own output — see
``tests/test_state_inspect.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """One row per stateful OPERATOR in the checkpoint: operator
    id/name, partition count, and the min/max batch ids the state
    covers — the entry point that tells you which operator ids exist
    before reading their stores."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """The state rows of one operator as (key STRUCT, value STRUCT,
    partition_id): the aggregation buffer of a windowed groupBy, one
    side's join buffer of a stream-stream join (pick via
    ``store_name``), etc.  ``batch_id`` time-travels to an earlier
    micro-batch's state if that snapshot is still retained."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)
