"""[EXT] Streaming ANN index maintenance: keep an IVF inverted index
fresh as new vectors arrive — the third leg of the continuous-ingest
triad beside ``StreamingDedupIngest`` (pairs) and
``StreamingNoveltyIngest`` (gram ownership).

``operators.similarity.ivf_assignments`` proves the batch algebra
(argmax-cosine coarse quantization against a broadcast codebook).
This module runs it continuously: the codebook is FROZEN at ingest
start — trained/derived from a seed corpus exactly as a production
IVF trains k-means offline — and each micro-batch of vectors is
assigned to its inverted list and appended to the index table.  The
accumulated index is row-for-row identical to running the batch
operator over the full corpus (asserted in tests), which is what
keeps ANN probes correct mid-ingest: a probe reads the index table
and touches only its n_probe lists, never a stale or partial
assignment.

``foreachBatch`` again, not a watermarked aggregation: the loop body
is a stateless map against broadcast state (the codebook literal) —
nothing event-time-bounded, and the index must live forever.

Exactly-once across restarts follows the established pattern: index
rows land partitioned by the batch id that produced them, so a
replayed batch (crash between output write and checkpoint commit)
overwrites its own partition idempotently.

Scale: per batch the work is one narrow scan of the new vectors ×
one codebook lambda — embarrassingly parallel, zero shuffles; the
index table grows corpus-linear but carries only (vec_id, list_id)
longs.  At 100 TB the index doubles as the PARTITIONING spec: write
the corpus bucketed/partitioned by ``list_id`` and probes touch
~n_probe/n_lists of the files (SCALE.md §11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from go_mailio_diskusage_handler_spark.operators import similarity

_INDEX_SCHEMA = "vec_id long, list_id int"


class StreamingAnnIndexIngest:
    """Continuous IVF assignment over a growing vectors directory.

    ``seed`` supplies the codebook corpus (the vectors the coarse
    quantizer was trained on); it is resolved to a literal ONCE, so
    every batch — and any restart — assigns against the identical
    codebook, the invariant that makes the accumulated index equal
    the batch operator's output.
    """

    def __init__(
        self,
        spark: SparkSession,
        vecs_dir: str,
        checkpoint_dir: str,
        work_dir: str,
        *,
        seed: DataFrame,
        schema: str = "vec_id long, embedding array<float>, label int",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self._spark = spark
        self._index_dir = f"{work_dir}/ivf_index"
        # Freeze the codebook NOW (driver-side literal, KBs): batches
        # must not re-derive it from their own contents or assignments
        # would drift across the ingest timeline.
        self._codebook = similarity._codebook_lit(seed)
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(vecs_dir)
        self._query = (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def _ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        nrm = similarity.l2_norm(F.col("embedding"))
        assigned = batch_df.select(
            "vec_id",
            similarity._best_lists(
                F.col("embedding"), nrm, self._codebook, 1
            )[0].alias("list_id"),
        )
        # Idempotent under batch replay: each batch owns one partition
        # of the index; a redelivered batch overwrites itself.
        (
            assigned.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self._index_dir)
        )

    def await_drained(self, timeout_sec: int = 120) -> None:
        if not self._query.awaitTermination(timeout_sec):
            self._query.stop()
            raise TimeoutError("ANN ingest did not drain under AvailableNow")

    def compact_state(self) -> dict:
        """Periodic index maintenance: rewrite the accumulated IVF
        index to few ``list_id``-clustered files PER ``batch_id``
        PARTITION — the partition column is preserved because a
        replayed micro-batch dynamically overwrites its own
        ``batch_id=N`` directory (the replay-idempotence mechanism);
        merging across batch ids would turn that overwrite into
        duplication, rewriting within it keeps the unit intact while
        list_id clustering makes the serving probe's row-group stats
        selective.  Run drained, like the dedup/novelty twins."""
        from go_mailio_diskusage_handler_spark.sources.compaction import (
            compact_state_dir,
        )

        if self._query.isActive:
            raise RuntimeError("drain the ingest before compacting state")
        return {
            "ivf_index": compact_state_dir(
                self._spark,
                self._index_dir,
                _INDEX_SCHEMA + ", batch_id bigint",
                # batch_id leads the clustering so each partition dir
                # is written by few tasks (rebalance co-locates a
                # batch's rows before the partitioned write)
                cluster_by=["batch_id", "list_id"],
                partition_by=["batch_id"],
            )
        }

    def assignments(self) -> DataFrame:
        try:
            return self._spark.read.parquet(self._index_dir).select(
                "vec_id", "list_id"
            )
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return self._spark.createDataFrame([], _INDEX_SCHEMA)
            raise

    def stop(self) -> None:
        if self._query.isActive:
            self._query.stop()
