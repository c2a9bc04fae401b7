"""[EXT] Streaming near-dup ingest: the production shape of
day-over-day fuzzy dedup as a Structured-Streaming service.

``operators.dedup.incremental_minhash_pairs`` proves the batch
algebra (probe the stored band index with only the new batch).  This
module runs that algebra continuously: each micro-batch of documents
is shingled, signed, and banded; probed against the PERSISTED index
of everything ingested before it; the resulting near-dup pairs are
appended to an output table; and the batch's own index rows are
appended so later batches see them.  ``foreachBatch`` is the right
operator because the loop body is a batch join against mutable
stored state — not a watermark-evictable stream aggregation (the
index must live forever; nothing here is event-time-bounded).

Exactly-once across restarts follows the
``StreamingDiskUsageRefresher`` pattern: pairs land partitioned by
the batch id that produced them, so a replayed batch (crash between
output write and checkpoint commit) overwrites its own partition
idempotently instead of duplicating pairs.

Scale: per ingest the probe side is O(new·bands) rows; index and
shingle tables grow with the corpus but are only ever equi-joined on
band/shingle keys (uniform md5-derived — no skew).  A 100 TB
deployment would point ``work_dir`` at an object store and
periodically compact the appended index files (sources/compaction);
the per-batch logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from go_mailio_diskusage_handler_spark.operators import dedup

_SHINGLE_SCHEMA = "doc_id long, shingle string"
_BAND_SCHEMA = "doc_id long, band_idx int, band_key string"


class StreamingDedupIngest:
    """Continuous MinHash-LSH dedup over a growing documents directory.

    Emits to ``{work_dir}/pairs`` every near-dup pair whose
    LATER-ARRIVING member is in the current batch — summed over all
    batches that is exactly the full-corpus pair set (each unordered
    pair is adjudicated once, when its second member lands), asserted
    stream≡batch in ``tests/test_streaming.py``.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs_dir: str,
        checkpoint_dir: str,
        work_dir: str,
        *,
        threshold: float = 0.8,
        schema: str = "doc_id long, text string",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self._spark = spark
        self._threshold = threshold
        self._bands_dir = f"{work_dir}/bands"
        self._shingles_dir = f"{work_dir}/shingles"
        self._pairs_dir = f"{work_dir}/pairs"
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(docs_dir)
        self._query = (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        try:
            return self._spark.read.schema(schema).parquet(path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return self._spark.createDataFrame([], schema)
            raise

    def _ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sh_new = dedup.shingles(batch_df)
        from pyspark import StorageLevel

        # Three consumers (bands, candidate verify, index append):
        # materialize the batch's shingles once.
        sh_new = sh_new.persist(StorageLevel.MEMORY_AND_DISK)
        bands_new = dedup.band_rows(dedup._signatures_from_shingles(sh_new))
        bands_new = bands_new.persist(StorageLevel.MEMORY_AND_DISK)
        bands_old = self._read_or_empty(self._bands_dir, _BAND_SCHEMA)
        sh_old = self._read_or_empty(self._shingles_dir, _SHINGLE_SCHEMA)
        index_side = bands_old.unionByName(bands_new).alias("a")
        probe_side = bands_new.alias("b")
        cands = (
            index_side.join(
                probe_side,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        pairs = dedup.jaccard_for_pairs(
            cands, sh_old.unionByName(sh_new)
        ).filter(F.col("jaccard") >= self._threshold)
        # Idempotent under batch replay: each batch owns one partition
        # of the pairs table; a redelivered batch overwrites itself.
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self._pairs_dir)
        )
        bands_new.write.mode("append").parquet(self._bands_dir)
        sh_new.write.mode("append").parquet(self._shingles_dir)
        sh_new.unpersist()
        bands_new.unpersist()

    def await_drained(self, timeout_sec: int = 120) -> None:
        if not self._query.awaitTermination(timeout_sec):
            self._query.stop()
            raise TimeoutError("dedup ingest did not drain under AvailableNow")

    def pairs(self) -> DataFrame:
        return self._spark.read.parquet(self._pairs_dir).select(
            "doc_a", "doc_b", "jaccard"
        )

    def stop(self) -> None:
        if self._query.isActive:
            self._query.stop()
