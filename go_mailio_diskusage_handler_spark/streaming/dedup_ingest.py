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

    def compact_state(self) -> dict:
        """Periodic state maintenance (the 100 TB deployment step the
        module docstring promises): fold the one-small-file-per-batch
        band and shingle indexes into few key-clustered files, so the
        per-batch probe join's scan cost stays proportional to index
        SIZE, not index AGE.  Run drained (availableNow → compact →
        restart; asserted here) — content is preserved exactly, so a
        restarted ingest continues against the compacted state with
        identical semantics (tested batch-for-batch).  The pairs
        OUTPUT is deliberately not touched: its per-batch-id
        partitioning is the replay-idempotence mechanism, and it is a
        sink, not probed state.
        """
        from go_mailio_diskusage_handler_spark.sources.compaction import (
            compact_state_dir,
        )

        if self._query.isActive:
            raise RuntimeError("drain the ingest before compacting state")
        return {
            "bands": compact_state_dir(
                self._spark,
                self._bands_dir,
                _BAND_SCHEMA,
                cluster_by=["band_idx", "band_key"],
            ),
            "shingles": compact_state_dir(
                self._spark,
                self._shingles_dir,
                _SHINGLE_SCHEMA,
                cluster_by=["shingle"],
            ),
        }

    def stop(self) -> None:
        if self._query.isActive:
            self._query.stop()


_GRAM_INDEX_SCHEMA = "g string, first_doc long"


class StreamingNoveltyIngest:
    """Continuous novelty scoring over a growing documents directory —
    the streaming twin of ``dedup.novelty_fraction_incremental``: each
    micro-batch's grams probe the PERSISTED gram index (everything
    ingested before), per-document novelty rows land in
    ``{work_dir}/novelty``, and the batch's previously-unseen grams
    are appended to the index so later batches see them.

    The index stores ``(g, first_doc)`` — each gram's smallest owner
    doc_id seen so far — and ownership is the global MIN over
    index ∪ batch.  That one design choice buys three properties:
    (a) when ingest order respects doc_id order (the fixture and
    deployment norm — ids are assigned at ingest), every batch's
    output equals the full-corpus batch operator restricted to that
    batch, so the union over batches IS ``novelty_fraction`` of the
    whole corpus (asserted stream≡batch in
    ``tests/test_streaming.py``); (b) batch replay is idempotent even
    when the crash lands BETWEEN the novelty write and the index
    append (a replayed batch re-reads an index that may already
    contain its own mins — the min is unchanged); (c) under
    out-of-order arrival, already-written outputs are not revised
    (novelty is inherently arrival-ordered) but the index still
    converges to the true corpus min, so every FUTURE batch is judged
    against it.  The index grows with the VOCABULARY, not the corpus.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs_dir: str,
        checkpoint_dir: str,
        work_dir: str,
        *,
        n: int = 8,
        schema: str = "doc_id long, text string",
        max_files_per_trigger: int | None = None,
    ) -> None:
        self._spark = spark
        self._n = n
        self._index_dir = f"{work_dir}/gram_index"
        self._novelty_dir = f"{work_dir}/novelty"
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
        from pyspark import StorageLevel

        from go_mailio_diskusage_handler_spark.operators.dedup import (
            gram_occurrences,
        )

        # three consumers (global-min, rollup, index delta):
        # materialize once.  SAME subplan as the batch novelty tier —
        # the stream≡batch equivalence depends on it.
        occ = gram_occurrences(batch_df, self._n).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # read-time min-merge: the append-only index may hold an
        # improvement CHAIN per gram — collapse it before use
        index = (
            self._read_or_empty(self._index_dir, _GRAM_INDEX_SCHEMA)
            .groupBy("g")
            .agg(F.min("first_doc").alias("first_doc"))
        )
        batch_first = occ.groupBy("g").agg(
            F.min("doc_id").alias("first_doc")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        global_first = (
            index.unionByName(batch_first)
            .groupBy("g")
            .agg(F.min("first_doc").alias("first_doc"))
        )
        novelty = (
            occ.join(global_first, "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1)
                    .otherwise(0)
                ).alias("novel_grams"),
            )
            .select(
                "doc_id",
                F.col("n_grams").cast("bigint").alias("n_grams"),
                F.col("novel_grams").cast("bigint").alias("novel_grams"),
                (
                    F.col("novel_grams").cast("double")
                    / F.col("n_grams").cast("double")
                ).alias("novel_frac"),
            )
        )
        # novelty overwrites its own batch partition (replay rewrites
        # identical rows — the global min absorbs a replayed index
        # append); the index delta appends a gram only when the batch
        # IMPROVES its min (or introduces it), so the append-only
        # index converges to the corpus min under any arrival order
        # and a replayed completed append adds nothing (its min is no
        # longer a strict improvement).  The read-time groupBy-min
        # merges improvement chains; compaction folds them physically.
        (
            novelty.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self._novelty_dir)
        )
        improving = (
            batch_first.alias("b")
            .join(index.alias("i"), "g", "left")
            .filter(
                F.col("i.first_doc").isNull()
                | (F.col("b.first_doc") < F.col("i.first_doc"))
            )
            .select("g", F.col("b.first_doc").alias("first_doc"))
            .distinct()
        )
        improving.write.mode("append").parquet(self._index_dir)
        occ.unpersist()
        batch_first.unpersist()

    def await_drained(self, timeout_sec: int = 120) -> None:
        if not self._query.awaitTermination(timeout_sec):
            self._query.stop()
            raise TimeoutError("novelty ingest did not drain under AvailableNow")

    def novelty(self) -> DataFrame:
        return self._spark.read.parquet(self._novelty_dir).select(
            "doc_id", "n_grams", "novel_grams", "novel_frac"
        )

    def compact_state(self) -> dict:
        """Periodic state maintenance: physically fold the gram
        index's improvement chains (the read-time groupBy-min the
        class docstring describes) into ONE row per gram, clustered on
        ``g``, in few AQE-sized files.  Rows SHRINK here (that is the
        point — the fold is the semantic the reads already apply), and
        the folded index is exactly the corpus min, so a restarted
        ingest judges future batches identically (tested).  Run
        drained, as with :meth:`StreamingDedupIngest.compact_state`.
        """
        from go_mailio_diskusage_handler_spark.sources.compaction import (
            compact_state_dir,
        )

        if self._query.isActive:
            raise RuntimeError("drain the ingest before compacting state")
        return {
            "gram_index": compact_state_dir(
                self._spark,
                self._index_dir,
                _GRAM_INDEX_SCHEMA,
                cluster_by=["g"],
                fold=lambda df: df.groupBy("g").agg(
                    F.min("first_doc").alias("first_doc")
                ),
            )
        }

    def stop(self) -> None:
        if self._query.isActive:
            self._query.stop()
