"""[EXT] Training-data curation: deterministic splits, mixture
rebalancing, and eval-set decontamination.

The three operations every large-scale training-data pipeline runs
between "raw corpus" and "training shards", expressed so the same
row is selected on ANY engine and at ANY scale:

* **Hash-bucket splits** — train/val/test membership must be a pure
  function of the stable document id, never of row order, partition
  layout, or an RNG seed: re-running the pipeline after adding data
  must not migrate old docs between splits (that leaks eval into
  train).  md5-nibble buckets give a uniform 16-bit hash both Spark
  and DuckDB compute bit-identically.
* **Mixture rebalancing** — cap each source's contribution with a
  hash-ranked window, so "which docs survive" is deterministic and
  the selection is a single shuffle on source (the window partition
  key), not a driver-side loop over sources.
* **Decontamination** — drop training docs sharing ≥ K word-trigram
  shingles with any eval-set doc; the join is shingle-keyed (the
  same inverted-index shape as the n-gram dedup tier), so cost
  scales with shared-shingle pairs, never |train| × |eval|.

At 100 TB: all three are one scan + ≤ 1 shuffle; the hash bucket is
also the natural shard key for writing train splits out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from go_mailio_diskusage_handler_spark.operators.dedup import shingles

_HEX = "0123456789abcdef"

# bucket ∈ [0, 65536): first 4 md5 nibbles of the stringified doc_id.
# Built from per-nibble strpos/instr lookups (not conv/strtol) because
# both engines have exactly these primitives; codegen CSEs the repeated
# md5 call.
_BUCKET_SQL = " + ".join(
    f"(instr('{_HEX}', substring(md5(cast(doc_id as string)), {k + 1}, 1)) - 1)"
    f" * {16 ** (3 - k)}"
    for k in range(4)
)

TRAIN_PCT = 90
VAL_PCT = 5  # test gets the remainder


def split_assignments(documents: DataFrame) -> DataFrame:
    """doc_id → (bucket, split): 90/5/5 train/val/test on bucket%100.

    Narrow (no shuffle, no Python): membership survives reruns,
    backfills, and repartitioning because it depends only on doc_id.
    """
    pct = F.expr(_BUCKET_SQL) % 100
    return documents.select(
        "doc_id",
        F.expr(_BUCKET_SQL).cast("long").alias("bucket"),
        F.when(pct < TRAIN_PCT, F.lit("train"))
        .when(pct < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def mixture_rebalance(documents: DataFrame, per_source_cap: int = 10) -> DataFrame:
    """Keep at most ``per_source_cap`` docs per source, chosen by hash
    rank (doc_id tie-break) — downsampling over-represented sources to
    a target mixture without an RNG.

    One shuffle (window on source).  Skewed sources are the classic
    hazard at scale — a 10⁹-doc source all in one window partition —
    so the production variant pre-filters with an approximate
    per-source quantile of the hash before the exact window; here
    sources are uniform and the direct window is the right plan.
    """
    w = Window.partitionBy("source").orderBy(
        F.expr(_BUCKET_SQL).asc(), F.col("doc_id").asc()
    )
    return (
        documents.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= per_source_cap)
        .select("doc_id", "source")
    )


def contaminated_docs(
    documents: DataFrame, eval_max_doc_id: int = 200, min_overlap: int = 3
) -> DataFrame:
    """Training docs sharing ≥ ``min_overlap`` distinct shingles with
    the eval set (doc_id < ``eval_max_doc_id`` stands in for the
    benchmark corpus).

    Inverted-index join: explode both sides to (shingle, doc), join on
    shingle, count per (train, eval) pair, keep any train doc crossing
    the threshold against ANY eval doc.  The eval side is tiny —
    Spark broadcasts it; the train side is never self-joined.
    """
    sh = shingles(documents)
    train = sh.filter(F.col("doc_id") >= eval_max_doc_id)
    ev = sh.filter(F.col("doc_id") < eval_max_doc_id).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    overlap = (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return overlap.groupBy("doc_id").agg(
        F.max("n_overlap").alias("max_overlap"),
        F.count(F.lit(1)).alias("n_eval_docs"),
    )
