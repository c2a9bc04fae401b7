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


def compact_state_dir(
    spark,
    path: str,
    schema: str,
    *,
    cluster_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    fold=None,
) -> dict:
    """Offline compaction of an APPEND-ONLY streaming-state directory
    (the band/shingle/gram indexes the ingest services grow one small
    file per micro-batch): read the accumulated files, optionally
    ``fold`` them semantically (e.g. collapse a gram index's
    improvement chains with a groupBy-min — the physical form of the
    read-time merge), and rewrite as few AQE-sized, key-clustered
    files via :func:`write_compacted`.

    MUST run while no ingest query is appending to ``path`` (the
    deployment pattern: drain with ``availableNow``, compact, restart
    — the same maintenance window a checkpoint upgrade needs).  The
    rewrite is write-new-then-swap: the compacted generation lands in
    a sibling tmp dir, fully materialized BEFORE the live dir moves
    aside, so a crash at any point leaves a complete generation on
    disk (``path`` or ``path + '.old'``); an object-store deployment
    would version the prefix and flip a manifest pointer instead —
    the two-phase pattern the inventory writer commits with
    (``inventory_source.py``).

    ``partition_by`` preserves a physical partitioning the consumer's
    semantics depend on — e.g. the ingest sinks' per-``batch_id``
    layout, where a replayed micro-batch dynamically overwrites ITS
    OWN partition directory: compaction that merged across batch ids
    would turn that replay into duplication, while compaction that
    keeps the partition column rewrites each directory to few files
    and leaves the overwrite unit intact.

    Returns ``{files_before, files_after, rows_before, rows_after}``
    (rows shrink only under ``fold``; plain compaction preserves them
    exactly — asserted by the tests).
    """
    import os
    import shutil

    def _parquet_files(d: str) -> int:
        return sum(
            1
            for root, _, names in os.walk(d)
            for n in names
            if n.endswith(".parquet")
        )

    if not os.path.isdir(path):
        return {
            "files_before": 0,
            "files_after": 0,
            "rows_before": 0,
            "rows_after": 0,
        }
    files_before = _parquet_files(path)
    df = spark.read.schema(schema).parquet(path)
    rows_before = df.count()
    out = fold(df) if fold is not None else df
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    write_compacted(out, tmp, cluster_by=cluster_by, partition_by=partition_by)
    rows_after = spark.read.schema(schema).parquet(tmp).count()
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": files_before,
        "files_after": _parquet_files(path),
        "rows_before": rows_before,
        "rows_after": rows_after,
    }


def plan_compaction_bins(
    events: DataFrame, *, target_bytes: int = 4096, row_overhead: int = 48
) -> DataFrame:
    """[EXT] Compaction *planner*: bin-pack per-partition small files
    into target-size merge groups.

    The read-path complement of :func:`write_compacted`.  A streaming
    ingest that commits one file per (event_type, hour) micro-batch —
    the classic Structured-Streaming sink layout — accretes thousands
    of KB-sized files; before a rewrite, the compactor must decide
    WHICH files merge into WHICH output file.  The scale-correct plan
    keeps neighbouring hours together (preserves time-locality so the
    compacted file's min/max ts stats stay selective) and packs
    greedily in hour order until ``target_bytes`` is reached: with
    files ordered by hour, ``bin = floor(bytes_before_file / target)``
    — a running-sum window per event_type, no driver loop, no
    all-pairs.  One shuffle on event_type for the window plus the
    partial-aggregated file listing; at 100 TB the input here is the
    file *inventory* (one row per file), not the data, so the whole
    plan is metadata-sized.

    File bytes are synthesized from the events themselves
    (``length(props) + row_overhead`` per row) since the local
    fixtures are single parquet files; on a real lake the same plan
    runs directly over the S3 inventory / listing table.
    """
    from pyspark.sql import Window

    files = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.sum(F.coalesce(F.length("props"), F.lit(0)) + F.lit(row_overhead)).alias(
            "file_bytes"
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    binned = files.withColumn(
        "bin_id",
        F.floor(
            (F.sum("file_bytes").over(w) - F.col("file_bytes"))
            / F.lit(float(target_bytes))
        ).cast("bigint"),
    )
    return binned.groupBy("event_type", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_bytes").alias("bin_bytes"),
        F.min("hour_ts").alias("first_hour"),
        F.max("hour_ts").alias("last_hour"),
    )


def zone_map_skipping_audit(
    orders: DataFrame,
    *,
    pred_lo: str = "1997-03-01",
    pred_hi: str = "1997-04-01",
    key_shard_rows: int = 256,
    hash_buckets: int = 64,
) -> DataFrame:
    """[EXT] Zone-map (file min/max stats) skipping audit across
    candidate physical layouts.

    Data skipping is THE 100 TB lever: a scan that consults per-file
    min/max stats reads only files whose [min, max] intersects the
    predicate.  How much skips is decided at *write* time by the
    layout, so before committing to one, audit candidates against the
    real query predicate.  Three layouts of `orders` vs a one-month
    ``o_orderdate`` window:

    * ``date_partitioned`` — shard = calendar month: the predicate
      column is the layout key, ~all shards skip;
    * ``key_clustered`` — shard = o_orderkey range: orderkey is
      uncorrelated with date here, so zone maps are wide and nothing
      skips (the honest negative result the audit exists to surface);
    * ``hash_bucketed`` — shard = multiplicative hash of the key:
      every shard spans the full date range, zero skipping.

    One scan: the three shard ids are exploded as (layout, shard)
    pairs, then a single hash-agg builds every zone map (min/max date
    per shard) and a second counts scanned-vs-skipped per layout —
    both metadata-sized after the first partial agg.  The hash uses
    explicit multiplicative arithmetic (not ``F.hash``) so the oracle
    computes the identical bucket.
    """
    d = F.col("o_orderdate")
    pairs = F.array(
        F.struct(
            F.lit("date_partitioned").alias("layout"),
            (F.year(d) * 12 + F.month(d)).cast("bigint").alias("shard"),
        ),
        F.struct(
            F.lit("key_clustered").alias("layout"),
            F.floor(F.col("o_orderkey") / key_shard_rows).cast("bigint").alias("shard"),
        ),
        F.struct(
            F.lit("hash_bucketed").alias("layout"),
            ((F.col("o_orderkey") * F.lit(2654435761)) % hash_buckets)
            .cast("bigint")
            .alias("shard"),
        ),
    )
    zone = (
        orders.select(F.explode(pairs).alias("ls"), d.alias("d"))
        .groupBy(F.col("ls.layout").alias("layout"), F.col("ls.shard").alias("shard"))
        .agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    )
    scanned = F.when(
        (F.col("dmax") >= F.lit(pred_lo).cast("timestamp"))
        & (F.col("dmin") < F.lit(pred_hi).cast("timestamp")),
        1,
    ).otherwise(0)
    return zone.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum(scanned).cast("bigint").alias("n_scanned"),
    )


#: Partition rewrite threshold: delete fraction above which rewriting
#: the partition's files beats carrying a deletion vector.
DELETE_REWRITE_FRAC = 0.2


def plan_delete_vectors(events: DataFrame, delete_users: DataFrame) -> DataFrame:
    """Row-deletion planning for a GDPR-style user purge: per
    (event_type, day) partition, how many rows the delete-list hits
    and whether to REWRITE the partition, attach a DELETION VECTOR,
    or SKIP it untouched.

    This is the modern-lakehouse delete decision (public Delta
    Lake/Iceberg merge-on-read design): small hit fractions are
    cheaper as position-delete bitmaps applied at read time; heavy
    hits amortize better as a copy-on-write rewrite; untouched
    partitions must not be rewritten at all (that turns a targeted
    purge into a full-table rewrite).

    Distributed shape: the delete-list is dimension-sized (a legal
    request queue, thousands of users — never fact-scale), so the
    mark join BROADCASTS it; the per-partition tally is one hash
    aggregate with map-side combine.  One scan, one shuffle,
    decision rows bounded by partition count.
    """
    # A purge queue can list the same user twice (two requests); a
    # non-distinct left join would then DUPLICATE that user's event
    # rows and corrupt every per-partition tally.
    deletes = delete_users.select("user_id").distinct()
    marked = events.join(
        F.broadcast(deletes.withColumn("is_del", F.lit(1))),
        "user_id",
        "left",
    )
    frac = F.col("n_deleted") / F.col("n_rows")
    # day rendered as 'yyyy-MM-dd' string (repo-wide cross-engine
    # date-key convention — see events_dau_wau).
    return (
        marked.groupBy(
            "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce(F.col("is_del"), F.lit(0))).alias("n_deleted"),
        )
        .select(
            "event_type",
            "day",
            "n_rows",
            "n_deleted",
            F.round(frac, 4).alias("delete_frac"),
            F.when(F.col("n_deleted") == 0, F.lit("skip"))
            .when(frac > DELETE_REWRITE_FRAC, F.lit("rewrite"))
            .otherwise(F.lit("deletion_vector"))
            .alias("action"),
        )
    )
