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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

INVENTORY_SCHEMA = "key string, size long"


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


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
            _FilePartition(os.path.join(base, entry["key"]))
            for entry in manifest.get("files", [])
        ]

    def read(self, partition: _FilePartition):
        """Executor-side: read ONE listed Parquet file, pruned to the
        declared columns (reference O4/O5's key+size extraction,
        handler.go:203-221), yielding Arrow batches."""
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=["key", "size"])
        yield from table.to_batches()
