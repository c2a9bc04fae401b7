"""[EXT] Text-format sources: schema-enforced CSV and JSON-lines reads.

The reference reads only Parquet (handler.go:170-198) plus one tiny
JSON manifest (handler.go:136-142).  AWS S3 Inventory can also deliver
CSV (and ORC), so a drop-in engine needs text sources that behave at
100 TB:

* **Explicit schema, never inference.**  Schema inference is a full
  extra pass over the data before the real scan — at 100 TB that
  doubles the job.  Every reader here takes a DDL schema string.
* **PERMISSIVE + quarantine, never fatal.**  A malformed row lands in
  ``_corrupt_record`` instead of failing the task.  The reference
  ``log.Fatalf``s on a bad file (handler.go:176,186,192) — SURVEY §7
  flags that posture as the thing to replace; ``split_quarantine``
  gives the job both the clean rows and an auditable reject stream.
* **Splittability caveat (operational):** gzip'd CSV/JSON is NOT
  splittable — one file becomes one task regardless of size.  Keep
  text delivery files bounded (≤ a few hundred MB) or re-land as
  Parquet before heavy processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def _schema_with_quarantine(ddl_schema: str) -> StructType:
    return StructType.fromDDL(ddl_schema).add(CORRUPT_COL, StringType())


def read_csv_strict(
    spark: SparkSession, path: str, ddl_schema: str, header: bool = True
) -> DataFrame:
    """CSV scan with explicit schema and corrupt-row quarantine.

    Rows whose token count or column types don't match the schema get
    NULL data columns and the raw line in ``_corrupt_record``; clean
    rows carry a NULL there.  The scan stays a single pass (no
    inference) and stays vectorized for the clean path.
    """
    return (
        spark.read.schema(_schema_with_quarantine(ddl_schema))
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl_strict(spark: SparkSession, path: str, ddl_schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema and corrupt-row quarantine
    (same contract as :func:`read_csv_strict`)."""
    return (
        spark.read.schema(_schema_with_quarantine(ddl_schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_marker_col, rejected_rows) — the per-file
    skip-and-continue intent of the reference's executeJob
    (handler.go:86-89), at row granularity.

    The parsed scan is cached first: Spark disallows queries whose
    only referenced file column is the internal corrupt-record column
    (SPARK-21610), and the cache also makes the two derived streams
    share one parse pass.  At real scale, land the parsed frame to a
    staging table partitioned by ``is_clean`` instead of caching —
    same single-pass contract, no executor-memory residency.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejected = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, rejected


def read_xml_strict(
    spark: SparkSession, path: str, ddl_schema: str, row_tag: str = "row"
) -> DataFrame:
    """XML scan (Spark 4's built-in spark-xml) with explicit schema and
    corrupt-row quarantine (same contract as :func:`read_csv_strict`).

    The XML reader is record-oriented on ``rowTag``, so a malformed
    ELEMENT quarantines as one row while the rest of the file parses —
    the same row-granular degrade the CSV/JSONL readers give.  The
    splittability caveat in the module docstring applies doubly: XML
    is also quote/nesting-sensitive, so keep delivery files bounded or
    re-land as Parquet before heavy processing.
    """
    return (
        spark.read.schema(_schema_with_quarantine(ddl_schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .format("xml")
        .load(path)
    )
