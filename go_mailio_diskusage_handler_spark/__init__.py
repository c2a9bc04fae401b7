"""PySpark-native analytics engine with the query/data-processing
capabilities of ``mailio/go-mailio-diskusage-handler``.

The reference (345 LoC of Go, see ``/root/reference/handler.go``) is a
single fixed ETL pipeline: ingest AWS S3 Inventory Parquet, aggregate
object sizes per user address, serve point lookups.  This package
re-expresses that pipeline — and the large-scale LLM-data-pipeline
extensions (dedup, similarity search, multimodal plumbing, text
analysis) — as idiomatic Spark DataFrame programs designed to run on a
multi-thousand-executor cluster over ~100 TB of Parquet.

Design tenets (enforced throughout):

* Declarative DataFrame/SQL plans; Catalyst does pruning/pushdown.
* Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs
  (Arrow-batched) only where built-ins can't express the semantics.
* One shuffle per logical aggregation; broadcast for dimension joins;
  AQE enabled for runtime coalescing / skew handling.
* No ``collect()`` inside operators — only serving layers collect.
"""

__version__ = "0.1.0"
