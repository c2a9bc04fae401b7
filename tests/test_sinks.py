"""Write-path coverage: partitioned parquet sinks and bucketed tables.

The 100 TB claim that matters here: two tables bucketed on the same
key join with ZERO exchanges — the co-location is paid once at write
time and amortized over every subsequent join (the blueprint for the
inventory snapshot ⋈ snapshot day-over-day joins at real scale).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from go_mailio_diskusage_handler_spark import plans
from go_mailio_diskusage_handler_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-partitioned sink: a filter on the partition column must
    prune directories at planning time (PartitionFilters), not scan
    everything and filter after."""
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = plans.formatted(back)
    assert "PartitionFilters" in plan, plan
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """bucketBy co-location: joining two tables bucketed (and sorted)
    on the join key produces a SortMergeJoin with NO exchange on
    either side."""
    # (warehouse dir is a static conf — managed tables land in
    # ./spark-warehouse; both are dropped below, dir is gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders"))
    (customer.withColumnRenamed("c_custkey", "cust_key")
        .write.bucketBy(8, "cust_key").sortBy("cust_key")
        .mode("overwrite").saveAsTable("b_customer"))
    # disable broadcast so the join must pick a co-located strategy
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("cust_key"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plans.executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # the join itself must not shuffle; only the final groupBy may
        assert plans.shuffle_count(joined) <= 1, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
