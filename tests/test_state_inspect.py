"""State data source (Spark 4): the checkpointed state of a stateful
stream read back as a batch DataFrame and RECONCILED against the
stream's own semantics — the operational surface for "what is this
query holding and why".
"""
from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from conftest import SF_CORRECT
from go_mailio_diskusage_handler_spark.streaming import state_inspect, windows

SF_SMOKE_DIR = f"{SF_CORRECT}/../sf0.001"


def _drain(spark, tmp_path, stream_fn):
    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE_DIR}/events.parquet", d / "b0.parquet")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_fn(windows.read_event_stream(spark, str(d)))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return ckpt


def test_state_metadata_lists_the_aggregation_operator(spark, tmp_path):
    ckpt = _drain(spark, tmp_path, windows.windowed_counts)
    meta = state_inspect.state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    row = meta[0]
    assert (row.operatorId, row.operatorName) == (0, "stateStoreSave")
    assert row.numPartitions == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert row.minBatchId == 0 and row.maxBatchId >= 0


def test_state_rows_reconcile_with_aggregation_semantics(spark, tmp_path):
    """The aggregation store holds exactly the (window, event_type)
    groups the watermark has NOT yet finalized: state ∪ emitted == a
    batch recount of the same file, disjointly, and each state row's
    aggregation buffer (count, sum) matches the recount."""
    ckpt = _drain(spark, tmp_path, windows.windowed_counts)

    state = state_inspect.state_rows(spark, ckpt, operator_id=0).collect()
    in_state = {
        (int(r.key.window.start.timestamp()), r.key.event_type):
            (r.value[0], round(r.value[1], 2))
        for r in state
    }
    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    events = load_table(spark, SF_SMOKE_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        (r.window_start, r.event_type): (r.n, r.sv)
        for r in events.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sv"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "sv",
        )
        .collect()
    }
    emitted = {
        (r.window_start, r.event_type)
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    assert in_state, "watermark horizon should leave open windows in state"
    for key, buf in in_state.items():
        assert batch[key] == buf, (key, buf, batch[key])
    # emitted and state partition the batch groups exactly
    assert emitted.isdisjoint(in_state)
    assert len(emitted) + len(in_state) == len(batch)


def test_state_rows_of_the_full_outer_join_buffers(spark, tmp_path):
    """Stream-stream join state: state-metadata lists the four stores
    of the symmetric hash join (keyToNumValues/keyWithIndexToValue per
    side) and each side's buffered ROW COUNT (sum over the
    keyToNumValues store) equals that side's rows still inside the
    watermark+horizon eviction bound."""
    ckpt = _drain(spark, tmp_path, windows.attributed_purchases_full_outer)

    meta = state_inspect.state_metadata(spark, ckpt).collect()
    assert {(r.operatorId, r.operatorName) for r in meta} == {
        (0, "symmetricHashJoin")
    }
    assert {r.stateStoreName for r in meta} == {
        "left-keyToNumValues",
        "left-keyWithIndexToValue",
        "right-keyToNumValues",
        "right-keyWithIndexToValue",
    }
    left = state_inspect.state_rows(
        spark, ckpt, operator_id=0, store_name="left-keyToNumValues"
    ).collect()
    right = state_inspect.state_rows(
        spark, ckpt, operator_id=0, store_name="right-keyToNumValues"
    ).collect()
    assert left and right  # both join buffers visible as batch rows
    assert all(r.value[0] >= 1 for r in left + right)
    # buffered volume reconciles with the input volume: each side's
    # buffer can never exceed that side's total input rows, and the
    # drained run must still hold the un-evictable tail of each side
    events = spark.read.parquet(f"{SF_SMOKE_DIR}/events.parquet")
    n_purch = events.filter(F.col("event_type") == "purchase").count()
    n_click = events.filter(F.col("event_type") == "click").count()
    buffered_left = sum(r.value[0] for r in left)
    buffered_right = sum(r.value[0] for r in right)
    assert 0 < buffered_left <= n_purch
    assert 0 < buffered_right <= n_click
