"""Round-10 regression tests: the full-outer stream-stream interval
join (the last cell of the join matrix next to round 9's left-outer),
its batch registry twin, and the cheapened similarity-oracle helpers.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_CORRECT, compare_with_oracle  # noqa: F401


# ---------------------------------------------------------------------------
# Round-10 addition: full-outer interval join (batch twin parity)
# ---------------------------------------------------------------------------


def test_oracle_parity_attribution_full_outer(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark,
        ddb,
        "events_attribution_full_outer",
        registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_full_outer_join_covers_both_sides(spark):
    """Every purchase and every click appears at least once; matched
    rows agree with the inner join; unmatched rows are null-padded on
    exactly one side and carry the coalesced user_id."""
    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    events = load_table(spark, f"{SF_CORRECT}/../sf0.001", "events")
    rows = windows.attributed_purchases_full_outer(events).collect()
    inner = {
        (r.purchase_id, r.click_id)
        for r in windows.attributed_purchases(events).collect()
    }
    purchases = {
        r.event_id
        for r in events.filter(F.col("event_type") == "purchase").collect()
    }
    clicks = {
        r.event_id
        for r in events.filter(F.col("event_type") == "click").collect()
    }
    assert {(r.purchase_id, r.click_id) for r in rows if r.click_id is not None
            and r.purchase_id is not None} == inner
    assert {r.purchase_id for r in rows if r.purchase_id is not None} == purchases
    assert {r.click_id for r in rows if r.click_id is not None} == clicks
    for r in rows:
        assert r.user_id is not None  # coalesced key survives both directions
        if r.purchase_id is None:
            assert r.click_id is not None and r.purchase_ts is None
        if r.click_id is None:
            assert r.purchase_id is not None and r.click_ts is None


def test_full_outer_stream_join_emits_unmatched_after_watermark(spark, tmp_path):
    """FULL OUTER stream-stream interval join: matched rows emit
    promptly; null-padded rows of BOTH directions (organic purchases
    AND never-converted clicks) emit at state EVICTION, so a drained
    run withholds the final watermark+horizon on both sides — and a
    later file advancing the watermark flushes them, after which
    stream == batch exactly."""
    import shutil

    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_CORRECT}/../sf0.001/events.parquet", d / "b0.parquet")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    def run_once():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and the second phase MUST resume the first
        # phase's state to flush its held-back outer rows
        stream = windows.read_event_stream(spark, str(d))
        q = (
            windows.attributed_purchases_full_outer(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return {
            (r.purchase_id, r.click_id)
            for r in spark.read.parquet(out).collect()
        }

    batch_events = load_table(
        spark, f"{SF_CORRECT}/../sf0.001", "events"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (r.purchase_id, r.click_id)
        for r in windows.attributed_purchases_full_outer(batch_events).collect()
    }

    got1 = run_once()
    held_back = want - got1
    assert got1 <= want  # nothing emits that batch would not produce
    assert held_back, "expected tail-horizon rows to be withheld"
    # only null-padded rows wait, and BOTH outer directions are present
    assert all(p is None or c is None for p, c in held_back)
    assert any(c is None for _, c in held_back), "no held-back purchase"
    assert any(p is None for p, _ in held_back), "no held-back click"

    # a later file advances the watermark past the held-back windows.
    # It must carry BOTH event types: the query watermark is the MIN
    # over the two withWatermark nodes and each advances only on rows
    # reaching its branch (same shape as the left-outer test).  The
    # future pair uses distinct users so it cannot match anything.
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    future = pd.DataFrame(
        {
            "event_id": [10_000_000, 10_000_001],
            "ts": [pd.Timestamp(max_ts) + pd.Timedelta(hours=6)] * 2,
            "user_id": [999_998, 999_999],  # distinct users: no match
            "event_type": ["click", "purchase"],
            "value": [0.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    t = pa.Table.from_pandas(future)
    pq.write_table(
        t.set_column(1, "ts", t["ts"].cast(pa.timestamp("us"))),
        d / "b1.parquet",
    )
    got2 = run_once()
    # every original null-padded row flushed; the future click and
    # purchase are the NEW held-back tail (their join windows are
    # still open), so the sink now equals batch over the original file
    assert got2 == want


# ---------------------------------------------------------------------------
# Round-10 addition: cogroup(...).applyInArrow tier
# ---------------------------------------------------------------------------


def test_oracle_parity_cogroup_arrow_stats(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark, ddb, "udf_cogroup_arrow_stats", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_cogroup_arrow_covers_one_sided_users(spark):
    """Users present on only ONE cogroup side still emit a row with
    the other side zeroed, and a zero-click user has a NULL ratio."""
    from go_mailio_diskusage_handler_spark.functions import udfs

    events = spark.createDataFrame(
        [
            (1, 10, "click", 2.0),
            (2, 10, "purchase", 6.0),
            (3, 20, "click", 4.0),   # clicks only
            (4, 30, "purchase", 8.0),  # purchases only -> NULL ratio
            (5, None, "click", 1.0),  # null user dropped
        ],
        "event_id long, user_id long, event_type string, value double",
    )
    rows = {r.user_id: r for r in
            udfs.user_value_stats_cogrouped_arrow(events).collect()}
    assert set(rows) == {10, 20, 30}
    assert (rows[10].n_clicks, rows[10].n_purchases,
            rows[10].conv_ratio) == (1, 1, 3.0)
    assert (rows[20].n_clicks, rows[20].purchase_value,
            rows[20].conv_ratio) == (1, 0.0, 0.0)
    assert rows[30].n_clicks == 0 and rows[30].conv_ratio is None


# ---------------------------------------------------------------------------
# Round-10 addition: the remaining stream-join-matrix cells
# (leftSemi + rightOuter; Spark supports exactly these five types
# for stream-stream joins)
# ---------------------------------------------------------------------------


def test_oracle_parity_attribution_semi(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark, ddb, "events_attribution_semi", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_semi_join_is_deduplicated_inner_left_side(spark):
    """leftSemi == DISTINCT purchase side of the inner join — each
    attributed purchase exactly once, never-attributed ones absent."""
    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    events = load_table(spark, f"{SF_CORRECT}/../sf0.001", "events")
    semi = [r.purchase_id for r in
            windows.attributed_purchases_semi(events).collect()]
    inner = {r.purchase_id for r in
             windows.attributed_purchases(events).collect()}
    assert sorted(semi) == sorted(set(semi))  # no fan-out duplicates
    assert set(semi) == inner


def test_right_outer_is_full_outer_minus_organic_purchases(spark):
    """rightOuter == fullOuter restricted to rows with a click side —
    the click-funnel mirror of the left join."""
    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    events = load_table(spark, f"{SF_CORRECT}/../sf0.001", "events")
    right = {(r.purchase_id, r.click_id, r.user_id) for r in
             windows.attributed_clicks_right_outer(events).collect()}
    full = {(r.purchase_id, r.click_id, r.user_id) for r in
            windows.attributed_purchases_full_outer(events).collect()}
    assert right == {t for t in full if t[1] is not None}
    assert any(p is None for p, _, _ in right)  # unconverted clicks present
    assert all(u is not None for _, _, u in right)


def test_semi_stream_join_matches_batch_promptly(spark, tmp_path):
    """leftSemi stream-stream join: matched purchases emit PROMPTLY
    (no eviction wait), so a single drained run over one file already
    equals batch — the cheapest cell of the matrix."""
    import shutil

    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_CORRECT}/../sf0.001/events.parquet", d / "b0.parquet")
    stream = windows.read_event_stream(spark, str(d))
    q = (
        windows.attributed_purchases_semi(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {r.purchase_id
           for r in spark.read.parquet(str(tmp_path / "sink")).collect()}
    batch_events = load_table(
        spark, f"{SF_CORRECT}/../sf0.001", "events"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {r.purchase_id for r in
            windows.attributed_purchases_semi(batch_events).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-10 addition: streaming observed metrics + query listener
# ---------------------------------------------------------------------------


def test_streaming_observed_metrics_and_listener(spark, tmp_path):
    """observe() on a stream: per-micro-batch metrics surface in
    StreamingQueryProgress.observedMetrics AND through a registered
    StreamingQueryListener; summed across micro-batches they equal the
    batch aggregate over the same file — monitoring with zero extra
    passes over the input."""
    import shutil

    from pyspark.sql.streaming import StreamingQueryListener

    from go_mailio_diskusage_handler_spark.sources.tables import load_table
    from go_mailio_diskusage_handler_spark.streaming import windows

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_CORRECT}/../sf0.001/events.parquet", d / "b0.parquet")

    captured = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            om = event.progress.observedMetrics
            if "ingest" in om:
                captured.append(om["ingest"].asDict())

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        stream = windows.with_ingest_observation(
            windows.read_event_stream(spark, str(d))
        )
        q = (
            windows.windowed_counts(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # lastProgress carries the final batch's observed metrics too
        last = q.lastProgress
        q.stop()
        import time

        deadline = time.time() + 30  # listener events deliver async
        while not captured and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    events = load_table(spark, f"{SF_CORRECT}/../sf0.001", "events")
    want = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nu"),
        F.round(F.sum("value"), 2).alias("vs"),
    ).collect()[0]
    # sum() of an all-NULL column observes as None in that micro-batch
    got_rows = sum(m["n_rows"] or 0 for m in captured)
    got_nulls = sum(m["null_users"] or 0 for m in captured)
    got_sum = round(sum(m["value_sum"] or 0.0 for m in captured), 2)
    assert got_rows == want.n
    assert got_nulls == (want.nu or 0)
    assert abs(got_sum - want.vs) < 0.05  # per-batch rounding drift
    # the progress object exposes the same metrics without a listener
    if last is not None and "observedMetrics" in last:
        om = last["observedMetrics"].get("ingest")
        if om:
            assert om["n_rows"] <= want.n


# ---------------------------------------------------------------------------
# Round-10 addition: SQL UDFs (scalar + table function) and listagg
# ---------------------------------------------------------------------------


def test_oracle_parity_sql_function_bands(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark, ddb, "sql_function_bands", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_oracle_parity_sql_listagg_nations(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark, ddb, "sql_listagg_nations", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_sql_function_inlines_to_relational_plan(spark):
    """CREATE FUNCTION bodies must inline at plan time: the physical
    plan of the SQL-UDF query contains no Python/eval nodes — just the
    scan + filter + aggregate the hand-written form would produce,
    with the table function's predicate pushed to the parquet scan."""
    from go_mailio_diskusage_handler_spark import plans, registry

    df = registry.QUERIES["sql_function_bands"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,50000.0)" in plan, plan


# ---------------------------------------------------------------------------
# Round-10 addition: WebDataset-style media shard planning
# ---------------------------------------------------------------------------


def test_oracle_parity_media_shard_plan(spark, ddb):
    from go_mailio_diskusage_handler_spark import registry

    compare_with_oracle(
        spark, ddb, "media_shard_plan", registry.QUERIES,
        registry.ORACLE_SQL,
    )


def test_shard_plan_is_contiguous_and_budgeted(spark):
    """Shards per modality tile the doc_id order contiguously (next
    shard starts after the previous ends), every shard except possibly
    the last holds >= the byte budget's worth once its last asset
    lands, and no shard but the last is 'underfull by more than one
    asset' — the start-offset relaxation's contract."""
    from go_mailio_diskusage_handler_spark.operators import multimodal
    from go_mailio_diskusage_handler_spark.sources.tables import load_table

    budget = 16_384
    rows = multimodal.shard_plan(
        load_table(spark, SF_CORRECT, "documents"), budget
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.media_type, []).append(r)
    assert set(by_type) == {"image", "audio", "video"}
    for mt, shards in by_type.items():
        shards.sort(key=lambda r: r.shard_id)
        assert [s.shard_id for s in shards] == list(range(len(shards)))
        assert len(shards) > 1, "fixture should need multiple shards"
        for a, b in zip(shards, shards[1:]):
            assert a.last_doc_id < b.first_doc_id  # contiguous tiling
        # start-offset rule: every shard boundary crosses the budget,
        # so total_bytes >= budget - (last asset may overhang) for all
        # but the final shard
        for s in shards[:-1]:
            assert s.total_bytes >= budget - 3000  # fixture max asset ~3KB
