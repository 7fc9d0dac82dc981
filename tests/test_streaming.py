"""Structured-streaming span feed: windowed stats and stateful trace
assembly, driven through a temp-dir file source."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from traceframe_spark.streaming import (
    open_trace_assembly,
    read_span_stream,
    windowed_service_stats,
)

BASE = 1_700_000_000_000_000


def _span(tid, sid, op, start, dur, parent, service, error=False):
    return {
        "traceID": tid,
        "spanID": sid,
        "flags": 1,
        "operationName": op,
        "startTime": start,
        "duration": dur,
        "logs": [],
        "processID": "p1",
        "warnings": None,
        "service": service,
        "parent": parent,
        "tags": json.dumps({"error": "true"} if error else {}),
    }


@pytest.fixture()
def feed_dir(tmp_path):
    batches = [
        [
            _span("t1", "r1", "/a", BASE, 500_000, "", "frontend"),
            _span("t1", "c1", "/b", BASE + 100_000, 200_000, "r1", "backend", error=True),
            _span("t2", "r2", "/a", BASE + 60_000_000, 300_000, "", "frontend"),
            _span("t2", "c2", "/b", BASE + 60_100_000, 100_000, "r2", "backend"),
        ],
        # second batch advances the watermark past the first window
        [_span("t3", "orphan", "/c", BASE + 120_000_000, 50_000, "ghost", "backend")],
    ]
    p = tmp_path / "feed"
    p.mkdir()
    for i, spans in enumerate(batches):
        with open(p / f"batch{i}.jsonl", "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
    return str(p)


def test_windowed_service_stats(spark, feed_dir, tmp_path):
    stream = read_span_stream(spark, feed_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    stats = windowed_service_stats(stream, window="1 minute", watermark="30 seconds")
    q = (
        stats.writeStream.format("memory")
        .queryName("svc_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    # append mode only emits closed windows; with availableNow the final
    # watermark closes all but the newest — check what materialized.
    rows = spark.sql("SELECT * FROM svc_stats ORDER BY window_start, service").collect()
    got = {(r["service"], r["n_spans"], r["n_errors"]) for r in rows}
    # first window (t1): frontend 1 span 0 errors, backend 1 span 1 error
    assert ("frontend", 1, 0) in got
    assert ("backend", 1, 1) in got


def test_open_trace_assembly(spark, feed_dir, tmp_path):
    stream = read_span_stream(spark, feed_dir)
    assembled = open_trace_assembly(stream)
    q = (
        assembled.writeStream.format("memory")
        .queryName("open_traces")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM open_traces").collect()
            if len(rows) >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()
    by_tid = {r["traceID"]: r for r in rows}
    assert set(by_tid) == {"t1", "t2", "t3"}
    assert by_tid["t1"]["nspans"] == 2
    assert by_tid["t1"]["is_complete"] == 1
    assert by_tid["t1"]["root_operation"] == "/a"
    assert by_tid["t1"]["duration_us"] == 500_000
    assert by_tid["t3"]["is_complete"] == 0  # orphan-only trace


def test_stream_to_span_store(spark, feed_dir, tmp_path):
    from traceframe_spark import sinks
    from traceframe_spark.streaming import stream_to_span_store

    stream = read_span_stream(spark, feed_dir)
    q = stream_to_span_store(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ck3"),
        trigger_available_now=True,
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    back = sinks.read_spans(spark, str(tmp_path / "store"))
    assert back.count() == 5
    # partition layout on disk
    import os
    dirs = os.listdir(tmp_path / "store")
    assert any(d.startswith("span_date=") for d in dirs)


def test_jaeger_stream_to_assembly_and_store_end_to_end(spark, tmp_path):
    """The lambda-free loop the module docstrings promise, in one wire:
    spark.readStream.format('jaeger') (synthetic transport) → spans_table
    → (a) stateful open_trace_assembly and (b) stream_to_span_store, with
    the landed store readable by the batch API mid-flight."""
    from traceframe_spark import sinks
    from traceframe_spark.operators.spans import spans_table
    from traceframe_spark.sources.jaeger_datasource import JaegerDataSource
    from traceframe_spark.streaming import stream_to_span_store

    spark.dataSource.register(JaegerDataSource)
    base = 1_700_000_000_000_000
    n, step = 12, 5_000_000  # readable window below covers 7 of the 12
    raw = (
        spark.readStream.format("jaeger")
        .option("stream_start_us", str(base))
        .option("synthetic_now_us", str(base + 45 * 1_000_000))
        .option("horizon_lag_us", str(10 * 1_000_000))
        .option("synthetic_n", str(n))
        .option("synthetic_base_us", str(base))
        .option("synthetic_step_us", str(step))
        .load()
    )
    spans = spans_table(raw)  # the same operator batch ingest uses

    store = str(tmp_path / "e2e_store")
    q_store = stream_to_span_store(
        spans, store, str(tmp_path / "ck_store"), trigger_available_now=True
    )
    assembled = open_trace_assembly(spans)
    q_asm = (
        assembled.writeStream.format("memory")
        .queryName("e2e_traces")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_asm"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert q_store.awaitTermination(600), "streaming query timed out after 600s"
        # batch API reads the store the stream landed: window [base,
        # base+35s) covers trace offsets 0..30s -> 7 single-span traces
        back = sinks.read_spans(spark, store)
        assert back.count() == 7
        assert back.filter(F.col("service") == "svc").count() == 7

        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM e2e_traces").collect()
            if len(rows) >= 7:
                break
            time.sleep(2)
    finally:
        q_asm.stop()
    by_tid = {r["traceID"]: r for r in rows}
    assert len(by_tid) == 7
    for r in by_tid.values():
        assert r["nspans"] == 1
        assert r["is_complete"] == 1
        assert r["root_operation"] == "/op"
        assert r["duration_us"] == 1000


def test_jaeger_stream_reader(spark, tmp_path):
    """spark.readStream.format('jaeger'): poll-based streaming source.
    With a pinned synthetic clock the single microbatch covers exactly
    [stream_start, now - horizon_lag); traces outside stay unread."""
    from traceframe_spark.sources.jaeger_datasource import JaegerDataSource

    spark.dataSource.register(JaegerDataSource)
    base = 1_700_000_000_000_000
    n, step = 40, 5_000_000  # traces at base, base+5s, ... base+195s
    # horizon: now=base+150s, lag=10s -> readable window ends base+140s
    stream = (
        spark.readStream.format("jaeger")
        .option("stream_start_us", str(base))
        .option("synthetic_now_us", str(base + 150 * 1_000_000))
        .option("horizon_lag_us", str(10 * 1_000_000))
        .option("synthetic_n", str(n))
        .option("synthetic_base_us", str(base))
        .option("synthetic_step_us", str(step))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("jaeger_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    got = spark.sql("SELECT traceID FROM jaeger_stream_test").collect()
    # window [base, base+140s) covers offsets 0..139s -> 28 traces (step 5s)
    assert len(got) == 28, len(got)
    assert len({r["traceID"] for r in got}) == 28


def test_streaming_dedup(spark, tmp_path):
    """Re-delivered spans collapse to one row per spanID; a duplicate
    arriving within the watermark is dropped, state stays bounded."""
    from traceframe_spark.streaming import streaming_dedup

    feed = tmp_path / "dup_feed"
    feed.mkdir()
    batch1 = [
        _span("t1", "s1", "/a", BASE, 100, "", "svc"),
        _span("t1", "s1", "/a", BASE, 100, "", "svc"),  # same-batch dup
        _span("t1", "s2", "/b", BASE + 1000, 50, "s1", "svc"),
    ]
    batch2 = [
        _span("t1", "s2", "/b", BASE + 1000, 50, "s1", "svc"),  # redelivery
        _span("t2", "s3", "/a", BASE + 5_000_000, 70, "", "svc"),
    ]
    for i, spans in enumerate([batch1, batch2]):
        with open(feed / f"b{i}.jsonl", "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")

    stream = read_span_stream(spark, str(feed), max_files_per_trigger=1)
    deduped = streaming_dedup(
        stream, ["spanID"], event_time_col="startTime", watermark="1 minute"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    rows = spark.sql("SELECT spanID, count(*) AS n FROM dedup_stream GROUP BY spanID").collect()
    got = {r["spanID"]: r["n"] for r in rows}
    assert got == {"s1": 1, "s2": 1, "s3": 1}


def test_compact_span_store(spark, feed_dir, tmp_path):
    """Microbatch landing leaves one file per partition per batch;
    compaction collapses to one file per directory with identical data."""
    import glob

    from traceframe_spark import sinks
    from traceframe_spark.streaming import stream_to_span_store

    store = str(tmp_path / "store_c")
    q = stream_to_span_store(
        read_span_stream(spark, feed_dir, max_files_per_trigger=1),
        store,
        str(tmp_path / "ck_c"),
        trigger_available_now=True,
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    before = {r["spanID"]: r["service"] for r in sinks.read_spans(spark, store).collect()}
    n_files_before = len(glob.glob(f"{store}/span_date=*/trace_bucket=*/*.parquet"))

    sinks.compact_span_store(spark, store)
    after = {r["spanID"]: r["service"] for r in sinks.read_spans(spark, store).collect()}
    assert after == before and len(after) == 5
    dirs = glob.glob(f"{store}/span_date=*/trace_bucket=*")
    for d in dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    assert len(glob.glob(f"{store}/span_date=*/trace_bucket=*/*.parquet")) <= n_files_before


def test_stream_parent_enrich_stream_stream_join(spark, tmp_path):
    from traceframe_spark.streaming.spans import stream_parent_enrich

    # child spans and parent spans arrive on SEPARATE feeds
    parents = [
        _span("t1", "r1", "/root", BASE, 500_000, "", "frontend"),
        _span("t2", "r2", "/root", BASE + 60_000_000, 300_000, "", "frontend"),
    ]
    children = [
        _span("t1", "c1", "/child", BASE + 100_000, 200_000, "r1", "backend"),
        _span("t2", "c2", "/child", BASE + 60_100_000, 100_000, "r2", "backend"),
        # orphan: parent never arrives on the parent feed
        _span("t3", "c3", "/child", BASE + 200_000, 50_000, "ghost", "backend"),
    ]
    # late "advancer" spans push BOTH sources' watermarks (the global
    # watermark is the min across inputs) far past the first batch, so
    # the orphan's outer-join row can flush before the stream ends.
    late = BASE + 3_600_000_000
    parents_late = [_span("t9", "r9", "/root", late, 1_000, "", "frontend")]
    children_late = [_span("t9", "c9", "/child", late, 1_000, "r9", "backend")]

    pdir, cdir = tmp_path / "parents", tmp_path / "children"
    pdir.mkdir(), cdir.mkdir()
    (pdir / "b0.jsonl").write_text("\n".join(json.dumps(s) for s in parents))
    (cdir / "b0.jsonl").write_text("\n".join(json.dumps(s) for s in children))
    (pdir / "b1.jsonl").write_text("\n".join(json.dumps(s) for s in parents_late))
    (cdir / "b1.jsonl").write_text("\n".join(json.dumps(s) for s in children_late))

    enriched = stream_parent_enrich(
        read_span_stream(spark, str(cdir), max_files_per_trigger=1),
        read_span_stream(spark, str(pdir), max_files_per_trigger=1),
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    rows = {
        r["spanID"]: (r["parent_service"], r["parent_operation"])
        for r in spark.sql("select * from enriched").collect()
    }
    assert rows["c1"] == ("frontend", "/root")
    assert rows["c2"] == ("frontend", "/root")
    # left-outer: the orphan child still emits, with null parent columns
    assert "c3" in rows and rows["c3"] == (None, None)


def test_stream_to_rollup_maintains_continuous_aggregate(spark, tmp_path):
    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import stream_to_rollup

    HOUR_US = 3_600_000_000
    evs = [
        # batch 0: two hours' worth
        [(1, BASE, "click", 10.0), (2, BASE + 1_000_000, "view", 4.0),
         (3, BASE + HOUR_US, "click", 2.0)],
        # batch 1: new hour + a LATE straggler back into hour 0
        [(4, BASE + 2 * HOUR_US, "view", 7.0), (5, BASE + 5_000_000, "click", 1.0)],
    ]
    feed = tmp_path / "events"
    feed.mkdir()
    cols = ["event_id", "ts_us", "event_type", "value"]
    for i, batch in enumerate(evs):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(dict(zip(cols, e))) for e in batch)
        )

    schema = "event_id long, ts_us long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)  # long ns, like the events table
    )
    store, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    q = stream_to_rollup(
        stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
        trigger_available_now=True,
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    all_events = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", F.col("ts_us") * 1000)
    expected = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in R.rollup_events(all_events, R.MINUTE_NS, ["event_type"], "value").collect()
    }
    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected
    # the straggler's minute bucket really did merge across batches
    late_bucket = (BASE + 5_000_000) * 1000 // R.MINUTE_NS * R.MINUTE_NS
    assert got[(late_bucket, "click")][0] >= 1


def test_stream_to_rollup_staged_worst_case_matches_batch(spark, tmp_path):
    """Late-delta staging (the all-late-data worst-case mitigation):
    every batch scatters rows across every hour, so with
    late_stage_threshold set high every delta goes to staging; the store
    after periodic compaction + the final compact_rollup_store must
    EXACTLY equal the batch rollup — staging trades bounded staleness
    between compactions, never correctness. Also pins that mixed
    hot/cold batches (threshold between hour masses) stay exact."""
    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _STAGING_DIR,
        compact_rollup_store,
        read_rollup_store,
        stream_to_rollup,
    )

    HOUR_US = 3_600_000_000
    # 5 batches x 6 hours: shuffled/all-late shape — every batch touches
    # every hour with a few rows
    evs = [
        [
            (100 * b + h * 10 + i, BASE + h * HOUR_US + (b * 7 + i) * 1_000_000,
             "click" if (b + h + i) % 2 else "view", float(b + h + i))
            for h in range(6)
            for i in range(3)
        ]
        for b in range(5)
    ]
    feed = tmp_path / "stagefeed"
    feed.mkdir()
    cols = ["event_id", "ts_us", "event_type", "value"]
    for i, batch in enumerate(evs):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(dict(zip(cols, e))) for e in batch)
        )
    schema = "event_id long, ts_us long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )
    store, ckpt = str(tmp_path / "stagerollup"), str(tmp_path / "stageckpt")
    q = stream_to_rollup(
        stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
        trigger_available_now=True,
        late_stage_threshold=1000,  # everything is "cold": pure staging path
        compact_every=3,            # one mid-stream compaction fires (batch 2)
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    all_events = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", F.col("ts_us") * 1000)
    expected = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in R.rollup_events(all_events, R.MINUTE_NS, ["event_type"], "value").collect()
    }

    # BEFORE compaction: staging still holds post-batch-2 deltas; the
    # merge-on-read view is exact while the raw store undercounts
    assert (tmp_path / "stagerollup" / _STAGING_DIR).exists()
    view = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in read_rollup_store(spark, store, ["event_type"]).collect()
    }
    assert view == expected
    raw_total = spark.read.parquet(store).agg(F.sum("n")).first()[0]
    assert raw_total < sum(v[0] for v in expected.values())

    assert compact_rollup_store(spark, store, ["event_type"])  # staged rows existed
    assert not compact_rollup_store(spark, store, ["event_type"])  # idempotent drain
    assert not (tmp_path / "stagerollup" / _STAGING_DIR).exists()
    # post-compaction the merge-on-read view degrades to the plain scan
    assert read_rollup_store(spark, store, ["event_type"]).count() == len(expected)

    # the size-free knob: cap hot hours per batch instead of a row
    # threshold — exactness must hold identically
    store2, ckpt2 = str(tmp_path / "caprollup"), str(tmp_path / "capckpt")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )
    q2 = stream_to_rollup(
        stream2, store2, ckpt2, R.MINUTE_NS, ["event_type"], "value",
        trigger_available_now=True,
        max_hot_hours=2,   # each batch merges only its 2 heaviest hours
        compact_every=4,
    )
    assert q2.awaitTermination(600), "streaming query timed out after 600s"
    compact_rollup_store(spark, store2, ["event_type"])
    got2 = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in spark.read.parquet(store2).collect()
    }
    assert got2 == expected
    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected


def test_stream_to_rollup_auto_threshold_routes_by_shape(spark, tmp_path):
    """late_stage_threshold="auto" re-derives the sizing rule per batch
    (5x the all-late per-hour mean over the standing store's hours):
    scattered all-late batches must go to STAGING (each hour's delta is
    ~the mean, far below 5x), while a batch concentrating its rows in
    one hour must MERGE immediately (its hour holds the whole batch,
    above 5x the spread-out mean) — same command, no hand-sized number,
    and the final compacted store is exact either way."""
    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _STAGING_DIR,
        compact_rollup_store,
        stream_to_rollup,
    )

    HOUR_US = 3_600_000_000
    MIN_US = 60_000_000
    scatter = lambda b: [
        (1000 * b + h * 10 + i, BASE + h * HOUR_US + (b * 2 + i) * MIN_US,
         "click", 1.0)
        for h in range(24)
        for i in range(2)
    ]
    hot = [
        (9000 + i, BASE + i * MIN_US, "click", 1.0) for i in range(24)
    ]  # one hour holds the entire batch
    evs = [scatter(0), scatter(1), scatter(2), hot]
    feed = tmp_path / "autofeed"
    feed.mkdir()
    cols = ["event_id", "ts_us", "event_type", "value"]
    for i, batch in enumerate(evs):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(dict(zip(cols, e))) for e in batch)
        )
        # FileStreamSource orders by modification time: pin distinct
        # mtimes or same-ms writes make the batch order (which the
        # mid-stream routing assertions below depend on) a coin flip
        os.utime(feed / f"b{i}.jsonl", (1_700_000_000 + i, 1_700_000_000 + i))
    schema = "event_id long, ts_us long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )
    store, ckpt = str(tmp_path / "autorollup"), str(tmp_path / "autockpt")
    q = stream_to_rollup(
        stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
        trigger_available_now=True,
        late_stage_threshold="auto",
        compact_every=100,  # never fires: isolates auto's routing
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    # scattered batches 1-2 staged (batch 0 created the store)...
    assert (tmp_path / "autorollup" / _STAGING_DIR).exists()
    # ...but the concentrated batch merged immediately: the raw store's
    # first hour already counts batch 0's rows AND the whole hot batch
    first_hour = BASE * 1000 // R.HOUR_NS * R.HOUR_NS
    raw_first_hour = (
        spark.read.parquet(store)
        .filter(F.col("hour_ns") == first_hour)
        .agg(F.sum("n"))
        .first()[0]
    )
    assert raw_first_hour == 2 + len(hot)  # batch 0 put 2 rows in hour 0

    all_events = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", F.col("ts_us") * 1000)
    expected = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in R.rollup_events(all_events, R.MINUTE_NS, ["event_type"], "value").collect()
    }
    assert compact_rollup_store(spark, store, ["event_type"])
    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected


def test_stream_to_hll_store_matches_batch_registers(spark, tmp_path):
    """Continuous distinct counting: after an availableNow drain over a
    SHUFFLED feed (late data everywhere), the standing HLL register
    store equals the batch-computed registers EXACTLY (register merge
    is max — no approximation is introduced by streaming), and the
    per-day estimates match the batch estimates."""
    from traceframe_spark.operators import sketch
    from traceframe_spark.streaming.spans import stream_to_hll_store

    HOUR_US = 3_600_000_000
    DAY_US = 24 * HOUR_US
    # 4 batches scattering users across 3 days (shuffled/late shape)
    evs = [
        [
            (b * 100 + d * 10 + i, BASE + d * DAY_US + (b * 3 + i) * HOUR_US,
             (b * 7 + d * 3 + i) % 40)
            for d in range(3)
            for i in range(6)
        ]
        for b in range(4)
    ]
    feed = tmp_path / "hllfeed"
    feed.mkdir()
    cols = ["event_id", "ts_us", "user_id"]
    for i, batch in enumerate(evs):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(dict(zip(cols, e))) for e in batch)
        )
    schema = "event_id long, ts_us long, user_id long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )
    store, ckpt = str(tmp_path / "hllstore"), str(tmp_path / "hllckpt")
    q = stream_to_hll_store(
        stream, store, ckpt, "user_id", trigger_available_now=True
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    all_events = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", F.col("ts_us") * 1000)
    b, r = sketch.hll_bucket_rho(F.col("user_id"), 10)
    batch_regs = (
        all_events.select(
            F.expr("ts div 86400000000000").alias("day"), b.alias("bucket"), r.alias("rho")
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    as_rows = lambda df: sorted(
        (row["day"], row["bucket"], row["rho_max"]) for row in df.collect()
    )
    assert as_rows(spark.read.parquet(store)) == as_rows(batch_regs)

    est = {
        row["day"]: row["est"]
        for row in sketch.hll_estimate_by(
            spark.read.parquet(store), ["day"], p=10
        ).collect()
    }
    exact = {
        row["day"]: row["n"]
        for row in all_events.groupBy(F.expr("ts div 86400000000000").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # BASE is not midnight-aligned, so the 3 synthetic "days" straddle
    # 3-4 calendar days — the day SET must match the batch run exactly
    assert set(est) == set(exact) and len(est) >= 3
    for day, n in exact.items():
        assert abs(est[day] - n) / n < 0.25  # tiny-set linear counting regime

    # the register-merge headline, store-read edition: WEEKLY estimates
    # folded from the STORED daily registers (union + grouped max —
    # hll_merge's fold, grouped by week) must equal the estimate built
    # from events directly (max is associative, so daily-then-weekly is
    # register-exact), without touching the events table again
    weekly_from_store = (
        spark.read.parquet(store)
        .withColumn("week", F.expr("(day + 3) div 7"))
        .groupBy("week", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    bw, rw = sketch.hll_bucket_rho(F.col("user_id"), 10)
    weekly_direct = (
        all_events.select(
            F.expr("(ts div 86400000000000 + 3) div 7").alias("week"),
            bw.alias("bucket"),
            rw.alias("rho"),
        )
        .groupBy("week", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    week_rows = lambda df: sorted(
        (row["week"], row["bucket"], row["rho_max"]) for row in df.collect()
    )
    assert week_rows(weekly_from_store) == week_rows(weekly_direct)
    west = {
        row["week"]: row["est"]
        for row in sketch.hll_estimate_by(weekly_from_store, ["week"], p=10).collect()
    }
    wexact = {
        row["week"]: row["n"]
        for row in all_events.groupBy(
            F.expr("(ts div 86400000000000 + 3) div 7").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(west) == set(wexact)
    for week, n in wexact.items():
        assert abs(west[week] - n) / n < 0.25


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window over an availableNow stream equals the batch run
    on the union of all batches, including a late event that lands
    inside an already-open session (within watermark)."""
    from traceframe_spark.streaming.sessions import session_stats, sessionize_stream

    MIN_US = 60_000_000
    evs = [
        # batch 0: user 1 session A (3 events), user 2 session (1 event)
        [(1, 1, 0), (2, 1, 5 * MIN_US), (3, 1, 10 * MIN_US), (4, 2, 0)],
        # batch 1: late event inside user 1's session A + a far-future
        # event opening session B (also advances the watermark past A)
        [(5, 1, 7 * MIN_US), (6, 1, 600 * MIN_US)],
    ]
    feed = tmp_path / "sessfeed"
    feed.mkdir()
    cols = ["event_id", "user_id", "ts_us"]
    for i, batch in enumerate(evs):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps(dict(zip(cols, e))) for e in batch)
        )
    schema = "event_id long, user_id long, ts_us long"
    base_us = 1_700_000_000_000_000
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", (F.col("ts_us") + base_us) * 1000)
    )
    out = sessionize_stream(stream, gap="30 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    batch_df = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", (F.col("ts_us") + base_us) * 1000)
    expected = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in session_stats(batch_df, "30 minutes").collect()
    }
    got = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from sess_out").collect()
    }
    # append mode only emits sessions the watermark has closed; every
    # emitted session must match the batch answer exactly, and the late
    # event's session (4 events, user 1) must be among them
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])
    late_sessions = [v for (u, _), v in got.items() if u == 1]
    assert any(n == 4 for _, n in late_sessions), got


def test_session_window_boundary_semantics(spark):
    """session_window's merge boundary is CLOSED: an event at exactly
    prev + gap merges into the session; only a strictly larger gap
    splits — identical to the lag idiom's > gap rule (this equivalence
    is what lets the catalog query share the lag-idiom oracle)."""
    from traceframe_spark.streaming.sessions import session_stats

    MIN_NS = 60_000_000_000
    df = spark.createDataFrame(
        # 0 and 30 merge (exact gap); 45 merges; 76 > 45+30 splits
        [(1, 1, 0), (2, 1, 30 * MIN_NS), (3, 1, 45 * MIN_NS), (4, 1, 76 * MIN_NS)],
        "event_id long, user_id long, off long",
    ).withColumn("ts", F.col("off") + F.lit(1_700_000_000_000_000_000))
    sessions = session_stats(df, "30 minutes").collect()
    assert len(sessions) == 2
    assert sorted(r["n_events"] for r in sessions) == [1, 3]


def test_session_window_equals_lag_idiom_randomized(spark):
    """Randomized pin: session_stats (native session_window) produces
    exactly the sessions of the lag + cumulative-sum idiom with the
    > gap split rule, on adversarial data (dense ties, exact-gap
    boundaries, multi-user interleave)."""
    import random

    from pyspark.sql.window import Window
    from traceframe_spark.streaming.sessions import session_stats

    rng = random.Random(7)
    MIN_NS = 60_000_000_000
    base = 1_700_000_000_000_000_000
    rows = []
    for eid in range(300):
        user = rng.randint(1, 4)
        # offsets in whole minutes so exact-30min gaps actually occur
        off = rng.randint(0, 400) * MIN_NS
        rows.append((eid, user, base + off))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")

    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in session_stats(df, "30 minutes").collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = 30 * MIN_NS
    sess = (
        df.withColumn(
            "new_s",
            F.when((F.col("ts") - F.lag("ts").over(w)) > gap_ns, 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    want = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            (F.min("ts") / 1000).cast("long").alias("start_us"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert got == want


def test_stream_to_rollup_recovers_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: run the rollup stream to completion
    on batch 0, STOP, add batch 1 files, restart with the SAME
    checkpoint — the standing aggregate equals a batch rollup over all
    events (no double-count of batch 0, no loss of batch 1)."""
    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import stream_to_rollup

    evs = [
        [(1, BASE, "click", 10.0), (2, BASE + 1_000_000, "view", 4.0)],
        [(3, BASE + 3_600_000_000, "click", 2.0), (4, BASE + 5_000_000, "click", 1.0)],
    ]
    feed = tmp_path / "rollup_feed"
    feed.mkdir()
    cols = ["event_id", "ts_us", "event_type", "value"]
    schema = "event_id long, ts_us long, event_type string, value double"
    store, ckpt = str(tmp_path / "rollup_store"), str(tmp_path / "rollup_ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
            .withColumn("ts", F.col("ts_us") * 1000)
        )
        q = stream_to_rollup(
            stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
            trigger_available_now=True,
        )
        assert q.awaitTermination(600), "streaming query timed out after 600s"

    (feed / "b0.jsonl").write_text(
        "\n".join(json.dumps(dict(zip(cols, e))) for e in evs[0])
    )
    run_once()  # first incarnation drains batch 0 and stops
    (feed / "b1.jsonl").write_text(
        "\n".join(json.dumps(dict(zip(cols, e))) for e in evs[1])
    )
    run_once()  # restart from the same checkpoint picks up only b1

    all_events = spark.createDataFrame(
        [e for b in evs for e in b], schema
    ).withColumn("ts", F.col("ts_us") * 1000)
    expected = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in R.rollup_events(all_events, R.MINUTE_NS, ["event_type"], "value").collect()
    }
    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected


def test_batch_markers_make_replay_noop(spark, tmp_path):
    """At-least-once replay protection: an applied batch_id is detected
    (skip), and markers are namespaced by checkpoint lineage so a new
    checkpoint's batch 0 is NOT shadowed by the old lineage's batch 0."""
    from traceframe_spark.streaming import spans as S

    store = str(tmp_path / "marked_store")
    assert not S._batch_already_applied(spark, store, "ckpt-A", 0)
    S._mark_batch_applied(spark, store, "ckpt-A", 0)
    assert S._batch_already_applied(spark, store, "ckpt-A", 0)
    assert not S._batch_already_applied(spark, store, "ckpt-A", 1)
    assert not S._batch_already_applied(spark, store, "ckpt-B", 0)


def test_streaming_cms_merges_to_batch_sketch(spark, tmp_path):
    """Sketch additivity under streaming: fold each micro-batch's CMS
    partial into a standing sketch store via foreachBatch; after the
    stream drains, the stored sketch equals the batch-built sketch of
    all data — so heavy-hitter estimates from the standing store are
    identical to batch estimates. The same merge shape as
    stream_to_rollup, applied to the sketch family."""
    from traceframe_spark.operators import sketch

    batches = [
        ["spark spark shuffle join", "join scan scan scan"],
        ["spark window agg", "scan spark spark shuffle"],
    ]
    feed = tmp_path / "docs"
    feed.mkdir()
    for i, texts in enumerate(batches):
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(json.dumps({"text": t}) for t in texts)
        )

    store = str(tmp_path / "cms_store")

    def fold(batch_df, batch_id):
        occ = batch_df.select(
            F.explode(F.split(F.col("text"), r"\s+")).alias("w")
        ).filter(F.col("w") != "")
        part = sketch.cms_build(occ, "w")
        import os

        if os.path.isdir(store):
            part = sketch.cms_merge(part, batch_df.sparkSession.read.parquet(store))
        part.coalesce(1).write.mode("overwrite").format("parquet").save(store + "_next")
        # atomic-enough swap for the test; production uses the rollup
        # store's dynamic-partition merge instead
        import shutil

        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)

    stream = (
        spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"

    all_docs = spark.createDataFrame(
        [(t,) for b in batches for t in b], "text string"
    )
    occ = all_docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    want = {(r["row"], r["bucket"]): r["cnt"] for r in sketch.cms_build(occ, "w").collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in spark.read.parquet(store).collect()}
    assert got == want

    est = {
        r["w"]: r["est"]
        for r in sketch.cms_estimate(
            spark.read.parquet(store), occ.distinct(), "w"
        ).collect()
    }
    assert est["spark"] >= 5 and est["scan"] >= 4


def test_quality_gate_on_document_stream(spark, tmp_path):
    """The curation gate is a stateless zero-shuffle projection, so it
    composes with Structured Streaming unchanged — a continuous-ingest
    pipeline can gate documents before they ever land in the corpus
    store. Verified equal to the batch verdicts over a file-fed
    stream."""
    from traceframe_spark.operators.text import quality_gate

    feed = tmp_path / "docs"
    feed.mkdir()
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog "
                              "and walks to a small house near the river "
                              "where many animals gather for food"},
        {"doc_id": 2, "text": "the of and"},
        {"doc_id": 3, "text": "der die das und ist nicht ein eine mit von "
                              "zu aus bei auf dem den des im am um an als "
                              "auch nach"},
    ]
    with open(feed / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(feed))
    )
    gated = quality_gate(stream)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("gated_docs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r for r in spark.sql("select * from gated_docs").collect()}
    batch = {
        r["doc_id"]: r
        for r in quality_gate(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in rows], "doc_id: long, text: string"
            )
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    for did in got:
        assert got[did].asDict() == batch[did].asDict(), did
    assert got[1]["keep"] and not got[2]["keep"] and not got[3]["keep"]


def test_compact_rollup_store_folds_tombstone_leftover(spark, tmp_path):
    """Compaction renames staging to a tombstoned path before merging
    (so concurrent readers never see a staged delta twice); a crash
    between the store rewrite and the tombstone delete leaves the
    tombstone behind — the next compact_rollup_store call must fold the
    leftover FIRST, then the live staging area, and clear both."""
    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _STAGING_DIR,
        _STAGING_TOMB_DIR,
        compact_rollup_store,
        read_rollup_store,
    )

    HOUR_US = 3_600_000_000
    schema = "event_id long, ts_us long, event_type string, value double"

    def delta_for(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts_us") * 1000
        )
        return R.rollup_events(df, R.MINUTE_NS, ["event_type"], "value").withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        )

    store = str(tmp_path / "tombstore")
    b0 = [(i, BASE + i * 1_000_000, "click", float(i)) for i in range(6)]
    b1 = [(10 + i, BASE + HOUR_US + i * 1_000_000, "view", 2.0 * i) for i in range(6)]
    b2 = [(20 + i, BASE + i * 1_000_000, "click", 3.0 * i) for i in range(6)]

    # batch 0 staged then compacted -> standing store exists
    delta_for(b0).coalesce(1).write.mode("append").parquet(f"{store}/{_STAGING_DIR}")
    assert compact_rollup_store(spark, store, ["event_type"])
    # simulate the crash window: a tombstoned staging area whose delete
    # never ran (batch 1), PLUS freshly staged deltas (batch 2)
    delta_for(b1).coalesce(1).write.mode("append").parquet(
        f"{store}/{_STAGING_TOMB_DIR}"
    )
    delta_for(b2).coalesce(1).write.mode("append").parquet(f"{store}/{_STAGING_DIR}")
    assert compact_rollup_store(spark, store, ["event_type"])
    assert not (tmp_path / "tombstore" / _STAGING_TOMB_DIR).exists()
    assert not (tmp_path / "tombstore" / _STAGING_DIR).exists()
    assert not compact_rollup_store(spark, store, ["event_type"])  # drained

    expected = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in R.rollup_events(
            spark.createDataFrame(b0 + b1 + b2, schema).withColumn(
                "ts", F.col("ts_us") * 1000
            ),
            R.MINUTE_NS,
            ["event_type"],
            "value",
        ).collect()
    }
    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in read_rollup_store(spark, store, ["event_type"]).collect()
    }
    assert got == expected


def test_hour_swap_recovery_rolls_back_interrupted_swap(spark, tmp_path):
    """The per-hour prepare-then-rename rewrite can crash in two states;
    _recover_hour_swaps must roll BACK, never forward (the caller's
    at-least-once replay re-merges the delta, so completing the swap
    would double-count it): (A) crash between the two renames — live
    hour missing, old data in the tombstone, new in staging → old data
    restored, staging dropped; (B) crash after the swap, before the
    tombstone delete — live hour holds NEW (already-merged) data but
    the batch marker was never written, so the replay will re-merge the
    same delta: keeping the new data would double-count it. The OLD
    data must be restored (new live dir dropped, tombstone renamed
    back)."""
    import shutil

    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _PART_SWAP_NEW as _HOUR_SWAP_NEW,
        _PART_SWAP_OLD as _HOUR_SWAP_OLD,
        _write_merged_hours,
    )
    from traceframe_spark.streaming.spans import _recover_part_swaps

    def _recover_hour_swaps(spark, path):
        _recover_part_swaps(spark, path, "hour_ns")

    HOUR_US = 3_600_000_000
    schema = "event_id long, ts_us long, event_type string, value double"

    def rolled(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts_us") * 1000
        )
        return R.rollup_events(df, R.MINUTE_NS, ["event_type"], "value").withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        )

    store = str(tmp_path / "swapstore")
    old_rows = [(i, BASE + (i % 2) * HOUR_US + i * 1_000_000, "click", 1.0) for i in range(8)]
    _write_merged_hours(rolled(old_rows), store)
    hours = sorted(
        d.name for d in (tmp_path / "swapstore").iterdir() if d.name.startswith("hour_ns=")
    )
    assert len(hours) == 2
    h_a, h_b = hours
    old_totals = {
        r["hour_ns"]: (r["n"], r["v"])
        for r in spark.read.parquet(store)
        .groupBy("hour_ns").agg(F.sum("n").alias("n"), F.sum("value_sum").alias("v"))
        .collect()
    }

    # state A on h_a: live -> tombstone, fake new data left in staging
    (tmp_path / "swapstore" / _HOUR_SWAP_OLD).mkdir()
    shutil.move(
        str(tmp_path / "swapstore" / h_a),
        str(tmp_path / "swapstore" / _HOUR_SWAP_OLD / h_a),
    )
    (tmp_path / "swapstore" / _HOUR_SWAP_NEW / h_a).mkdir(parents=True)
    # state B on h_b: old data in the tombstone, live dir holds NEW
    # (merged) data that differs from it — fake "new" by doubling the
    # live hour's file so roll-forward and roll-back give different
    # totals (the pre-r10 test used identical copies and couldn't tell)
    shutil.copytree(
        str(tmp_path / "swapstore" / h_b),
        str(tmp_path / "swapstore" / _HOUR_SWAP_OLD / h_b),
    )
    live_b = tmp_path / "swapstore" / h_b
    for f in list(live_b.glob("*.parquet")):
        shutil.copy(str(f), str(live_b / f"doubled_{f.name}"))

    _recover_hour_swaps(spark, store)
    assert not (tmp_path / "swapstore" / _HOUR_SWAP_OLD).exists()
    assert not (tmp_path / "swapstore" / _HOUR_SWAP_NEW).exists()
    got = {
        r["hour_ns"]: (r["n"], r["v"])
        for r in spark.read.parquet(store)
        .groupBy("hour_ns").agg(F.sum("n").alias("n"), F.sum("value_sum").alias("v"))
        .collect()
    }
    # h_a restored from tombstone; h_b's half-swapped NEW data dropped
    # and the OLD data restored (roll-back, not forward) — nothing lost,
    # nothing double-counted
    assert got == old_totals


def test_swap_discipline_refuses_non_atomic_rename_schemes(spark):
    """The prepare-then-rename swap is only old-or-new where directory
    rename is ATOMIC; on S3-class stores rename is copy+delete, which
    silently voids the guarantee AND the metadata-only cost claim. The
    writer must refuse loudly (naming the manifest-pointer alternative)
    rather than sell atomicity the store cannot deliver; HDFS/ABFS/
    local/viewfs schemes pass."""
    from traceframe_spark.streaming.spans import _require_atomic_rename

    class _FakeUri:
        def __init__(self, scheme):
            self._s = scheme

        def getScheme(self):
            return self._s

    class _FakeFs:
        def __init__(self, scheme):
            self._u = _FakeUri(scheme)

        def getUri(self):
            return self._u

    for bad in ("s3a", "s3", "gs", "wasb", "S3A"):
        with pytest.raises(IOError, match="copy\\+delete"):
            _require_atomic_rename(_FakeFs(bad), "/store")
    for ok in ("hdfs", "abfs", "abfss", "file", "viewfs", None):
        _require_atomic_rename(_FakeFs(ok), "/store")


def test_merge_replay_after_mid_swap_crash_keeps_standing_rows(spark, tmp_path):
    """The replay-path hazard behind the recovery-ordering fix: a prior
    run crashed BETWEEN the two swap renames (live hour gone, old data
    in the tombstone), then the replaying batch runs a FULL merge. The
    merge's standing listing must see the tombstoned hour (recovery
    runs before the listing) — otherwise it merges delta-only and the
    subsequent swap overwrites the just-recovered old data, silently
    and permanently losing the hour's standing rows. Exercises
    _merge_into_store end-to-end, not _recover_part_swaps directly."""
    import shutil

    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _PART_SWAP_OLD as _HOUR_SWAP_OLD,
        _merge_into_store,
        _write_merged_hours,
    )

    schema = "event_id long, ts_us long, event_type string, value double"

    def rolled(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts_us") * 1000
        )
        return R.rollup_events(df, R.MINUTE_NS, ["event_type"], "value").withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        )

    store = str(tmp_path / "replaystore")
    old_rows = [(i, BASE + i * 1_000_000, "click", 1.0) for i in range(8)]
    _write_merged_hours(rolled(old_rows), store)
    (h_dir,) = [
        d.name
        for d in (tmp_path / "replaystore").iterdir()
        if d.name.startswith("hour_ns=")
    ]
    # crash between the two renames: live hour gone, old data tombstoned
    (tmp_path / "replaystore" / _HOUR_SWAP_OLD).mkdir()
    shutil.move(
        str(tmp_path / "replaystore" / h_dir),
        str(tmp_path / "replaystore" / _HOUR_SWAP_OLD / h_dir),
    )
    # the replaying batch's delta touches the same hour
    delta_rows = [(100 + i, BASE + i * 1_000_000, "click", 10.0) for i in range(4)]
    _merge_into_store(spark, rolled(delta_rows).localCheckpoint(), store, ["event_type"])
    got = spark.read.parquet(store).agg(
        F.sum("n").alias("n"), F.sum("value_sum").alias("v")
    ).collect()[0]
    # standing rows survived AND the delta landed: 8 old events (value
    # 1.0 each) + 4 replayed events (value 10.0 each)
    assert (got["n"], got["v"]) == (12, 8 * 1.0 + 4 * 10.0)


@pytest.mark.volume
def test_rename_store_randomized_crash_replay_equivalence(spark, tmp_path):
    """Adversarial schedule pin for the r10 recovery fixes: a seeded
    random fold sequence where, after any single-hour batch, the store
    may be left in either mid-swap crash state — (A) live hour gone,
    old data tombstoned, junk staging; (B) new data live, old data
    tombstoned (marker never written) — followed by the at-least-once
    replay of that batch. The replaying merge must see the recovered
    standing rows (recovery runs BEFORE its listing) and totals must
    equal the one-shot batch rollup exactly: no loss (the pre-fix
    failure), no double count (the pre-fix roll-forward failure).
    Batches are single-hour so every crash state is within the
    discipline's exactness window (multi-hour crashes after a
    partition's tombstone delete are the DOCUMENTED residual)."""
    import random
    import shutil

    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _PART_SWAP_NEW,
        _PART_SWAP_OLD,
        _merge_into_store,
    )

    HOUR_US = 3_600_000_000
    # hour-align so a batch's minutes stay inside ONE wall-clock hour
    H0 = (BASE // HOUR_US) * HOUR_US
    schema = "event_id long, ts_us long, event_type string, value double"

    def delta_for(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts_us") * 1000
        )
        return R.rollup_events(df, R.MINUTE_NS, ["event_type"], "value").withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        )

    for trial in range(2):
        rng = random.Random(200 + trial)
        root = tmp_path / f"rn{trial}"
        store = str(root)
        all_rows, eid = [], 0
        for _b in range(6):
            hour = rng.randint(0, 2)
            rows = [
                (
                    eid + i,
                    H0 + hour * HOUR_US + rng.randint(0, 58) * 60_000_000,
                    rng.choice(["click", "view"]),
                    float(rng.randint(1, 9)),
                )
                for i in range(rng.randint(1, 5))
            ]
            eid += len(rows)
            all_rows += rows
            delta = delta_for(rows).localCheckpoint()
            (h_ns,) = {r["hour_ns"] for r in delta.select("hour_ns").collect()}
            hdir = f"hour_ns={h_ns}"
            pre = None
            if (root / hdir).exists():
                pre = root / f"_pre_{_b}"
                shutil.copytree(str(root / hdir), str(pre))
            _merge_into_store(spark, delta, store, ["event_type"])
            mode = rng.choice(["clean", "A", "B"])
            if mode != "clean" and pre is not None:
                (root / _PART_SWAP_OLD).mkdir(exist_ok=True)
                if mode == "A":
                    # crash between the two renames: live gone, old
                    # tombstoned, half-written staging left behind
                    shutil.rmtree(str(root / hdir))
                    shutil.move(str(pre), str(root / _PART_SWAP_OLD / hdir))
                    (root / _PART_SWAP_NEW / hdir).mkdir(parents=True)
                else:
                    # crash after swap-in, before the tombstone delete:
                    # NEW data live, OLD data tombstoned, marker unwritten
                    shutil.move(str(pre), str(root / _PART_SWAP_OLD / hdir))
                pre = None
                # the at-least-once replay of the SAME batch
                _merge_into_store(spark, delta, store, ["event_type"])
            elif mode == "A" and pre is None:
                # brand-new hour: crash between renames means the live
                # dir vanishes and only staging junk remains
                shutil.rmtree(str(root / hdir))
                (root / _PART_SWAP_NEW / hdir).mkdir(parents=True)
                _merge_into_store(spark, delta, store, ["event_type"])
            if pre is not None:
                shutil.rmtree(str(pre), ignore_errors=True)

        want = {
            (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
            for r in R.rollup_events(
                spark.createDataFrame(all_rows, schema).withColumn(
                    "ts", F.col("ts_us") * 1000
                ),
                R.MINUTE_NS,
                ["event_type"],
                "value",
            ).collect()
        }
        got = {
            (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
            for r in spark.read.parquet(store).drop("hour_ns").collect()
        }
        assert got == want, f"trial {trial}"


def test_hour_swap_racing_reader_never_sees_partial_hour(spark, tmp_path):
    """Read the store in a loop WHILE a compaction rewrites every hour:
    each successfully-read hour must show either its complete OLD
    totals or its complete NEW totals — never a mix (the pre-swap
    in-place overwrite exposed readers to partially rewritten hours for
    the whole data write). Transient FileNotFound/empty-hour reads are
    the documented loud-retry window between the two renames and are
    retried, not failed."""
    import threading

    from traceframe_spark.operators import rollup as R
    from traceframe_spark.streaming.spans import (
        _STAGING_DIR,
        compact_rollup_store,
    )

    HOUR_US = 3_600_000_000
    N_HOURS = 4
    schema = "event_id long, ts_us long, event_type string, value double"

    def rolled(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts_us") * 1000
        )
        return R.rollup_events(df, R.MINUTE_NS, ["event_type"], "value").withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        )

    store = str(tmp_path / "racestore")
    base_rows = [
        (h * 100 + i, BASE + h * HOUR_US + i * 1_000_000, "click", 1.0)
        for h in range(N_HOURS)
        for i in range(10)
    ]
    from traceframe_spark.streaming.spans import _write_merged_hours

    _write_merged_hours(rolled(base_rows), store)

    def totals(df):
        return {
            r["hour_ns"]: (r["n"], r["v"])
            for r in df.groupBy("hour_ns")
            .agg(F.sum("n").alias("n"), F.sum("value_sum").alias("v"))
            .collect()
        }

    old_t = totals(spark.read.parquet(store))
    # a staged delta touching EVERY hour -> the compaction rewrites all
    delta_rows = [
        (10_000 + h * 100 + i, BASE + h * HOUR_US + i * 1_000_000, "click", 1.0)
        for h in range(N_HOURS)
        for i in range(5)
    ]
    rolled(delta_rows).coalesce(1).write.mode("append").parquet(
        f"{store}/{_STAGING_DIR}"
    )
    new_t = {h: (n + 5, v + 5.0) for h, (n, v) in old_t.items()}

    err: list[BaseException] = []

    def compact():
        try:
            compact_rollup_store(spark, store, ["event_type"])
        except BaseException as exc:  # noqa: BLE001 — surfaced in the main thread
            err.append(exc)

    t = threading.Thread(target=compact)
    t.start()
    reads = partials = retries = 0
    while t.is_alive() or reads == 0:
        try:
            got = totals(spark.read.parquet(store))
        except Exception:  # noqa: BLE001 — listed-then-swapped: loud retry window
            retries += 1
            continue
        reads += 1
        for h, nv in got.items():
            if h not in old_t:
                continue  # staging dir rows never leak; ignore unknown
            if nv != old_t[h] and nv != new_t[h]:
                partials += 1
    t.join()
    assert not err, err
    assert partials == 0, f"{partials} partial-hour observations in {reads} reads"
    assert reads > 0
    assert totals(spark.read.parquet(store)) == new_t
