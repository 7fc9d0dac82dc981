"""Fixture-scale parity with the reference suite
(``/root/reference/test/test_traceframe.py:134-155``): 100 traces, 420
spans, 60 distinct tag keys, ≥1 critical segment per trace.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from traceframe_spark import (
    critical_path_segments,
    read_raw_traces,
    spans_from_jaeger_file,
    traces_from_jaeger_file,
    trace_with_spans,
    with_tag_columns,
)


def test_traces_table_counts(spark, jaeger_json_path):
    dfT = traces_from_jaeger_file(spark, jaeger_json_path)
    assert dfT.columns == [
        "traceID",
        "traceName",
        "nspans",
        "errspans",
        "duration",
        "startTime",
        "processes",
        "iserror",
    ]
    rows = dfT.collect()
    assert len(rows) == 100  # 100 traces × 8 cols = "size 800" in the reference
    # Sorted by startTime descending (reference traceframe.py:230).
    times = [r["startTime"] for r in rows]
    assert times == sorted(times, reverse=True)
    # traceName is "service: operation".
    assert all(": " in r["traceName"] for r in rows)
    # iserror ↔ errspans > 0.
    assert all(r["iserror"] == (r["errspans"] > 0) for r in rows)


def test_spans_table_counts(spark, jaeger_json_path):
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    assert dfS.count() == 420
    # 60 distinct tag keys (dynamic-pivot width 71 = 11 fixed + 60).
    nkeys = (
        dfS.select(F.explode(F.map_keys("tags")).alias("k")).distinct().count()
    )
    assert nkeys == 60
    pivoted = with_tag_columns(dfS)
    assert len(pivoted.columns) == 71
    # Every span resolved a service through the process map.
    assert dfS.filter(F.col("service").isNull()).count() == 0
    # Exactly one root span per trace.
    roots_per_trace = (
        dfS.filter(F.col("parent") == "").groupBy("traceID").count().collect()
    )
    assert len(roots_per_trace) == 100
    assert all(r["count"] == 1 for r in roots_per_trace)


def test_typed_tag_columns(spark, jaeger_json_path):
    """Typed pivot restores the native dtypes the reference frame gets
    from pandas inference (traceframe.py:465-467): bool/int64 tag columns
    come back as boolean/bigint, not string (VERDICT r1 missing-2)."""
    from pyspark.sql.types import BooleanType, LongType, StringType

    from traceframe_spark.operators.spans import distinct_tag_types

    raw = read_raw_traces(spark, jaeger_json_path)
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    types = distinct_tag_types(raw)
    assert types["error"] == "bool"
    assert types["http.status_code"] == "int64"

    pivoted = with_tag_columns(dfS, types=types)
    assert len(pivoted.columns) == 71  # same width as the untyped pivot
    schema = {f.name: f.dataType for f in pivoted.schema.fields}
    assert isinstance(schema["error"], BooleanType)
    assert isinstance(schema["sampler.param"], BooleanType)
    assert isinstance(schema["http.status_code"], LongType)
    assert isinstance(schema["load_generator.seq_num"], LongType)
    assert isinstance(schema["http.method"], StringType)
    # values survive the cast: real error spans exist in the fixture
    errs = pivoted.filter(F.col("error") == True).count()  # noqa: E712
    assert errs > 0
    assert pivoted.filter(F.col("`http.status_code`") == 503).count() == 2


def test_critical_path_sweep_all_traces(spark, jaeger_json_path):
    """Reference invariant sweep (test_traceframe.py:146-155) plus a
    stronger one: segments partition each root span's duration."""
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    segs = critical_path_segments(dfS)
    per_trace = (
        segs.groupBy("traceID")
        .agg(
            F.count("*").alias("nsegs"),
            F.sum("seg_duration").alias("crit_total"),
            F.min("seg_start").alias("first_start"),
        )
        .collect()
    )
    assert len(per_trace) == 100
    assert all(r["nsegs"] >= 1 for r in per_trace)

    roots = (
        dfS.filter(F.col("parent") == "")
        .select("traceID", "startTime", "duration")
        .collect()
    )
    root_by_trace = {r["traceID"]: r for r in roots}
    for r in per_trace:
        root = root_by_trace[r["traceID"]]
        assert r["crit_total"] <= root["duration"]
        assert r["first_start"] >= root["startTime"]


def test_trace_with_spans_assembly(spark, jaeger_json_path):
    dfT = traces_from_jaeger_file(spark, jaeger_json_path)
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    some_trace = dfT.select("traceID").first()["traceID"]
    assembled = trace_with_spans(dfT, dfS, some_trace)
    assert assembled["traceID"] == some_trace
    assert assembled["nspans"] == len(assembled["spans"])
    # Dedup keeps the set of spanIDs unique.
    span_ids = [s["spanID"] for s in assembled["spans"]]
    assert len(span_ids) == len(set(span_ids))


def test_raw_traces_schema(spark, jaeger_json_path):
    raw = read_raw_traces(spark, jaeger_json_path)
    assert raw.count() == 100
    # No dropped/corrupt rows: every trace parsed its spans array.
    assert raw.filter(F.col("spans").isNull()).count() == 0


def test_empty_input_tables(spark):
    """Reference builds a schema-only frame for empty input
    (traceframe.py:211-219); the engine must do the same."""
    from traceframe_spark import RAW_TRACE_SCHEMA, spans_table, traces_table

    empty = spark.createDataFrame([], schema=RAW_TRACE_SCHEMA)
    t = traces_table(empty)
    assert t.count() == 0
    assert t.columns == [
        "traceID", "traceName", "nspans", "errspans",
        "duration", "startTime", "processes", "iserror",
    ]
    s = spans_table(empty)
    assert s.count() == 0
    assert len(s.columns) == 12


def test_jaeger_python_datasource(spark):
    """spark.read.format('jaeger'): partition-parallel DataSource read
    (synthetic transport), schema == RAW_TRACE_SCHEMA, rows flow into the
    span/trace tables like any other source."""
    from traceframe_spark.operators.spans import spans_table
    from traceframe_spark.operators.traces import traces_table
    from traceframe_spark.schemas import RAW_TRACE_SCHEMA
    from traceframe_spark.sources.jaeger_datasource import JaegerDataSource

    spark.dataSource.register(JaegerDataSource)
    base = 1_700_000_000_000_000
    n, step = 40, 5_000_000
    df = (
        spark.read.format("jaeger")
        .option("start", str(base))
        .option("end", str(base + n * step))
        .option("n_buckets", "8")
        .option("synthetic_n", str(n))
        .option("synthetic_base_us", str(base))
        .option("synthetic_step_us", str(step))
        .load()
    )
    assert df.schema == RAW_TRACE_SCHEMA
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == n
    # no duplicates across bucket boundaries (inclusive-µs windows)
    assert df.select("traceID").distinct().count() == n
    # composes with the canonical tables
    assert traces_table(df).count() == n
    spans = spans_table(df)
    assert spans.count() == n
    assert spans.filter(spans.service == "svc").count() == n


def test_datasource_degenerate_time_range(spark):
    """A single-µs [t, t] range is valid for the inclusive Jaeger API:
    the reader emits one degenerate bucket instead of zero partitions
    (zero partitions made the engine call read(None) and crash).
    end < start is rejected at planning time."""
    import pytest

    from traceframe_spark.sources.jaeger_datasource import JaegerDataSource, JaegerReader

    spark.dataSource.register(JaegerDataSource)
    base = 1_700_000_000_000_000
    df = (
        spark.read.format("jaeger")
        .option("start", str(base))
        .option("end", str(base))
        .option("synthetic_n", "3")
        .option("synthetic_base_us", str(base))
        .load()
    )
    # the synthetic transport has one trace exactly at `base`
    assert df.count() == 1
    with pytest.raises(ValueError, match="end .* must be >= start"):
        JaegerReader({"start": str(base), "end": str(base - 1), "synthetic_n": "1"})


def test_datasource_headers_forwarded(monkeypatch):
    """Auth headers reach the HTTP fetch from both DataSource readers:
    JSON 'headers' option plus repeated 'header.X' options, with
    'header.X' winning on conflict."""
    from traceframe_spark.sources import jaeger_datasource as mod
    from traceframe_spark.sources.jaeger_datasource import (
        JaegerReader,
        JaegerStreamReader,
        _headers_from_options,
    )

    opts = {
        "headers": '{"Authorization": "Bearer tok", "X-Env": "json"}',
        "header.X-Env": "flat",
    }
    assert _headers_from_options(opts) == {
        "Authorization": "Bearer tok",
        "X-Env": "flat",
    }
    assert _headers_from_options({}) is None

    seen = []

    def fake_requests_fetch(endpoint, headers):
        seen.append((endpoint, headers))
        return lambda params: []

    monkeypatch.setattr(mod, "_requests_fetch", fake_requests_fetch)
    batch = JaegerReader(
        {"endpoint": "http://j:16686", "service": "s", "start": "0", "end": "10", **opts}
    )
    list(batch.read(mod.TimeBucket(0, 9)))
    stream = JaegerStreamReader({"endpoint": "http://j:16686", "service": "s", **opts})
    stream._fetch_and_service()
    assert len(seen) == 2
    for _, headers in seen:
        assert headers == {"Authorization": "Bearer tok", "X-Env": "flat"}


def test_reference_compat_frames(spark, jaeger_json_path):
    """Drop-in pandas frames match the reference's shapes on the shared
    capture: 100x8 traces frame, 420x71 typed span frame (the reference
    test pins dfS.size == 29820 = 420*71)."""
    import numpy as np

    from traceframe_spark.compat import reference_span_frame, reference_trace_frame

    raw = read_raw_traces(spark, jaeger_json_path)
    dfT = reference_trace_frame(raw)
    assert dfT.shape == (100, 8)
    assert list(dfT.columns[:6]) == [
        "traceID", "traceName", "nspans", "errspans", "duration", "startTime"
    ]
    assert dfT["nspans"].sum() == 420

    dfS = reference_span_frame(raw)
    assert dfS.shape == (420, 71)
    assert dfS.size == 29820  # the reference's own pin
    # typed tag columns, like the reference's pandas inference
    assert np.issubdtype(dfS["http.status_code"].dtype, np.floating)  # int64+NaN widens
    assert set(dfS["error"].dropna().unique()) == {True}
    assert (dfS[dfS["http.status_code"].notna()]["http.status_code"] == 503).sum() == 2


def test_jsonl_quarantine_splits_corrupt_lines(spark, tmp_path):
    import json as _json

    from traceframe_spark.sources.jsonl import spans_from_jsonl

    good = {
        "traceID": "t1", "spanID": "s1", "flags": 1, "operationName": "/a",
        "startTime": 1_700_000_000_000_000, "duration": 1000, "logs": [],
        "processID": "p1", "warnings": None, "service": "svc",
        "parent": "", "tags": "{}",
    }
    feed = tmp_path / "feed"
    feed.mkdir()
    lines = [
        _json.dumps(good),
        '{"truncated": ',                      # cut-off JSON
        "2026-08-13 INFO collector restarted", # stray log line
        _json.dumps({**good, "spanID": "s2"}),
    ]
    (feed / "b0.jsonl").write_text("\n".join(lines))

    qdir = str(tmp_path / "quarantine")
    valid, quarantine = spans_from_jsonl(spark, str(feed), quarantine_path=qdir)
    assert sorted(r["spanID"] for r in valid.collect()) == ["s1", "s2"]
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert bad == sorted([lines[1], lines[2]])
    # quarantine_path got the same raw lines, appended as text
    requeued = sorted(r["value"] for r in spark.read.text(qdir).collect())
    assert requeued == bad


def test_traces_table_malformed_documents(spark):
    """Review regressions: spans missing tags/references fields (null
    after schema fill) must not null the trace's counts or mis-pick the
    root; an absent spans array falls back like an empty one; a root
    processID missing from the processes map labels the trace
    'unknown: <op>' instead of silently shortening the name."""
    from traceframe_spark.operators.traces import traces_table
    from traceframe_spark.schemas import RAW_TRACE_SCHEMA

    def span(sid, start, parent_refs, tags, pid="p1"):
        return {
            "traceID": "t1",
            "spanID": sid,
            "flags": 1,
            "operationName": f"/{sid}",
            "references": parent_refs,
            "startTime": start,
            "duration": 10,
            "tags": tags,
            "logs": [],
            "processID": pid,
            "warnings": None,
        }

    err = [{"key": "error", "type": "bool", "value": "true"}]
    docs = [
        {
            "traceID": "t1",
            # root at 100 has NULL references and NULL tags; the child at
            # 50 is EARLIER (clock skew) and carries the only error tag
            "spans": [
                span("root", 100, None, None),
                span("child", 50, [{"refType": "CHILD_OF", "traceID": "t1", "spanID": "root"}], err),
            ],
            "processes": {"p1": {"serviceName": "svc", "tags": []}},
            "warnings": None,
        },
        {"traceID": "t2", "spans": None, "processes": None, "warnings": None},
        {
            "traceID": "t3",
            # root's processID is absent from the processes map
            "spans": [span("r3", 7, [], [], pid="ghost")],
            "processes": {"p1": {"serviceName": "svc", "tags": []}},
            "warnings": None,
        },
    ]
    raw = spark.createDataFrame(docs, schema=RAW_TRACE_SCHEMA)
    rows = {r["traceID"]: r for r in traces_table(raw).collect()}
    # null-references root is recognized; error tag still counted
    assert rows["t1"]["traceName"] == "svc: /root"
    assert rows["t1"]["errspans"] == 1 and rows["t1"]["iserror"] is True
    # absent spans array: documented fallbacks, zero counts, not nulls
    assert rows["t2"]["traceName"] == "t2"
    assert rows["t2"]["nspans"] == 0 and rows["t2"]["errspans"] == 0
    assert rows["t2"]["iserror"] is False
    # unmapped processID labels loudly
    assert rows["t3"]["traceName"] == "unknown: /r3"
