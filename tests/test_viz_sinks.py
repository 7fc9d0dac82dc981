"""Presentation layer + sinks."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from traceframe_spark import (
    sinks,
    spans_from_jaeger_file,
    trace_with_spans,
    traces_from_jaeger_file,
    viz,
)


def test_pretty_duration():
    assert viz.pretty_duration(datetime.timedelta(microseconds=291000)) == "291ms"
    # whole seconds are NOT dropped (reference quirk fixed)
    assert viz.pretty_duration(datetime.timedelta(seconds=2, microseconds=500000)) == "2500ms"
    assert viz.pretty_duration(291000) == "291ms"


def test_pretty_trace_table(spark, jaeger_json_path):
    page = traces_from_jaeger_file(spark, jaeger_json_path).limit(5).toPandas()
    html = viz.pretty_trace_table("http://jaeger:16686", page).to_html()
    assert "http://jaeger:16686/trace/" in html
    assert "iserror" not in html
    assert "ms</td>" in html


def test_single_trace_figure_data(spark, jaeger_json_path):
    dfT = traces_from_jaeger_file(spark, jaeger_json_path)
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    tid = dfT.first()["traceID"]
    trace = trace_with_spans(dfT, dfS, tid)
    fig = viz.show_single_trace(trace)  # no holoviews here → raw data
    assert fig["traceID"] == tid
    assert len(fig["spans"]) == trace["nspans"]
    assert len(fig["critical"]) >= 1
    # call and return edges for every non-root span
    non_root = sum(1 for s in trace["spans"] if s["parent"])
    assert len(fig["calls"]) == non_root
    assert len(fig["returns"]) == non_root
    # critical overlay stays within the span timeline
    tmin = min(s["start"] for s in fig["spans"])
    tmax = max(s["end"] for s in fig["spans"])
    for c in fig["critical"]:
        assert tmin <= c["start"] <= c["end"] <= tmax


def test_span_sink_roundtrip(spark, jaeger_json_path, tmp_path):
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    path = str(tmp_path / "spans_pq")
    sinks.write_spans(dfS, path, n_buckets=8)
    back = sinks.read_spans(spark, path)
    assert back.count() == 420
    assert sorted(back.columns) == sorted(dfS.columns)
    # values survive the roundtrip (spot-check one trace)
    tid = dfS.first()["traceID"]
    a = {r["spanID"] for r in dfS.filter(F.col("traceID") == tid).collect()}
    b = {r["spanID"] for r in back.filter(F.col("traceID") == tid).collect()}
    assert a == b


def test_traces_sink_roundtrip(spark, jaeger_json_path, tmp_path):
    dfT = traces_from_jaeger_file(spark, jaeger_json_path)
    path = str(tmp_path / "traces_pq")
    sinks.write_traces(dfT, path)
    back = spark.read.parquet(path)
    assert back.count() == 100
