"""OTLP/JSON source tests: a hand-built ExportTraceServiceRequest
document (protobuf-JSON encoding: nano timestamps and int64 attribute
values as decimal strings, enums both numeric and symbolic) must land in
the canonical span/trace tables and compose with the critical-path
kernel unchanged."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traceframe_spark.sources.otlp import (  # noqa: E402
    spans_from_otlp_file,
    traces_from_otlp_file,
)

BASE_NS = 1_700_000_000_000_000_000


def _kv(key, **value):
    return {"key": key, "value": value}


def _span(trace, span, parent, name, start_ns, end_ns, attrs=(), status=None):
    doc = {
        "traceId": trace,
        "spanId": span,
        "name": name,
        "kind": 2,
        "startTimeUnixNano": str(start_ns),
        "endTimeUnixNano": str(end_ns),
        "attributes": list(attrs),
    }
    if parent:
        doc["parentSpanId"] = parent
    if status:
        doc["status"] = status
    return doc


def _export_doc():
    frontend = {
        "resource": {
            "attributes": [
                _kv("service.name", stringValue="frontend"),
                _kv("host.name", stringValue="node-1"),
            ]
        },
        "scopeSpans": [
            {
                "scope": {"name": "otel-sdk"},
                "spans": [
                    _span(
                        "ABCD00000000000000000000000000EF",
                        "AA00000000000001",
                        None,
                        "/checkout",
                        BASE_NS,
                        BASE_NS + 2_000_000_000,  # 2s
                        attrs=[
                            _kv("http.status_code", intValue="500"),
                            _kv("retry", boolValue=True),
                            _kv("sample.rate", doubleValue=0.25),
                        ],
                        status={"code": "STATUS_CODE_ERROR", "message": "boom"},
                    )
                ],
            }
        ],
    }
    backend = {
        "resource": {
            "attributes": [
                _kv("service.name", stringValue="payments"),
                _kv("host.name", stringValue="node-2"),
            ]
        },
        "scopeSpans": [
            {
                "scope": {"name": "otel-sdk"},
                "spans": [
                    _span(
                        "abcd00000000000000000000000000ef",
                        "bb00000000000002",
                        "aa00000000000001",
                        "/charge",
                        BASE_NS + 500_000_000,
                        BASE_NS + 1_500_000_000,  # 1s inside the root
                        status={"code": 2},  # numeric enum form
                    ),
                    _span(
                        "1111000000000000000000000000aaaa",
                        "cc00000000000003",
                        None,
                        "/health",
                        BASE_NS,
                        BASE_NS + 1_000_000,  # 1ms, ok
                    ),
                ],
            }
        ],
    }
    return {"resourceSpans": [frontend, backend]}


def _write(tmp_path) -> str:
    p = str(tmp_path / "otlp.json")
    with open(p, "w") as f:
        json.dump(_export_doc(), f)
    return p


def test_otlp_span_table_canonical(spark, tmp_path):
    spans = spans_from_otlp_file(spark, _write(tmp_path))
    rows = {r["spanID"]: r for r in spans.collect()}
    assert set(rows) == {"aa00000000000001", "bb00000000000002", "cc00000000000003"}

    root = rows["aa00000000000001"]
    assert root["traceID"] == "abcd00000000000000000000000000ef"  # lowercased
    assert root["service"] == "frontend"
    assert root["parent"] == ""
    assert root["operationName"] == "/checkout"
    assert root["startTime"] == BASE_NS // 1000
    assert root["duration"] == 2_000_000  # µs
    # attribute value rendering across the AnyValue oneof + error status
    assert root["tags"]["http.status_code"] == "500"
    assert root["tags"]["retry"] == "true"
    assert root["tags"]["sample.rate"] == "0.25"
    assert root["tags"]["error"] == "true"

    child = rows["bb00000000000002"]
    assert child["parent"] == "aa00000000000001"
    assert child["service"] == "payments"
    assert child["tags"]["error"] == "true"  # numeric status code form
    assert rows["cc00000000000003"]["tags"].get("error") is None


def test_otlp_traces_table(spark, tmp_path):
    traces = {r["traceID"]: r for r in traces_from_otlp_file(spark, _write(tmp_path)).collect()}
    assert set(traces) == {
        "abcd00000000000000000000000000ef",
        "1111000000000000000000000000aaaa",
    }
    err = traces["abcd00000000000000000000000000ef"]
    assert err["nspans"] == 2 and err["errspans"] == 2 and bool(err["iserror"])
    assert err["traceName"] == "frontend: /checkout"
    ok = traces["1111000000000000000000000000aaaa"]
    assert ok["nspans"] == 1 and ok["errspans"] == 0 and not bool(ok["iserror"])


def test_otlp_span_stream(spark, tmp_path):
    """The streaming reader yields the same canonical rows as the batch
    reader over a JSONL feed directory (one export doc per line)."""
    from traceframe_spark.sources.otlp import span_stream_from_otlp

    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "part-0.jsonl", "w") as f:
        f.write(json.dumps(_export_doc()) + "\n")

    stream = span_stream_from_otlp(spark, str(feed), max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("otlp_stream_spans")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    rows = {r["spanID"]: r for r in spark.sql("SELECT * FROM otlp_stream_spans").collect()}
    assert set(rows) == {"aa00000000000001", "bb00000000000002", "cc00000000000003"}
    assert rows["aa00000000000001"]["tags"]["error"] == "true"
    assert rows["bb00000000000002"]["parent"] == "aa00000000000001"


def test_otlp_feeds_critical_path(spark, tmp_path):
    from traceframe_spark.operators.critical_path import critical_path_segments

    spans = spans_from_otlp_file(spark, _write(tmp_path))
    segs = critical_path_segments(spans).collect()
    by_trace = {}
    for s in segs:
        by_trace.setdefault(s["traceID"], []).append(s)
    # root(2s) with one 1s child in the middle -> 3 segments: root lead-in,
    # child, root tail
    err_segs = sorted(
        by_trace["abcd00000000000000000000000000ef"], key=lambda s: s["seg_index"]
    )
    assert [s["spanID"] for s in err_segs] == [
        "aa00000000000001",
        "bb00000000000002",
        "aa00000000000001",
    ]
    assert [s["seg_duration"] for s in err_segs] == [500_000, 1_000_000, 500_000]
    assert len(by_trace["1111000000000000000000000000aaaa"]) == 1
