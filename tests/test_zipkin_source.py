"""Zipkin v2 source tests: a hand-built ListOfSpans document (the
POST /api/v2/spans payload shape) must land in the canonical span/trace
tables, tolerate mixed-case ids / missing endpoints / shared spans, and
compose with the critical-path kernel unchanged."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traceframe_spark.sources.zipkin import (  # noqa: E402
    span_stream_from_zipkin,
    spans_from_zipkin_file,
    traces_from_zipkin_file,
)

BASE_US = 1_700_000_000_000_000


def _spans():
    return [
        {
            "traceId": "ABCD00000000000000000000000000EF",  # mixed case, 128-bit
            "id": "AA00000000000001",
            "name": "/checkout",
            "kind": "SERVER",
            "timestamp": BASE_US,
            "duration": 50_000,
            "debug": True,
            "localEndpoint": {"serviceName": "frontend", "ipv4": "10.0.0.1", "port": 8080},
            "annotations": [{"timestamp": BASE_US + 10, "value": "ws"}],
            "tags": {"http.method": "POST", "error": "true"},
        },
        {
            "traceId": "abcd00000000000000000000000000ef",
            "id": "aa00000000000002",
            "parentId": "AA00000000000001",
            "name": "charge",
            "kind": "CLIENT",
            "timestamp": BASE_US + 5_000,
            "duration": 30_000,
            "localEndpoint": {"serviceName": "payments", "ipv4": "10.0.0.2"},
            "tags": {"currency": "usd"},
        },
        {
            # second trace: no endpoint, no tags, no duration — all optional
            "traceId": "1111111111111111",
            "id": "bb00000000000001",
            "name": "ping",
            "timestamp": BASE_US + 100,
        },
    ]


def _write(tmp_path, multiline=True):
    p = tmp_path / ("zipkin.json" if multiline else "zipkin.jsonl")
    if multiline:
        p.write_text(json.dumps(_spans()))
    else:
        p.write_text("\n".join(json.dumps(s) for s in _spans()))
    return str(p)


def test_zipkin_span_table_canonical(spark, tmp_path):
    df = spans_from_zipkin_file(spark, _write(tmp_path))
    rows = {r["spanID"]: r for r in df.collect()}
    assert set(rows) == {"aa00000000000001", "aa00000000000002", "bb00000000000001"}

    root = rows["aa00000000000001"]
    assert root["traceID"] == "abcd00000000000000000000000000ef"  # lowercased
    assert root["parent"] == ""
    assert root["service"] == "frontend"
    assert root["processID"] == "zipkin:frontend"
    assert root["startTime"] == BASE_US and root["duration"] == 50_000
    assert root["flags"] == 1  # debug
    assert root["tags"]["error"] == "true"
    assert root["tags"]["span.kind"] == "server"
    assert json.loads(root["logs"][0])["value"] == "ws"

    child = rows["aa00000000000002"]
    assert child["parent"] == "aa00000000000001"  # parent id lowercased
    assert child["service"] == "payments"
    assert child["flags"] == 0

    bare = rows["bb00000000000001"]
    assert bare["service"] == "unknown"
    assert bare["duration"] == 0
    assert bare["tags"] == {}  # no tags, null kind -> empty map, not null


def test_zipkin_shared_span_disambiguation(spark, tmp_path):
    """A dump carrying BOTH halves of an RPC (client span + shared=true
    server span reusing the same id) must yield unique spanIDs, with the
    server half parented on the client half — not a duplicate key that
    double-counts in regroup / critical-path kernels."""
    both_halves = [
        {
            "traceId": "2222222222222222",
            "id": "cc00000000000001",
            "name": "/api",
            "kind": "CLIENT",
            "timestamp": BASE_US,
            "duration": 40_000,
            "localEndpoint": {"serviceName": "gateway"},
        },
        {
            "traceId": "2222222222222222",
            "id": "CC00000000000001",  # same id, server half
            "parentId": "dd00000000000009",  # ignored for shared spans
            "name": "/api",
            "kind": "SERVER",
            "shared": True,
            "timestamp": BASE_US + 2_000,
            "duration": 35_000,
            "localEndpoint": {"serviceName": "backend"},
        },
    ]
    p = tmp_path / "shared.json"
    p.write_text(json.dumps(both_halves))
    rows = {r["spanID"]: r for r in spans_from_zipkin_file(spark, str(p)).collect()}
    # shared half gets a synthetic 16-hex id (endpoint + timestamp hashed
    # in, so even same-endpoint re-records at different instants diverge)
    import hashlib

    shared_id = hashlib.md5(
        f"cc00000000000001#backend###{BASE_US + 2_000}".encode()
    ).hexdigest()[:16]
    assert set(rows) == {"cc00000000000001", shared_id}
    server = rows[shared_id]
    assert len(shared_id) == 16  # keeps the 16-hex spanID shape
    assert server["parent"] == "cc00000000000001"  # client half, not parentId
    assert server["service"] == "backend"
    assert rows["cc00000000000001"]["parent"] == ""
    # traces table sees 2 distinct spans, one trace
    t = traces_from_zipkin_file(spark, str(p)).collect()
    assert len(t) == 1 and t[0]["nspans"] == 2


def test_zipkin_two_shared_halves_stay_distinct(spark, tmp_path):
    """Edge case the fixed-suffix scheme got wrong: a dump with TWO
    shared=true halves for ONE id (multi-hop proxy / duplicated server
    records from distinct endpoints) must still produce unique spanIDs —
    the endpoint is hashed into the synthetic id."""
    spans = [
        {
            "traceId": "3333333333333333",
            "id": "ee00000000000001",
            "name": "/hop",
            "kind": "CLIENT",
            "timestamp": BASE_US,
            "duration": 50_000,
            "localEndpoint": {"serviceName": "edge"},
        },
        {
            "traceId": "3333333333333333",
            "id": "ee00000000000001",
            "name": "/hop",
            "kind": "SERVER",
            "shared": True,
            "timestamp": BASE_US + 1_000,
            "duration": 48_000,
            "localEndpoint": {"serviceName": "proxy"},
        },
        {
            "traceId": "3333333333333333",
            "id": "ee00000000000001",
            "name": "/hop",
            "kind": "SERVER",
            "shared": True,
            "timestamp": BASE_US + 2_000,
            "duration": 45_000,
            "localEndpoint": {"serviceName": "origin"},
        },
    ]
    p = tmp_path / "twoshared.json"
    p.write_text(json.dumps(spans))
    rows = {r["spanID"]: r for r in spans_from_zipkin_file(spark, str(p)).collect()}
    assert len(rows) == 3  # three unique spanIDs, no double-counting
    shared_ids = {k for k, r in rows.items() if r["service"] in ("proxy", "origin")}
    assert len(shared_ids) == 2
    for sid in shared_ids:
        assert len(sid) == 16 and all(c in "0123456789abcdef" for c in sid)
        assert rows[sid]["parent"] == "ee00000000000001"


def test_zipkin_jsonl_matches_array_form(spark, tmp_path):
    a = spans_from_zipkin_file(spark, _write(tmp_path, multiline=True))
    b = spans_from_zipkin_file(spark, _write(tmp_path, multiline=False), multiline=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zipkin_traces_table(spark, tmp_path):
    t = traces_from_zipkin_file(spark, _write(tmp_path))
    rows = {r["traceID"]: r for r in t.collect()}
    assert len(rows) == 2
    big = rows["abcd00000000000000000000000000ef"]
    assert big["nspans"] == 2
    assert big["errspans"] == 1 and bool(big["iserror"])
    assert big["traceName"] == "frontend: /checkout"


def test_zipkin_span_stream(spark, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    (d / "part1.json").write_text("\n".join(json.dumps(s) for s in _spans()))
    stream = span_stream_from_zipkin(spark, str(d))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("zipkin_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "streaming query timed out after 600s"
    got = spark.sql("select * from zipkin_stream_test").collect()
    assert len(got) == 3
    assert {r["service"] for r in got} == {"frontend", "payments", "unknown"}


def test_zipkin_feeds_critical_path(spark, tmp_path):
    from traceframe_spark.operators import critical_path_segments

    spans = spans_from_zipkin_file(spark, _write(tmp_path))
    segs = critical_path_segments(
        spans.filter("traceID = 'abcd00000000000000000000000000ef'")
    ).collect()
    assert len(segs) >= 2  # parent-child split yields >= 2 segments
    total = sum(s["seg_duration"] for s in segs)
    assert total == 50_000  # critical path covers the root span exactly
