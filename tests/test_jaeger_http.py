"""Jaeger HTTP connector: bisection/clipping logic against a fake server
(injected fetch — no network), plus the DataFrame ingest path."""

from __future__ import annotations

import pytest

from traceframe_spark.operators import spans_table, traces_table
from traceframe_spark.schemas import RAW_TRACE_SCHEMA
from traceframe_spark.sources.jaeger_http import (
    _clip_latest,
    get_traces,
    raw_traces_from_jaeger,
)

US = 1_000_000
T0 = 1_700_000_000 * US  # base time in µs


def make_trace(i: int, start_us: int) -> dict:
    tid = f"{i:016x}"
    return {
        "traceID": tid,
        "spans": [
            {
                "traceID": tid,
                "spanID": tid,
                "flags": 1,
                "operationName": "/op",
                "references": [],
                "startTime": start_us,
                "duration": 1000,
                "tags": [{"key": "http.method", "type": "string", "value": "GET"}],
                "logs": [],
                "processID": "p1",
                "warnings": None,
            }
        ],
        "processes": {"p1": {"serviceName": "svc", "tags": []}},
        "warnings": None,
    }


class FakeJaeger:
    """In-memory /api/traces with a result cap, like a Badger backend."""

    def __init__(self, traces: list[dict], cap: int):
        self.traces = sorted(traces, key=lambda t: t["spans"][0]["startTime"])
        self.cap = cap
        self.calls = 0

    def fetch(self, params: dict) -> list[dict]:
        self.calls += 1
        start = int(params.get("start", 0))
        end = int(params.get("end", 2**63 - 1))
        hits = [t for t in self.traces if start <= t["spans"][0]["startTime"] <= end]
        # server keeps an arbitrary subset when capped — model worst case:
        # drop the NEWEST to punish clients that trust a capped result
        return hits[: self.cap]

    def now_us(self) -> int:
        return T0 + 10_000 * US


def test_uncapped_fetch_no_recursion():
    srv = FakeJaeger([make_trace(i, T0 + i * US) for i in range(100)], cap=1500)
    out = get_traces("svc", fetch=srv.fetch, result_cap=1500, now_us=srv.now_us)
    assert len(out) == 100
    assert srv.calls == 1


def test_capped_fetch_bisects_and_recovers_all():
    n = 400
    srv = FakeJaeger([make_trace(i, T0 + i * US) for i in range(n)], cap=100)
    out = get_traces(
        "svc",
        fetch=srv.fetch,
        start=T0,
        end=T0 + n * US,
        result_cap=100,
        now_us=srv.now_us,
    )
    # bisection must recover far more than one capped page
    got = {t["traceID"] for t in out}
    assert len(got) == n  # every trace recovered despite the cap
    assert srv.calls > 4


def test_capped_fetch_with_limit_keeps_latest():
    n = 400
    srv = FakeJaeger([make_trace(i, T0 + i * US) for i in range(n)], cap=100)
    out = get_traces(
        "svc",
        fetch=srv.fetch,
        start=T0,
        end=T0 + n * US,
        limit=50,
        result_cap=100,
        now_us=srv.now_us,
    )
    assert len(out) == 50
    starts = sorted(t["spans"][0]["startTime"] for t in out)
    # deterministic latest-N: the 50 newest traces exactly
    assert starts == [T0 + i * US for i in range(n - 50, n)]


class FakeJaegerAnySpan(FakeJaeger):
    """Matches a trace when ANY span falls in the window (real Jaeger
    semantics) and honors the ``limit`` param (latest-N) — needed to
    model traces straddling the bisection midpoint."""

    def fetch(self, params: dict) -> list[dict]:
        self.calls += 1
        start = int(params.get("start", 0))
        end = int(params.get("end", 2**63 - 1))
        limit = int(params.get("limit", 10**9))
        hits = [
            t
            for t in self.traces
            if any(start <= s["startTime"] <= end for s in t["spans"])
        ]
        if len(hits) > self.cap:
            return hits[: self.cap]  # capped: worst case, drop the newest
        if len(hits) > limit:
            hits = hits[-limit:]  # honor limit: keep the latest N
        return hits


def test_straddling_traces_do_not_undershoot_limit():
    # Traces 150..199 straddle the midpoint (extra span in the newer
    # half); a remainder-based older-half ask double-counts them against
    # the limit and undershoots after the merge dedups. Full-limit ask
    # must recover exactly the 100 latest distinct traces.
    n, limit = 200, 100
    traces = [make_trace(i, T0 + i * US) for i in range(n)]
    for i in range(150, 200):
        t = traces[i]
        extra = dict(t["spans"][0])
        extra["spanID"] = t["traceID"] + "-b"
        extra["startTime"] = T0 + 300 * US
        t["spans"] = [t["spans"][0], extra]
    srv = FakeJaegerAnySpan(traces, cap=80)
    out = get_traces(
        "svc",
        fetch=srv.fetch,
        start=T0,
        end=T0 + 400 * US,
        limit=limit,
        result_cap=80,
        now_us=srv.now_us,
    )
    got = {t["traceID"] for t in out}
    assert len(out) == limit and len(got) == limit
    assert got == {f"{i:016x}" for i in range(100, 200)}


def test_clip_latest_is_deterministic():
    traces = [make_trace(i, T0 + (i % 7) * US) for i in range(20)]
    a = _clip_latest(list(traces), 5)
    b = _clip_latest(list(reversed(traces)), 5)
    assert [t["traceID"] for t in a] == [t["traceID"] for t in b]


def test_predicate_forwarding():
    seen = {}

    def spy(params):
        seen.update(params)
        return []

    get_traces(
        "svc",
        fetch=spy,
        operation="/checkout",
        tags={"error": "true"},
        min_duration_us=1000,
        max_duration_us=2_000_000,
        limit=7,
    )
    assert seen["service"] == "svc"
    assert seen["operation"] == "/checkout"
    assert seen["limit"] == 7
    assert "error" in seen["tags"]
    assert seen["minDuration"] == "1000us"
    assert seen["maxDuration"] == "2000000us"


def test_dataframe_ingest_roundtrip(spark):
    srv = FakeJaeger([make_trace(i, T0 + i * US) for i in range(25)], cap=1500)
    raw = raw_traces_from_jaeger(spark, "http://unused", "svc", fetch=srv.fetch)
    assert raw.count() == 25
    t = traces_table(raw)
    s = spans_table(raw)
    assert t.count() == 25
    assert s.count() == 25
    row = s.first()
    assert row["service"] == "svc"
    assert row["tags"]["http.method"] == "GET"


def test_fetch_traces_partitioned(spark):
    from traceframe_spark.sources.jaeger_http import (
        fetch_traces_partitioned,
        synthetic_fetch_factory,
    )

    raw = fetch_traces_partitioned(
        spark,
        "http://unused",
        "svc",
        start=T0,
        end=T0 + 1000 * US,
        n_buckets=8,
        fetch_factory=synthetic_fetch_factory(T0, 200, 5 * US),
    )
    # buckets partition the range; every trace fetched exactly once
    rows = raw.collect()
    ids = [r["traceID"] for r in rows]
    assert len(ids) == len(set(ids)) == 200


def test_multi_service_fetch(spark):
    from traceframe_spark.sources.jaeger_http import raw_traces_from_jaeger_services

    srv = FakeJaeger([make_trace(i, T0 + i * US) for i in range(10)], cap=1500)
    raw = raw_traces_from_jaeger_services(
        spark, "http://unused", ["svc-a", "svc-b"], fetch=srv.fetch
    )
    assert raw.count() == 20  # one copy per service, as in the reference
    assert srv.calls == 2
    import pytest

    with pytest.raises(ValueError):
        raw_traces_from_jaeger_services(spark, "http://unused", [], fetch=srv.fetch)


def test_http_and_file_ingest_agree_on_tag_values(spark, tmp_path):
    """The same trace ingested via HTTP fetch and via JSON file load must
    produce identical tags maps (VERDICT r1 §wrong-4: Python str() gave
    "True" where the Spark JSON scan gives "true")."""
    import json

    tid = "ab" * 8
    trace = {
        "traceID": tid,
        "spans": [
            {
                "traceID": tid,
                "spanID": tid,
                "flags": 1,
                "operationName": "/op",
                "references": [],
                "startTime": T0,
                "duration": 1000,
                "tags": [
                    {"key": "error", "type": "bool", "value": True},
                    {"key": "http.status_code", "type": "int64", "value": 500},
                    {"key": "sampler.param", "type": "float64", "value": 0.5},
                    {"key": "http.method", "type": "string", "value": "GET"},
                ],
                "logs": [],
                "processID": "p1",
                "warnings": None,
            }
        ],
        "processes": {
            "p1": {
                "serviceName": "svc",
                "tags": [{"key": "ip", "type": "string", "value": "10.0.0.1"},
                         {"key": "secure", "type": "bool", "value": False}],
            }
        },
        "warnings": None,
    }

    # HTTP path (fake fetch serving native-typed JSON values)
    srv = FakeJaeger([trace], cap=1500)
    via_http = raw_traces_from_jaeger(spark, "http://unused", "svc", fetch=srv.fetch)

    # file path (a Jaeger export: one JSON array, native JSON types)
    from traceframe_spark.sources.jaeger_file import read_raw_traces

    path = tmp_path / "export.json"
    path.write_text(json.dumps([trace]))
    via_file = read_raw_traces(spark, str(path))

    tags_http = spans_table(via_http).select("tags").first()["tags"]
    tags_file = spans_table(via_file).select("tags").first()["tags"]
    assert tags_http == tags_file
    assert tags_http["error"] == "true"
    assert tags_http["http.status_code"] == "500"
    assert tags_http["sampler.param"] == "0.5"
    assert tags_http["http.method"] == "GET"

    ptags_http = via_http.select("processes").first()["processes"]["p1"]["tags"]
    ptags_file = via_file.select("processes").first()["processes"]["p1"]["tags"]
    assert ptags_http == ptags_file


class _FakeResp:
    def __init__(self, status_code, payload):
        self.status_code = status_code
        self._payload = payload
        self.text = str(payload)

    def json(self):
        return self._payload


def test_known_services_injectable_get():
    from traceframe_spark.sources.jaeger_http import known_services

    calls = []

    def get(url, headers=None, timeout=None):
        calls.append((url, headers))
        return _FakeResp(200, {"data": ["frontend", "backend"]})

    got = known_services("http://j:16686", headers={"X-Auth": "t"}, get=get)
    assert got == ["frontend", "backend"]
    assert calls == [("http://j:16686/api/services", {"X-Auth": "t"})]


def test_known_services_null_data_and_error():
    import pytest

    from traceframe_spark.sources.jaeger_http import known_services

    # Jaeger's no-services answer is data: null -> normalized to []
    assert known_services("http://j", get=lambda *a, **k: _FakeResp(200, {"data": None})) == []
    with pytest.raises(RuntimeError, match="status 503"):
        known_services("http://j", get=lambda *a, **k: _FakeResp(503, {}))


def test_bisection_dedups_straddling_traces():
    """Jaeger matches a trace when ANY span lands in the window, so a
    trace straddling the bisection midpoint is returned by BOTH halves
    — the merge must dedup by traceID, not concatenate."""

    class AnySpanFake(FakeJaeger):
        def fetch(self, params: dict) -> list[dict]:
            self.calls += 1
            start = int(params.get("start", 0))
            end = int(params.get("end", 2**63 - 1))
            hits = [
                t
                for t in self.traces
                if any(start <= s["startTime"] <= end for s in t["spans"])
            ]
            return hits[: self.cap]

    traces = [make_trace(i, T0 + i * US) for i in range(10)]
    strad = make_trace(99, T0)
    strad["spans"].append(
        {**strad["spans"][0], "spanID": "straddle2", "startTime": T0 + 9 * US}
    )
    traces.append(strad)
    fake = AnySpanFake(traces, cap=6)
    got = get_traces(
        "svc",
        fetch=fake.fetch,
        start=T0,
        end=T0 + 9 * US,
        result_cap=6,
        now_us=fake.now_us,
    )
    ids = [t["traceID"] for t in got]
    assert len(ids) == len(set(ids)), f"duplicated traces: {ids}"
    assert set(ids) == {t["traceID"] for t in traces}


def test_fetch_traces_partitioned_degenerate_range(spark):
    """start >= end must yield an empty RAW_TRACE_SCHEMA frame, not a
    schema-inference crash on an empty seed list."""
    from traceframe_spark.sources.jaeger_http import fetch_traces_partitioned

    df = fetch_traces_partitioned(
        spark, "http://unused:16686", "svc", start=1000, end=1000, n_buckets=4
    )
    assert df.count() == 0
    assert df.schema == RAW_TRACE_SCHEMA
