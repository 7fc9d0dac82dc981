"""Service dependency graph + operation stats on the reference fixture
(100 traces / 420 spans / 10 boutique-demo services)."""

from __future__ import annotations

from pyspark.sql import functions as F

from traceframe_spark import spans_from_jaeger_file
from traceframe_spark.operators.analytics import operation_stats, service_dependencies


def test_service_dependencies_fixture(spark, jaeger_json_path):
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    edges = service_dependencies(dfS).collect()
    by_edge = {(r["parent_service"], r["child_service"]): r for r in edges}
    # no self-edges by construction
    assert all(p != c for p, c in by_edge)
    # the boutique demo: frontend fans out to backends
    frontend_out = {c for (p, c) in by_edge if p == "frontend"}
    assert len(frontend_out) >= 3, frontend_out
    # every edge's call count is positive and error calls never exceed calls
    for r in edges:
        assert 0 < r["n_calls"]
        assert 0 <= r["n_error_calls"] <= r["n_calls"]
    # cross-check one edge against a direct count
    (p, c), r = next(iter(by_edge.items()))
    direct = (
        dfS.alias("ch")
        .filter(F.col("ch.parent") != "")
        .join(
            dfS.alias("pa"),
            (F.col("ch.traceID") == F.col("pa.traceID"))
            & (F.col("ch.parent") == F.col("pa.spanID")),
        )
        .filter((F.col("pa.service") == p) & (F.col("ch.service") == c))
        .count()
    )
    assert r["n_calls"] == direct


def test_operation_stats_fixture(spark, jaeger_json_path):
    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    stats = operation_stats(dfS).collect()
    assert sum(r["n_spans"] for r in stats) == 420
    for r in stats:
        assert r["p50_us"] <= r["p95_us"] <= r["p99_us"]
        assert 0.0 <= r["error_rate"] <= 1.0
    # the checkout error trace shows up as frontend /checkout errors
    fe = {r["operationName"]: r for r in stats if r["service"] == "frontend"}
    assert "/checkout" in fe
    assert fe["/checkout"]["n_errors"] >= 1
    # approx path agrees on counts and is within 20% on p95
    approx = {(r["service"], r["operationName"]): r for r in operation_stats(dfS, approx=True).collect()}
    for r in stats:
        a = approx[(r["service"], r["operationName"])]
        assert a["n_spans"] == r["n_spans"]
        if r["p95_us"]:
            assert abs(a["p95_us"] - r["p95_us"]) <= 0.2 * r["p95_us"] + 1


def test_critical_path_breakdown(spark, jaeger_json_path):
    from traceframe_spark.operators.analytics import critical_path_breakdown

    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    rows = critical_path_breakdown(dfS).collect()
    shares = [r["share"] for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-9
    assert shares == sorted(shares, reverse=True)  # ordered by contribution
    # every trace contributes >=1 segment, so total segments >= 100
    assert sum(r["n_segments"] for r in rows) >= 100
    # the fixture's dominant critical-path service (pinned): NOT the
    # frontend — recommendationservice blocks the most wall-clock, which
    # is exactly the non-obvious fact this operator surfaces
    assert rows[0]["service"] == "recommendationservice"


def test_search_traces(spark, jaeger_json_path):
    """The search params the reference rejects as UNIMPLEMENTED
    (operation, tags, durations) all work engine-side."""
    from traceframe_spark.operators.search import search_traces

    dfS = spans_from_jaeger_file(spark, jaeger_json_path)

    # tag search: the error tag finds the checkout trace
    hits = search_traces(dfS, tags={"error": "true"}).collect()
    assert any(r["traceID"] == "55f80c17b6ab82ec" for r in hits)

    # service+operation search
    hits = search_traces(dfS, service="frontend", operation="/checkout").collect()
    assert {r["root_operation"] for r in hits} == {"/checkout"}
    assert all(r["root_service"] == "frontend" for r in hits)

    # duration band on the root span
    hits = search_traces(dfS, service="frontend", min_duration_us=500_000).collect()
    assert hits and all(r["duration_us"] >= 500_000 for r in hits)

    # newest-first and limited
    hits = search_traces(dfS, limit=5)
    rows = hits.collect()
    assert len(rows) == 5
    starts = [r["start_us"] for r in rows]
    assert starts == sorted(starts, reverse=True)
