"""Critical-path kernel parity tests.

Pins the golden behavior from the reference suite
(``/root/reference/test/test_traceframe.py:8-81,104-109``): the 4-span
trace b6b80525a332cb6b yields exactly 5 segments with exact start/duration
/attribution — including the "parent resumes between children" double
segment for /GetCart and the recommendation tail.
"""

from __future__ import annotations

import pytest

from traceframe_spark import (
    SPAN_SCHEMA,
    critical_path_segments,
    critical_segments_of_trace,
)

# (traceID, spanID, operationName, startTime µs, duration µs, processID, parent, service)
GOLDEN_SPANS = [
    ("b6b80525a332cb6b", "b6b80525a332cb6b", "/cart", 1639415450569000, 291000, "p1", "", "frontend"),
    ("b6b80525a332cb6b", "69dc17050f4c2221", "/GetCart", 1639415450627000, 162000, "p2", "b6b80525a332cb6b", "cartservice"),
    ("b6b80525a332cb6b", "23890e1f876db993", "/GetRecommendations", 1639415450631000, 169000, "p3", "b6b80525a332cb6b", "recommendationservice"),
    ("b6b80525a332cb6b", "ee567b37267317a7", "/GetProducts", 1639415450752000, 6000, "p4", "23890e1f876db993", "productcatalogservice"),
]

# Expected ordered (seg_start, seg_duration, attributed spanID)
# — FIXTURES.md §C / reference golden JSON.
GOLDEN_SEGMENTS = [
    (1639415450569000, 58000, "b6b80525a332cb6b"),  # /cart pre-call
    (1639415450627000, 131000, "69dc17050f4c2221"),  # /GetCart leg 1
    (1639415450758000, 31000, "69dc17050f4c2221"),  # /GetCart resumes
    (1639415450789000, 11000, "23890e1f876db993"),  # /GetRecommendations tail
    (1639415450800000, 60000, "b6b80525a332cb6b"),  # /cart post-return
]


def _span_dicts():
    keys = ["traceID", "spanID", "operationName", "startTime", "duration", "processID", "parent", "service"]
    return [dict(zip(keys, row)) for row in GOLDEN_SPANS]


def _spans_df(spark):
    rows = [
        {
            "traceID": t,
            "spanID": s,
            "flags": 1,
            "operationName": op,
            "startTime": st,
            "duration": d,
            "logs": [],
            "processID": pid,
            "warnings": None,
            "service": svc,
            "parent": par,
            "tags": {},
        }
        for (t, s, op, st, d, pid, par, svc) in GOLDEN_SPANS
    ]
    return spark.createDataFrame(rows, schema=SPAN_SCHEMA)


def test_golden_pure_python_kernel():
    segs = critical_segments_of_trace(_span_dicts())
    assert [(st, d, s["spanID"]) for st, d, s in segs] == GOLDEN_SEGMENTS
    # Full span payload of the first segment matches the golden JSON fields.
    first = segs[0][2]
    assert first == {
        "traceID": "b6b80525a332cb6b",
        "spanID": "b6b80525a332cb6b",
        "operationName": "/cart",
        "startTime": 1639415450569000,
        "duration": 291000,
        "processID": "p1",
        "parent": "",
        "service": "frontend",
    }


def test_golden_spark_operator(spark):
    out = critical_path_segments(_spans_df(spark)).orderBy("seg_index").collect()
    assert [(r["seg_start"], r["seg_duration"], r["spanID"]) for r in out] == GOLDEN_SEGMENTS
    # Attribution metadata survives the kernel.
    assert [r["service"] for r in out] == [
        "frontend",
        "cartservice",
        "cartservice",
        "recommendationservice",
        "frontend",
    ]
    assert [r["seg_index"] for r in out] == [0, 1, 2, 3, 4]


def test_segments_partition_root_duration():
    """Sum of critical segments equals the root span's duration exactly."""
    segs = critical_segments_of_trace(_span_dicts())
    assert sum(d for _, d, _ in segs) == 291000
    # Segments are contiguous and non-overlapping.
    for (s1, d1, _), (s2, _, _) in zip(segs, segs[1:]):
        assert s1 + d1 <= s2


def test_empty_trace_raises():
    with pytest.raises(ValueError):
        critical_segments_of_trace([])


def test_single_span_trace():
    segs = critical_segments_of_trace(
        [
            {
                "traceID": "t",
                "spanID": "a",
                "operationName": "op",
                "startTime": 1_700_000_000_000_000,
                "duration": 1000,
                "processID": "p1",
                "parent": "",
                "service": "svc",
            }
        ]
    )
    assert [(st, d, s["spanID"]) for st, d, s in segs] == [(1_700_000_000_000_000, 1000, "a")]


def test_missing_parent_does_not_crash():
    """Broken trace (orphan child referencing an absent parent) still sweeps."""
    segs = critical_segments_of_trace(
        [
            {
                "traceID": "t",
                "spanID": "root",
                "operationName": "op",
                "startTime": 1_700_000_000_000_000,
                "duration": 10_000,
                "processID": "p1",
                "parent": "",
                "service": "svc",
            },
            {
                "traceID": "t",
                "spanID": "orphan",
                "operationName": "op2",
                "startTime": 1_700_000_000_002_000,
                "duration": 1_000,
                "processID": "p1",
                "parent": "ghost",
                "service": "svc",
            },
        ]
    )
    assert len(segs) >= 1
