"""Critical-path extraction over span trees.

The algorithm is the single-timeline sweep described in *Distributed
Tracing in Practice* (Austin Parker et al., O'Reilly 2020, p.160), the
same one the reference implements eagerly for one trace at a time
(``/root/reference/traceframe/traceframe.py:555-617``; golden behavior
pinned by ``test/test_traceframe.py:8-81,104-109``).

Semantics: walk Call/Return events in time order, tracking which span
currently "leads" (owns the wall-clock). Time intervals are attributed to
exactly one span each, so the emitted segments partition the root span's
duration into the chain of spans that were actually blocking progress —
the critical path.

Execution model: the sweep is inherently sequential *per trace* but
embarrassingly parallel *across traces*, so the Spark operator is
``spans.groupBy("traceID").applyInPandas(kernel)`` — one shuffle on
traceID, Arrow-batched exchange, then pure-Python sweeps over tiny
per-trace groups. At 100 TB this scales linearly with executor count;
traceID is a high-cardinality hash-friendly key so skew is bounded by the
largest single trace, not by data volume.

Determinism (SURVEY.md §7.1): the reference sorts events only by timestamp
and relies on Python's stable sort + input order for ties. After a Spark
shuffle input order is gone, so events sort by the total key
``(time, is_return_first, spanID)`` — at equal timestamps Returns precede
Calls (a parent is released before a sibling starts) and spanID breaks the
remaining ties. Byte-identical to the reference on tie-free data (the
golden fixture has no equal timestamps).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

from traceframe_spark.schemas import CRITSEG_SCHEMA

# Span columns the kernel needs; extra input columns are ignored.
_KERNEL_COLS = [
    "traceID",
    "spanID",
    "operationName",
    "startTime",
    "duration",
    "processID",
    "parent",
    "service",
]


def critical_segments_of_trace(spans: list[dict[str, Any]]) -> list[tuple[int, int, dict[str, Any]]]:
    """Sweep one trace's spans; return ordered ``(seg_start, seg_duration, span)``.

    Pure-Python single-trace kernel, also usable directly on collected rows
    (parity with reference ``get_critical_segments``). Raises on empty
    input like the reference (``traceframe.py:560-561``).
    """
    if not spans:
        raise ValueError("critical path of an empty span set is undefined")

    span_by_id: dict[str, dict[str, Any]] = {}
    events: list[tuple[int, int, str, dict[str, Any]]] = []
    for s in spans:
        span_by_id[s["spanID"]] = s
        end = s["startTime"] + s["duration"]
        # sort key: (time, kind, spanID); kind 0 = Return, 1 = Call so
        # simultaneous Return/Call pairs release the parent first.
        events.append((s["startTime"], 1, s["spanID"], s))
        events.append((end, 0, s["spanID"], s))
    events.sort(key=lambda e: (e[0], e[1], e[2]))

    # in_flight[spanID] = ordered child spanIDs that have Called but not
    # yet Returned; key "" collects roots.
    in_flight: dict[str, list[str]] = {}
    segments: list[tuple[int, int, dict[str, Any]]] = []
    stack: list[dict[str, Any]] = []

    # The earliest event's span leads first; clock starts at its start.
    leader = events[0][3]
    clock = leader["startTime"]

    for when, kind, _, span in events:
        parent = span["parent"]
        if kind == 1:  # Call
            if leader["spanID"] == parent and not in_flight.get(parent):
                # The leader was idle and now hands off to this child:
                # close the open interval, attributed to the parent.
                if parent:
                    segments.append((clock, when - clock, span_by_id[parent]))
                    stack.append(leader)
                    leader = span
                clock = when
            in_flight.setdefault(parent, []).append(span["spanID"])
        else:  # Return
            in_flight[parent].remove(span["spanID"])
            if not in_flight.get(leader["spanID"]):
                # The leader just became unblocked-or-done: the interval
                # since `clock` belonged to it.
                segments.append((clock, when - clock, leader))
                clock = when
                # Unwind ancestors that are also done waiting...
                while not in_flight.get(leader["spanID"]) and stack:
                    leader = stack.pop()
                # ...or descend into the leader's oldest live child.
                live = in_flight.get(leader["spanID"])
                if live:
                    stack.append(leader)
                    child = span_by_id.get(live[0])
                    if child is not None:
                        leader = child
    return segments


def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: spans of ONE trace → critical segment rows."""
    spans = pdf[_KERNEL_COLS].to_dict(orient="records")
    segs = critical_segments_of_trace(spans)
    out = {
        "traceID": [s["traceID"] for _, _, s in segs],
        "seg_index": list(range(len(segs))),
        "seg_start": [start for start, _, _ in segs],
        "seg_duration": [dur for _, dur, _ in segs],
        "spanID": [s["spanID"] for _, _, s in segs],
        "operationName": [s["operationName"] for _, _, s in segs],
        "span_start": [s["startTime"] for _, _, s in segs],
        "span_duration": [s["duration"] for _, _, s in segs],
        "processID": [s["processID"] for _, _, s in segs],
        "parent": [s["parent"] for _, _, s in segs],
        "service": [s["service"] for _, _, s in segs],
    }
    return pd.DataFrame(out)


def critical_path_segments(spans: DataFrame) -> DataFrame:
    """Critical path for EVERY trace in a span table, in one distributed pass.

    Input: canonical span table (SPAN_SCHEMA; extra columns tolerated).
    Output: CRITSEG_SCHEMA rows, ``seg_index`` giving the in-trace order.

    The batch shape the reference only reaches in its test
    (``test_traceframe.py:146-155``: pandas groupby → per-group kernel)
    is here the operator itself.
    """
    needed = [c for c in _KERNEL_COLS if c in spans.columns]
    missing = set(_KERNEL_COLS) - set(needed)
    if missing:
        raise ValueError(f"span table missing kernel columns: {sorted(missing)}")
    return (
        spans.select(*_KERNEL_COLS)
        .groupBy("traceID")
        .applyInPandas(_kernel, schema=CRITSEG_SCHEMA)
    )
