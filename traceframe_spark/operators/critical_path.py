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
embarrassingly parallel *across traces*. The operator hash-partitions by
traceID, sorts each partition by traceID, and streams Arrow batches
through ``mapInPandas`` with a group-break on traceID change (traces are
contiguous after the sort, so only the tail trace is buffered across
batch boundaries). This is deliberately NOT ``groupBy().applyInPandas``:
that pays per-group pandas-frame overhead, which at millions of ~5-span
traces dominates runtime (measured 80 s → 3 s at sf0.1 for this switch).
At 100 TB this scales linearly with executor count; traceID is a
high-cardinality hash-friendly key so skew is bounded by the largest
single trace, not by data volume.

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
    # event: (time, order, spanID, is_call, span). order 0 = Return,
    # 1 = Call, so simultaneous cross-span Return/Call pairs release the
    # parent first. EXCEPT zero-duration spans: both their events share
    # one timestamp, and Return-before-own-Call would remove an
    # in_flight entry that was never added (KeyError). Their pair gets
    # orders (-2, -1): the Call still precedes its own Return, and the
    # blip resolves before the normal Return/Call traffic at that
    # instant.
    events: list[tuple[int, int, str, bool, dict[str, Any]]] = []
    for s in spans:
        span_by_id[s["spanID"]] = s
        end = s["startTime"] + s["duration"]
        if s["duration"] == 0:
            call_order, ret_order = -2, -1
        else:
            call_order, ret_order = 1, 0
        events.append((s["startTime"], call_order, s["spanID"], True, s))
        events.append((end, ret_order, s["spanID"], False, s))
    events.sort(key=lambda e: (e[0], e[1], e[2]))

    # in_flight[spanID] = ordered child spanIDs that have Called but not
    # yet Returned; key "" collects roots.
    in_flight: dict[str, list[str]] = {}
    segments: list[tuple[int, int, dict[str, Any]]] = []
    stack: list[dict[str, Any]] = []

    # The earliest event's span leads first; clock starts at its start.
    leader = events[0][4]
    clock = leader["startTime"]

    for when, _order, _, is_call, span in events:
        parent = span["parent"]
        if is_call:  # Call
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


class _SegBuffer:
    """Columnar accumulator for output segments, flushed per Arrow batch."""

    def __init__(self) -> None:
        self.cols: dict[str, list] = {f.name: [] for f in CRITSEG_SCHEMA.fields}

    def add_trace(self, segs: list[tuple[int, int, dict[str, Any]]]) -> None:
        c = self.cols
        for i, (start, dur, s) in enumerate(segs):
            c["traceID"].append(s["traceID"])
            c["seg_index"].append(i)
            c["seg_start"].append(start)
            c["seg_duration"].append(dur)
            c["spanID"].append(s["spanID"])
            c["operationName"].append(s["operationName"])
            c["span_start"].append(s["startTime"])
            c["span_duration"].append(s["duration"])
            c["processID"].append(s["processID"])
            c["parent"].append(s["parent"])
            c["service"].append(s["service"])

    def flush(self) -> pd.DataFrame:
        out = pd.DataFrame(self.cols)
        self.cols = {f.name: [] for f in CRITSEG_SCHEMA.fields}
        return out

    def __len__(self) -> int:
        return len(self.cols["traceID"])


def _sweep_stream(batches):
    """mapInPandas kernel over ONE partition: rows arrive sorted by
    traceID, so each trace is a contiguous run; sweep on group break."""
    buf = _SegBuffer()
    open_tid: str | None = None
    open_spans: list[dict[str, Any]] = []
    for pdf in batches:
        arrays = [pdf[c].values for c in _KERNEL_COLS]
        for row in zip(*arrays):
            s = dict(zip(_KERNEL_COLS, row))
            tid = s["traceID"]
            if tid != open_tid:
                if open_spans:
                    buf.add_trace(critical_segments_of_trace(open_spans))
                open_tid, open_spans = tid, []
            open_spans.append(s)
        if len(buf) >= 10_000:
            yield buf.flush()
    if open_spans:
        buf.add_trace(critical_segments_of_trace(open_spans))
    if len(buf):
        yield buf.flush()


def critical_path_segments(
    spans: DataFrame,
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Critical path for EVERY trace in a span table, in one distributed pass.

    Input: canonical span table (SPAN_SCHEMA; extra columns tolerated).
    Output: CRITSEG_SCHEMA rows, ``seg_index`` giving the in-trace order.

    The batch shape the reference only reaches in its test
    (``test_traceframe.py:146-155``: pandas groupby → per-group kernel)
    is here the operator itself. One hash shuffle on traceID, a partition-
    local sort for contiguity, then a streaming sweep per Arrow batch.

    ``pre_partitioned=True`` skips the shuffle entirely: pass it when the
    input's partitioning already co-locates each traceID (a bucketed
    store written by ``sinks.write_spans_bucketed``, or a reused upstream
    repartition) — the kernel then runs shuffle-free, only the
    partition-local sort remains. The caller owns the invariant; spans of
    a trace split across partitions would each sweep as a partial trace.
    """
    needed = [c for c in _KERNEL_COLS if c in spans.columns]
    missing = set(_KERNEL_COLS) - set(needed)
    if missing:
        raise ValueError(f"span table missing kernel columns: {sorted(missing)}")
    narrowed = spans.select(*_KERNEL_COLS)
    if pre_partitioned:
        pass
    elif num_partitions:
        narrowed = narrowed.repartition(num_partitions, "traceID")
    else:
        narrowed = narrowed.repartition("traceID")
    return (
        narrowed.sortWithinPartitions("traceID", "startTime", "spanID")
        .mapInPandas(_sweep_stream, schema=CRITSEG_SCHEMA)
    )
