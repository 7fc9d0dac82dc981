"""Presentation layer: styled trace tables and single-trace timelines.

Operates on *collected* (bounded) results — pandas frames or the dict
from :func:`traceframe_spark.operators.assemble.trace_with_spans` — never
on distributed DataFrames; the engine boundary is ``.toPandas()``.

Parity targets:
- ``pretty_trace_table`` (reference ``traceframe.py:420-426``): hide
  iserror/processes, millisecond durations, red error counts, traceID
  links into the Jaeger UI.
- ``showSingleTrace`` (reference ``traceframe.py:637-721``): span
  timeline + critical-path overlay + call/return tree edges. Rendering
  needs HoloViews/bokeh, which this runtime does not ship, so the data
  assembly (:func:`single_trace_figure_data`) is the tested surface and
  the renderer is gated behind an import guard.

Divergence note: the reference formats durations with
``dur.microseconds/1000`` (``traceframe.py:405-406``), which drops whole
seconds because ``.microseconds`` is only the sub-second component;
:func:`pretty_duration` uses the total duration.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from traceframe_spark.operators.critical_path import critical_segments_of_trace

try:  # pragma: no cover - holoviews not shipped in this runtime
    import holoviews as hv

    HAVE_HOLOVIEWS = True
except ImportError:
    HAVE_HOLOVIEWS = False


def pretty_duration(dur: Any) -> str:
    """Human duration in ms from a timedelta (traces table) or µs int."""
    if hasattr(dur, "total_seconds"):
        ms = int(dur.total_seconds() * 1000)
    else:
        ms = int(dur) // 1000
    return f"{ms}ms"


def color_nonzero_red(val: Any) -> str:
    return "color: red; background-color: pink" if val != 0 else ""


def pretty_trace_table(jaeger_http_endpoint: str, df_page: pd.DataFrame):
    """Styled HTML table of a (bounded) traces-table page."""
    return (
        df_page.style.hide(axis="columns", subset=["iserror", "processes"])
        .format({"duration": pretty_duration})
        .map(color_nonzero_red, subset=["errspans"])
        .format(
            lambda val: f'<a href="{jaeger_http_endpoint}/trace/{val}">{val}</a>',
            subset=["traceID"],
        )
    )


def single_trace_figure_data(trace: dict[str, Any]) -> dict[str, Any]:
    """All payloads for the single-trace timeline figure:

    - ``spans``: one bar per span (label, start, end, service),
    - ``critical``: the red critical-path overlay segments,
    - ``calls`` / ``returns``: vertical tree edges parent↔child.

    Times stay µs-epoch ints; the renderer converts.
    """
    spans = trace.get("spans") or []
    if not spans:
        raise ValueError("trace has no spans")

    label_of = {"": ""}
    enriched = []
    for s in spans:
        label = f"{s['service']}: {s['operationName']}"
        label_of[s["spanID"]] = label
        enriched.append({**s, "label": label, "endTime": s["startTime"] + s["duration"]})

    bars = [
        {
            "label": s["label"],
            "start": s["startTime"],
            "end": s["endTime"],
            "service": s["service"],
        }
        for s in enriched
    ]

    crits = critical_segments_of_trace(enriched)
    critical = [
        {
            "label": f"{span['service']}: {span['operationName']}",
            "start": start,
            "end": start + dur,
            "service": span["service"],
        }
        for start, dur, span in crits
    ]

    with_parents = [s for s in enriched if s.get("parent")]
    calls = [
        {
            "time": s["startTime"],
            "from_label": label_of.get(s["parent"], ""),
            "to_label": s["label"],
        }
        for s in with_parents
    ]
    returns = [
        {
            "time": s["endTime"],
            "from_label": s["label"],
            "to_label": label_of.get(s["parent"], ""),
        }
        for s in with_parents
    ]
    return {
        "traceID": trace.get("traceID"),
        "spans": bars,
        "critical": critical,
        "calls": calls,
        "returns": returns,
    }


def show_single_trace(trace: dict[str, Any]):
    """Timeline figure with critical-path overlay; returns the HoloViews
    overlay when holoviews is installed, else the raw figure data."""
    data = single_trace_figure_data(trace)
    if not HAVE_HOLOVIEWS:  # headless/test environments
        return data

    def segs(rows, **opts):  # pragma: no cover - needs holoviews
        return hv.Segments(
            {
                "start": [r["start"] for r in rows],
                "end": [r["end"] for r in rows],
                "start_event": [r["label"] for r in rows],
                "end_event": [r["label"] for r in rows],
                "service": [r["service"] for r in rows],
            },
            kdims=["start", "start_event", "end", "end_event"],
            vdims=["service"],
        ).opts(**opts)

    def edges(rows, **opts):
        # vertical parent<->child tree edges (reference showSingleTrace
        # draws call AND return lines, traceframe.py:702-720)
        return hv.Segments(
            {
                "start": [r["time"] for r in rows],
                "end": [r["time"] for r in rows],
                "start_event": [r["from_label"] for r in rows],
                "end_event": [r["to_label"] for r in rows],
            },
            kdims=["start", "start_event", "end", "end_event"],
        ).opts(**opts)

    span_layer = segs(data["spans"], line_width=10, color="service")
    crit_layer = segs(data["critical"], line_width=6, color="red")
    call_layer = edges(data["calls"], line_width=1, color="gray")
    return_layer = edges(data["returns"], line_width=1, color="lightgray")
    return span_layer * call_layer * return_layer * crit_layer
