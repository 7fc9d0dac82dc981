"""Span table construction: explode + enrich, plus the tag-pivot helper.

Replaces the reference's nested Python loops
(``/root/reference/traceframe/traceframe.py:458-468,485-495``) with one
declarative plan: ``explode(spans)`` → map-lookup service enrichment →
CHILD_OF parent extraction → tag-list→map normalization. All native
Catalyst expressions, no shuffle — the whole thing is a single
narrow-projection stage over the scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traceframe_spark.functions import parent_span_id, service_of, tags_to_map

# Fixed columns of the canonical span table, in reference order
# (the reference's dynamic schema starts with these 11, README.md:44-56).
SPAN_FIXED_COLUMNS = [
    "traceID",
    "spanID",
    "flags",
    "operationName",
    "startTime",
    "duration",
    "logs",
    "processID",
    "warnings",
    "service",
    "parent",
]


def spans_table(raw_traces: DataFrame) -> DataFrame:
    """Raw trace documents → canonical span table (SPAN_SCHEMA).

    One row per span; ``service`` resolved through the trace's process map
    (reference ``traceframe.py:489``), ``parent`` from the first CHILD_OF
    reference (``traceframe.py:429-433``), ``tags`` normalized to
    ``map<string,string>`` instead of pivoted to dynamic columns
    (see :func:`with_tag_columns` for the presentation pivot).
    """
    s = F.col("span")
    return (
        raw_traces.select(
            F.explode("spans").alias("span"),
            F.col("processes"),
        )
        .select(
            s["traceID"].alias("traceID"),
            s["spanID"].alias("spanID"),
            s["flags"].alias("flags"),
            s["operationName"].alias("operationName"),
            s["startTime"].alias("startTime"),
            s["duration"].alias("duration"),
            s["logs"].alias("logs"),
            s["processID"].alias("processID"),
            s["warnings"].alias("warnings"),
            service_of(F.col("processes"), s["processID"]).alias("service"),
            parent_span_id(s).alias("parent"),
            tags_to_map(s["tags"]).alias("tags"),
        )
    )


def distinct_tag_keys(spans: DataFrame) -> list[str]:
    """All tag keys present in the dataset, sorted. One small job."""
    rows = (
        spans.select(F.explode(F.map_keys("tags")).alias("key"))
        .distinct()
        .collect()
    )
    return sorted(r["key"] for r in rows)


def with_tag_columns(spans: DataFrame, keys: Iterable[str] | None = None) -> DataFrame:
    """Presentation pivot: one top-level column per tag key.

    Reproduces the reference's dynamic-width span frame
    (``traceframe.py:465-467``; 71 columns on the test fixture) from the
    canonical MapType form. ``keys=None`` discovers keys with one extra
    job; at scale pass an explicit key list so the plan stays static.
    """
    if keys is None:
        keys = distinct_tag_keys(spans)
    cols = [F.col(c) for c in SPAN_FIXED_COLUMNS]
    cols += [F.col("tags")[k].alias(k) for k in keys]
    return spans.select(*cols)
