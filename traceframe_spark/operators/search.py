"""Trace search: the Jaeger UI's find-traces semantics as engine-side
DataFrame predicates.

The reference REJECTS most search parameters as UNIMPLEMENTED
(``/root/reference/traceframe/traceframe.py:60-76``: operation, tag
expressions, min/max duration); its connector only forwards
service/time/limit to the server. Here the full search surface runs
engine-side over the canonical span table, so it works identically on
live-fetched, file-loaded, or stored spans — and on a 100 TB store the
predicates push into the parquet scan (service/operation/duration are
top-level columns; tag equality is a MapType access).

Semantics (matching the Jaeger UI): a trace matches if ANY of its spans
satisfies service+operation+tags together; duration bounds apply to the
ROOT span's duration; results are root-span summaries, newest first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_traces(
    spans: DataFrame,
    service: str | None = None,
    operation: str | None = None,
    tags: dict[str, str] | None = None,
    min_duration_us: int | None = None,
    max_duration_us: int | None = None,
    limit: int = 20,
) -> DataFrame:
    """Find traces whose spans match the given predicates.

    Returns one row per matching trace: (traceID, root_service,
    root_operation, start_us, duration_us, n_spans), ordered newest
    first, capped at ``limit`` (TakeOrderedAndProject — per-partition
    heaps, no global sort).
    """
    match = F.lit(True)
    if service is not None:
        match = match & (F.col("service") == service)
    if operation is not None:
        match = match & (F.col("operationName") == operation)
    for k, v in (tags or {}).items():
        match = match & (F.element_at(F.col("tags"), k) == v)

    matching_ids = spans.filter(match).select("traceID").distinct()

    root = spans.filter(F.col("parent") == "")
    summary = (
        root.join(matching_ids, "traceID")
        .select(
            "traceID",
            F.col("service").alias("root_service"),
            F.col("operationName").alias("root_operation"),
            F.col("startTime").alias("start_us"),
            F.col("duration").alias("duration_us"),
        )
    )
    if min_duration_us is not None:
        summary = summary.filter(F.col("duration_us") >= min_duration_us)
    if max_duration_us is not None:
        summary = summary.filter(F.col("duration_us") <= max_duration_us)

    n_spans = spans.groupBy("traceID").agg(F.count("*").alias("n_spans"))
    return (
        summary.join(n_spans, "traceID")
        .orderBy(F.col("start_us").desc(), F.col("traceID"))
        .limit(limit)
    )
