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
Root pick follows the engine's determinism rule (SURVEY §7.1): the
earliest parent-less span, falling back to the trace's earliest span
when ingest clipping dropped the root — so orphaned traces still
surface, and a multi-root trace yields exactly one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    heaps, no global sort). Everything after the predicate scan runs on
    the matching traces only (semi-join first), so search cost follows
    the match set, not the store size.
    """
    match = F.lit(True)
    if service is not None:
        match = match & (F.col("service") == service)
    if operation is not None:
        match = match & (F.col("operationName") == operation)
    for k, v in (tags or {}).items():
        match = match & (F.element_at(F.col("tags"), k) == v)

    matching_ids = spans.filter(match).select("traceID").distinct()
    hit_spans = spans.join(matching_ids, "traceID")  # only matching traces

    # one row per trace: deterministic root (parent-less first, then
    # earliest start, then spanID) + span count, in a single window pass
    w = Window.partitionBy("traceID").orderBy(
        F.when(F.col("parent") == "", 0).otherwise(1),
        F.col("startTime"),
        F.col("spanID"),
    )
    summary = (
        hit_spans.select(
            "traceID",
            F.col("service").alias("root_service"),
            F.col("operationName").alias("root_operation"),
            F.col("startTime").alias("start_us"),
            F.col("duration").alias("duration_us"),
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(Window.partitionBy("traceID")).alias("n_spans"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if min_duration_us is not None:
        summary = summary.filter(F.col("duration_us") >= min_duration_us)
    if max_duration_us is not None:
        summary = summary.filter(F.col("duration_us") <= max_duration_us)

    return summary.orderBy(F.col("start_us").desc(), F.col("traceID")).limit(limit)
