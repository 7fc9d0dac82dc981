"""Traces table construction (one row per trace, 8 columns).

Replaces reference ``process_traces``
(``/root/reference/traceframe/traceframe.py:209-230``), which runs six
row-wise ``df.apply`` passes on the driver. Here all eight columns come
from one native-expression projection over the nested span array — no
explode, no shuffle, no Python. The final ``orderBy(startTime desc)``
matches the reference's sort (``traceframe.py:230``); at scale, skip
:func:`traces_table`'s sort via ``sort=False`` and sort only bounded
result pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traceframe_spark.functions import error_span_count, root_span, service_of


def traces_table(raw_traces: DataFrame, sort: bool = True) -> DataFrame:
    """Raw trace documents → traces table.

    Columns (reference derivations at ``traceframe.py:209-230``):
      traceID, traceName ("rootService: rootOp"), nspans, errspans,
      duration (day-time interval from root-span µs), startTime
      (timestamp from root-span µs epoch), processes, iserror.

    Missing-root fallbacks follow the reference (``traceframe.py:159-206``):
    traceName falls back to the traceID, startTime to epoch 0, duration to
    0 — though with the deterministic earliest-start root pick a non-empty
    span array always yields a root candidate. A document whose ``spans``
    field is ABSENT (null) gets the same fallbacks with nspans/errspans 0
    (``size(null)`` would otherwise null the counts and make ``iserror``
    filters silently drop the row), and a root whose processID is missing
    from the processes map names the trace ``unknown: <op>`` rather than
    silently shortening to the bare operation (the reference raises; a
    distributed build labels and moves on).
    """
    root = root_span(F.col("spans"))
    have_spans = F.col("spans").isNotNull() & (F.size(F.col("spans")) > 0)

    df = raw_traces.select(
        F.col("traceID"),
        F.when(
            have_spans,
            F.concat_ws(
                ": ",
                F.coalesce(
                    service_of(F.col("processes"), root["processID"]),
                    F.lit("unknown"),
                ),
                root["operationName"],
            ),
        )
        .otherwise(F.col("traceID"))
        .alias("traceName"),
        F.coalesce(F.size("spans"), F.lit(0)).alias("nspans"),
        F.coalesce(error_span_count(F.col("spans")), F.lit(0)).alias("errspans"),
        (
            F.coalesce(F.when(have_spans, root["duration"]), F.lit(0))
            * F.expr("INTERVAL '1' MICROSECOND")
        ).alias("duration"),
        F.timestamp_micros(
            F.coalesce(F.when(have_spans, root["startTime"]), F.lit(0))
        ).alias("startTime"),
        F.col("processes"),
    ).withColumn("iserror", F.col("errspans") > 0)

    if sort:
        df = df.orderBy(F.col("startTime").desc())
    # Reference column order (README.md:16-27): iserror last.
    return df.select(
        "traceID", "traceName", "nspans", "errspans", "duration", "startTime", "processes", "iserror"
    )
