"""Single-trace assembly: bounded collect of one trace + its spans.

Replaces reference ``traceWithSpans``
(``/root/reference/traceframe/traceframe.py:620-632``): equality filter on
both tables, span dedup by spanID, collect to a plain dict. The filters
push down to the scans (traceID is a prefix-indexed parquet column at
scale), so this is a point lookup, not a table scan + driver filter.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _row_hash(df):
    """Deterministic content hash of a full row (map-safe); see
    :func:`traceframe_spark.functions.row_content_hash`."""
    from traceframe_spark.functions import row_content_hash

    return row_content_hash(df)


def trace_with_spans(traces: DataFrame, spans: DataFrame, trace_id: str) -> dict[str, Any]:
    """One trace row as a dict with an embedded ``spans`` record list.

    Raises ``KeyError`` when the trace is absent (reference raises a bare
    Exception, ``traceframe.py:624-625``). Span duplicates (possible when a
    span table unions several fetches) are removed by spanID, keeping the
    earliest-startTime copy — deterministic, unlike pandas
    ``drop_duplicates`` which keeps input order's first
    (``traceframe.py:629-630``).
    """
    rows = traces.filter(F.col("traceID") == F.lit(trace_id)).limit(1).collect()
    if not rows:
        raise KeyError(f"trace {trace_id!r} not found")
    result = rows[0].asDict(recursive=True)

    w_rows = (
        spans.filter(F.col("traceID") == F.lit(trace_id))
        .withColumn(
            "_rank",
            # spanID is the partition key (constant inside the window), so
            # the tie-break must be content-bearing: equal-startTime copies
            # of a re-exported span order by a hash of the full row.
            # xxhash64 refuses MAP columns (hash not content-stable), so
            # maps canonicalize to key-sorted entry arrays first.
            F.row_number().over(
                Window.partitionBy("spanID").orderBy("startTime", _row_hash(spans))
            ),
        )
        .filter(F.col("_rank") == 1)
        .drop("_rank")
        .orderBy("startTime", "spanID")
        .collect()
    )
    result["spans"] = [r.asDict(recursive=True) for r in w_rows]
    return result
