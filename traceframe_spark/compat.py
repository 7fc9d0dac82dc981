"""Reference-shaped pandas frames, for drop-in migration.

A user of the reference library works with two eager pandas frames: the
8-column traces frame and the dynamic-width span frame (one typed column
per tag key — 71 columns on the shared test capture,
``/root/reference/traceframe/traceframe.py:458-495``, ``README.md:44-56``).
The engine's canonical tables are fixed-schema and lazy; these helpers
produce the reference's exact frame shapes at the driver boundary, so
notebook code written against the reference keeps working:

    raw = read_raw_traces(spark, path)
    dfT = reference_trace_frame(raw)   # == tf.traces_from_jaeger_file(f)
    dfS = reference_span_frame(raw)    # == tf.spans_from_jaeger_file(f)

Only the bounded result materializes on the driver; everything upstream
stays a distributed plan. Tag columns come back typed (bool/int64/double
per the Jaeger tag ``type`` field) like the reference's pandas inference;
as there, a tag absent from some spans yields NaN and pandas widens the
column accordingly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from traceframe_spark.operators.spans import (
    distinct_tag_types,
    spans_table,
    with_tag_columns,
)
from traceframe_spark.operators.traces import traces_table


def reference_trace_frame(raw_traces: DataFrame) -> pd.DataFrame:
    """The reference's traces frame: 8 columns, newest first."""
    return traces_table(raw_traces).toPandas()


def reference_span_frame(raw_traces: DataFrame) -> pd.DataFrame:
    """The reference's span frame: 11 fixed columns + one typed column
    per tag key observed in the dataset."""
    types = distinct_tag_types(raw_traces)
    return with_tag_columns(spans_table(raw_traces), types=types).toPandas()
