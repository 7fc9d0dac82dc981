"""Jaeger JSON file source.

Replaces reference ``traces_from_jaeger_file`` / ``spans_from_jaeger_file``
(``/root/reference/traceframe/traceframe.py:255-258,474-482``), which
``json.load`` the whole file on the driver and loop in Python. Here the file
is read by the Spark JSON scan with an explicit schema — distributed,
schema-checked, and column-pruned by Catalyst; at 100 TB the same code
reads a directory of trace dumps in parallel.

A Jaeger export is one JSON array of trace documents, so ``multiLine=True``
(a single array spans many lines). For partition-parallel ingest at scale
prefer JSON-lines dumps (one trace document per line), which
:func:`read_raw_traces` also accepts (``multiline=False``) and Spark splits
by line across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from traceframe_spark.operators.spans import spans_table
from traceframe_spark.operators.traces import traces_table
from traceframe_spark.schemas import RAW_TRACE_SCHEMA


def read_raw_traces(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Raw trace documents → DataFrame[RAW_TRACE_SCHEMA], one row per trace."""
    return spark.read.json(path, schema=RAW_TRACE_SCHEMA, multiLine=multiline)


def traces_from_jaeger_file(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Traces table (8 cols) from a Jaeger JSON export."""
    return traces_table(read_raw_traces(spark, path, multiline=multiline))


def spans_from_jaeger_file(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Canonical span table (11 fixed cols + tags map) from a Jaeger JSON export."""
    return spans_table(read_raw_traces(spark, path, multiline=multiline))
