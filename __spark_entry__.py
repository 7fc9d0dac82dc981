"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary aggregate at sf0.001;
``queries``/``oracle_sql`` expose the engine's oracle-checkable query
catalog (``traceframe_spark.plans.catalog``) — the SQL-expressible
projections of SURVEY.md §2's operator inventory plus the training-data
pipeline operators over documents/embeddings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from traceframe_spark.plans import catalog_queries as _catalog_queries  # noqa: E402
from traceframe_spark.plans import catalog_oracle_sql as _catalog_oracle_sql  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from traceframe_spark.plans.catalog import q_group_agg

    return q_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops, which get a rows-only check)."""
    return _catalog_oracle_sql()
