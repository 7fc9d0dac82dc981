"""Oracle-backed corpus-level trace analytics.

The driver testdata has no span table, so these queries derive a
deterministic synthetic one from orders/lineitem — the same derivation
in Spark and in the DuckDB oracle — and run the REAL analytics operators
(:mod:`traceframe_spark.operators.analytics`) on top. That upgrades the
service graph and operation stats from fixture-tested to value-verified
at driver scale: the operator's join/aggregation logic is what's under
test, the synthetic corpus is just a shared, reproducible input.

Span shape: one root span per order (service ``frontend``), one child
span per lineitem row, with service/operation/duration/error all
deterministic functions of (l_orderkey, l_linenumber).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traceframe_spark.operators.analytics import operation_stats, service_dependencies
from traceframe_spark.plans.catalog import load_table, qint

BASE_US = 1_700_000_000_000_000

_CHILD_SERVICES = ["backend", "cache", "db"]


def synthetic_span_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span table from orders/lineitem (shared with the
    DuckDB oracle via ``_SQL_SPANS``)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    roots = o.select(
        F.col("o_orderkey").cast("string").alias("traceID"),
        F.col("o_orderkey").cast("string").alias("spanID"),
        F.lit("/checkout").alias("operationName"),
        (F.lit(BASE_US) + F.col("o_orderkey") * 1_000_000).alias("startTime"),
        (F.lit(900_000) + (F.col("o_orderkey") % 100) * 1_000).alias("duration"),
        F.lit("").alias("parent"),
        F.lit("frontend").alias("service"),
        F.map_from_arrays(F.array(), F.array()).alias("tags"),
    )
    svc = F.element_at(
        F.array(*[F.lit(s) for s in _CHILD_SERVICES]),
        (F.col("l_linenumber") % 3 + 1).cast("int"),
    )
    err_tags = F.when(
        F.col("l_orderkey") % 13 == 0,
        F.create_map(F.lit("error"), F.lit("true")),
    ).otherwise(F.map_from_arrays(F.array(), F.array()))
    children = li.select(
        F.col("l_orderkey").cast("string").alias("traceID"),
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("spanID"),
        F.concat(F.lit("/op"), (F.col("l_linenumber") % 2).cast("string")).alias(
            "operationName"
        ),
        (
            F.lit(BASE_US)
            + F.col("l_orderkey") * 1_000_000
            + F.col("l_linenumber") * 100_000
        ).alias("startTime"),
        # floor() explicitly: DuckDB CAST(DOUBLE AS BIGINT) rounds where
        # Spark's cast truncates — floor on both sides is unambiguous
        (F.lit(50_000) + F.floor(F.col("l_extendedprice") % 1000).cast("long")).alias(
            "duration"
        ),
        F.col("l_orderkey").cast("string").alias("parent"),
        svc.alias("service"),
        err_tags.alias("tags"),
    )
    return roots.unionByName(children)


# The identical span derivation for DuckDB (tags collapse to a boolean).
_SQL_SPANS = """
spans AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS traceID,
           CAST(o_orderkey AS VARCHAR) AS spanID,
           '/checkout' AS operationName,
           900000 + (o_orderkey % 100) * 1000 AS duration,
           '' AS parent,
           'frontend' AS service,
           FALSE AS is_error
    FROM orders
    UNION ALL
    SELECT CAST(l_orderkey AS VARCHAR),
           CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR),
           '/op' || CAST(l_linenumber % 2 AS VARCHAR),
           50000 + CAST(floor(l_extendedprice % 1000) AS BIGINT),
           CAST(l_orderkey AS VARCHAR),
           (['backend', 'cache', 'db'])[(l_linenumber % 3) + 1],
           l_orderkey % 13 = 0
    FROM lineitem
)
"""


def q_service_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The service call graph over the synthetic corpus: the operator's
    child⋈parent self-join and error attribution, value-checked."""
    spans = synthetic_span_table(spark, sf_dir)
    return service_dependencies(spans).select(
        "parent_service",
        "child_service",
        "n_calls",
        F.col("n_error_calls").cast("bigint").alias("n_error_calls"),
    )


SQL_SERVICE_GRAPH = f"""
WITH {_SQL_SPANS}
SELECT p.service AS parent_service, c.service AS child_service,
       count(*) AS n_calls,
       CAST(sum(CASE WHEN c.is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_error_calls
FROM spans c
JOIN spans p ON c.traceID = p.traceID AND c.parent = p.spanID
WHERE c.parent <> '' AND p.service <> c.service
GROUP BY 1, 2
"""


def q_operation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(service, operation) latency/error profile — exact
    percentiles, quantized for the cross-engine hash."""
    spans = synthetic_span_table(spark, sf_dir)
    s = operation_stats(spans)
    return s.select(
        "service",
        "operationName",
        "n_spans",
        F.col("n_errors").cast("bigint").alias("n_errors"),
        qint(F.col("p50_us"), 4).alias("p50_q"),
        qint(F.col("p95_us"), 4).alias("p95_q"),
        qint(F.col("p99_us"), 4).alias("p99_q"),
        qint(F.col("error_rate"), 4).alias("error_rate_q"),
    )


SQL_OPERATION_STATS = f"""
WITH {_SQL_SPANS}
SELECT service, operationName, count(*) AS n_spans,
       CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       CAST(floor(quantile_cont(duration, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_q,
       CAST(floor(quantile_cont(duration, 0.95) * 10000 + 0.5) AS BIGINT) AS p95_q,
       CAST(floor(quantile_cont(duration, 0.99) * 10000 + 0.5) AS BIGINT) AS p99_q,
       CAST(floor(sum(CASE WHEN is_error THEN 1 ELSE 0 END)::DOUBLE / count(*) * 10000 + 0.5) AS BIGINT) AS error_rate_q
FROM spans
GROUP BY 1, 2
"""


TRACEOPS_QUERIES = {
    "service_graph": q_service_graph,
    "operation_stats": q_operation_stats,
}

TRACEOPS_ORACLE_SQL = {
    "service_graph": SQL_SERVICE_GRAPH,
    "operation_stats": SQL_OPERATION_STATS,
}
