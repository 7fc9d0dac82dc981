"""SQL facade: register the engine's tables as temp views and run SQL.

The reference exposes capabilities only as Python functions; the engine
additionally exposes the full Spark SQL surface over the same tables —
``engine.sql()`` is just ``spark.sql`` with the views guaranteed
registered, so IN/EXISTS/scalar subqueries, CTEs, and window clauses are
all available without DataFrame plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from traceframe_spark.plans.catalog import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each parquet table under its bare name as a temp view.

    Only tables whose parquet actually exists register (a partial export
    must not crash queries that never touch the absent tables), and an
    explicitly EMPTY ``tables`` list registers nothing (``or`` would
    silently treat it as "everything"). Existence is probed through the
    Hadoop FileSystem API, not ``os.path.exists``, so an ``hdfs://`` or
    ``s3a://`` ``sf_dir`` works the same as a local one (matching the
    storage-agnostic sidecar I/O in ``operators/similarity.py``)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for name in TABLES if tables is None else tables:
        p = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/{name}.parquet")
        if p.getFileSystem(hconf).exists(p):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL against the registered testdata views (idempotent setup)."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
