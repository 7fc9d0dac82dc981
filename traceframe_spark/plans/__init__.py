"""Query catalog: named DataFrame plans with matching ANSI-SQL oracles."""

from traceframe_spark.plans.catalog import ORACLE_SQL, QUERIES, load_table


def catalog_queries():
    """Snapshot of the full query registry (name → (spark, sf_dir) -> DF)."""
    return dict(QUERIES)


def catalog_oracle_sql():
    """Snapshot of the oracle-SQL registry (name → DuckDB SQL)."""
    return dict(ORACLE_SQL)


__all__ = ["QUERIES", "ORACLE_SQL", "load_table", "catalog_queries", "catalog_oracle_sql"]
