"""One-pass table profiling for pipeline data-quality gates.

A training-data pipeline at 100 TB runs validation between every stage;
re-scanning per metric is unaffordable. :func:`column_profile` computes
every column's profile in ONE aggregation pass (null count, approximate
distinct, min/max, plus numeric mean and string length stats where the
type applies), as a tall (column, metric, value) frame that's easy to
diff between pipeline runs.

No reference analogue; part of the pipeline surface (BASELINE.json
north_star). All metrics are built-in aggregates — mergeable, map-side
partial, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def column_profile(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Output: (column, metric, value double) — metrics per column:
    ``n_null``, ``approx_distinct`` (HLL at ``rsd``), and for numeric
    columns ``min``/``max``/``mean``, for string columns
    ``min_len``/``max_len``/``mean_len``. One row count row
    (column='*', metric='n_rows') anchors ratios.
    """
    def q(name: str):  # backtick-quote: dots in column names are legal
        return F.col(f"`{name.replace('`', '``')}`")

    aggs = [F.count(F.lit(1)).cast("double").alias("__n_rows")]
    per_col: dict[str, list[str]] = {}
    for f in df.schema.fields:
        c, metrics = f.name, []
        col = q(c)
        # count(when(...)) is 0 on an empty input where sum(when(...))
        # would be NULL — an empty stage profiles as zeros, not nulls
        aggs.append(F.count(F.when(col.isNull(), 1)).cast("double").alias(f"__{c}__n_null"))
        metrics.append("n_null")
        aggs.append(F.approx_count_distinct(col, rsd=rsd).cast("double").alias(f"__{c}__approx_distinct"))
        metrics.append("approx_distinct")
        if isinstance(f.dataType, NumericType):
            aggs += [
                F.min(col).cast("double").alias(f"__{c}__min"),
                F.max(col).cast("double").alias(f"__{c}__max"),
                F.avg(col).cast("double").alias(f"__{c}__mean"),
            ]
            metrics += ["min", "max", "mean"]
        elif isinstance(f.dataType, StringType):
            ln = F.length(col)
            aggs += [
                F.min(ln).cast("double").alias(f"__{c}__min_len"),
                F.max(ln).cast("double").alias(f"__{c}__max_len"),
                F.avg(ln).cast("double").alias(f"__{c}__mean_len"),
            ]
            metrics += ["min_len", "max_len", "mean_len"]
        per_col[c] = metrics

    wide = df.agg(*aggs)
    pairs = [F.struct(F.lit("*").alias("column"), F.lit("n_rows").alias("metric"), F.col("__n_rows").alias("value"))]
    for c, metrics in per_col.items():
        for m in metrics:
            pairs.append(
                F.struct(F.lit(c).alias("column"), F.lit(m).alias("metric"), q(f"__{c}__{m}").alias("value"))
            )
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select("p.column", "p.metric", "p.value")


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Row-level diff between two corpus snapshots:
    (id, status ∈ added/removed/changed/unchanged) — the bookkeeping an
    incremental pipeline runs before deciding what to re-process (only
    ``added``/``changed`` rows need re-curation; ``removed`` drives
    retention/vacuum of derived stores).

    Both sides project to (id, md5(content)) BEFORE the full-outer
    join, so the shuffle carries fixed-width hash rows regardless of
    document size — at 100 TB the diff costs two narrow scans plus one
    id-keyed join, never a text-width shuffle. Content equality is
    hash equality (md5 collisions are ignorable at corpus scale and
    the same convention every exact-dedup stage here uses).

    Presence is carried by explicit per-side flags, NOT by hash
    nullability: ``md5(NULL)`` is NULL, so a row whose content is NULL
    would otherwise be indistinguishable from a row that is absent —
    and the fixture corpora really do contain NULL texts. Hash
    comparison is null-safe (two NULL contents are 'unchanged', a
    NULL vs non-NULL content is 'changed')."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(content_col)).alias("_oh"),
        F.lit(True).alias("_op"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(content_col)).alias("_nh"),
        F.lit(True).alias("_np"),
    )
    status = (
        F.when(F.col("_op").isNull(), F.lit("added"))
        .when(F.col("_np").isNull(), F.lit("removed"))
        .when(F.col("_oh").eqNullSafe(F.col("_nh")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "id", "full_outer").select("id", status.alias("status"))
