"""Continuous-aggregate (hypertable-style) rollups with incremental refresh.

The scale pattern that keeps dashboards off the raw table: maintain a
fine-grained rollup (1-minute buckets of count/sum/min/max), answer
coarser windows FROM the rollup, and refresh it incrementally — only
the buckets touched by newly-arrived raw rows are recomputed, then
merged into the standing rollup. All aggregates here are decomposable,
so every level and every refresh is lossless (pinned by tests and the
``time_rollup`` oracle query).

Bucketing is integer arithmetic on the long-ns timestamp — no timezone,
no UDF, stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINUTE_NS = 60 * 1_000_000_000
HOUR_NS = 3600 * 1_000_000_000


def time_bucket(ts: Column, width_ns: int) -> Column:
    """Floor a long-ns timestamp to its bucket start (long ns)."""
    return ts - F.pmod(ts, F.lit(width_ns))


def rollup_events(
    df: DataFrame,
    bucket_ns: int,
    keys: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Aggregate raw rows into (bucket_ns, *keys, n, value_sum,
    value_min, value_max) partials. One shuffle; partials are mergeable
    (see :func:`merge_rollups`), so coarser resolutions and refreshes
    never touch raw rows again.

    ``n`` counts NON-NULL values (``count(_v)``, like sum/min/max skip
    nulls) so a derived mean ``value_sum / n`` is the mean of observed
    values — ``count(*)`` would silently mix null rows into the
    denominator."""
    return (
        df.select(
            time_bucket(F.col(ts_col), bucket_ns).alias("bucket_ns"),
            *keys,
            F.col(value_col).alias("_v"),
        )
        .groupBy("bucket_ns", *keys)
        .agg(
            F.count("_v").alias("n"),
            F.sum("_v").alias("value_sum"),
            F.min("_v").alias("value_min"),
            F.max("_v").alias("value_max"),
        )
    )


def merge_rollups(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two rollup partial tables (same schema) losslessly:
    counts and sums add, mins/maxes combine. Union + one groupBy — at
    scale ``b`` is the small fresh delta and AQE coalesces the merge."""
    return (
        a.unionByName(b)
        .groupBy("bucket_ns", *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )


def coarsen(
    rollup: DataFrame,
    to_bucket_ns: int,
    keys: Sequence[str],
    from_bucket_ns: int | None = None,
) -> DataFrame:
    """Re-bucket a fine rollup to a coarser resolution FROM PARTIALS —
    the raw table is never read.

    Lossless ONLY when ``to_bucket_ns`` is a whole multiple of the fine
    bucket width: otherwise a fine bucket straddles two coarse buckets
    and its partial lands wholly in the earlier one (silently shifted
    aggregates). Pass ``from_bucket_ns`` to make that precondition an
    error instead of a silent corruption."""
    if from_bucket_ns is not None and to_bucket_ns % from_bucket_ns != 0:
        raise ValueError(
            f"coarsen: to_bucket_ns ({to_bucket_ns}) must be a multiple of "
            f"the fine bucket width ({from_bucket_ns}); a fine partial "
            "cannot be split across coarse buckets"
        )
    return (
        rollup.withColumn("bucket_ns", time_bucket(F.col("bucket_ns"), to_bucket_ns))
        .groupBy("bucket_ns", *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )


def histogram_rollup(
    df: DataFrame,
    bucket_ns: int,
    keys: Sequence[str],
    value_col: str,
    bin_width: float,
    ts_col: str = "ts",
) -> DataFrame:
    """Tall histogram partials: (bucket_ns, *keys, bin, n) where ``bin``
    is ``floor(value / bin_width)``. Mergeable by summing ``n`` — the
    deterministic alternative to quantile sketches: any percentile
    derives from the merged bins with error ≤ ``bin_width``, and two
    engines (or two refreshes) always agree because the partial is
    exact integer counts, not a probabilistic digest.

    Null values are excluded: a null bin would sort before every real
    bin and inflate the running counts in
    :func:`quantile_from_histogram`, shifting quantiles downward."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            time_bucket(F.col(ts_col), bucket_ns).alias("bucket_ns"),
            *keys,
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
        )
        .groupBy("bucket_ns", *keys, "bin")
        .agg(F.count("*").alias("n"))
    )


def quantile_from_histogram(
    hist: DataFrame,
    keys: Sequence[str],
    q: float,
    bin_width: float,
) -> DataFrame:
    """Per-key quantile from (merged) histogram partials: the upper edge
    of the first bin where the running count reaches ``q`` of the total.
    One window pass over bins — the raw table is never read. Upper-edge
    convention keeps the answer a deterministic bin boundary (error ≤
    ``bin_width``), identical across engines and refreshes."""
    from pyspark.sql import Window

    keys = list(keys)
    w_cum = (
        Window.partitionBy(*keys).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    per_key = hist.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))
    ranked = per_key.select(
        *keys,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    return (
        ranked.filter(F.col("cum") >= F.lit(q) * F.col("total"))
        .groupBy(*keys)
        .agg(F.min("bin").alias("_qbin"))
        .select(
            *keys,
            ((F.col("_qbin") + 1) * F.lit(bin_width)).alias(f"q{int(q * 100)}_upper"),
        )
    )


def incremental_refresh(
    standing: DataFrame,
    new_raw: DataFrame,
    bucket_ns: int,
    keys: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Fold newly-arrived raw rows into a standing rollup: aggregate
    only the delta, then merge. The cost scales with the DELTA, not the
    history — the property that makes a 100 TB continuous aggregate
    maintainable."""
    delta = rollup_events(new_raw, bucket_ns, keys, value_col, ts_col)
    return merge_rollups(standing, delta, keys)
