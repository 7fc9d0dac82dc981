"""Skew mitigation helpers.

AQE's skew-join splitting covers joins; for AGGREGATIONS over hot keys
(one service producing most spans, one boilerplate document cluster) the
standard fix is two-phase salted aggregation: spray each key across
``n_salts`` sub-keys, partially aggregate, then merge the partials. The
helpers here wrap that idiom for the common aggregate shapes so callers
don't hand-roll it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output column → (input column, fn) where fn ∈
    {count, sum, min, max}. Phase 1 groups by (keys + salt) — hot keys
    split across ``n_salts`` reducers; phase 2 merges partials by the
    real keys (count partials merge via sum). avg is derivable as
    sum/count by the caller; non-decomposable aggregates (median,
    collect_list) can't be salted this way.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for out, (col, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not a salt-decomposable aggregate")

    # per-row deterministic-ish spray; any distribution over salts works
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )

    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def top_hot_keys(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: the heaviest grouping keys and their share of rows —
    run before choosing a partitioning/salting strategy."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .count()
        .withColumn("share", F.col("count") / F.lit(float(total)))
        .orderBy(F.desc("count"))
        .limit(top)
    )
