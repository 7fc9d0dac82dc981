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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traceframe_spark.functions import row_content_hash


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

    # salt derives from ROW CONTENT, not monotonically_increasing_id:
    # an order-dependent salt makes the stage indeterminate (a shuffle-
    # fetch retry re-assigns rows to different salts than the partials
    # already fetched, forcing full-stage reruns or job aborts). Content
    # hashing is recomputation-stable; only complete duplicate rows
    # share a salt, which skews nothing unless the hot key is one
    # exact row repeated — then dedup-first is the right tool anyway.
    # row_content_hash canonicalizes map columns (tags) that xxhash64
    # would otherwise reject at plan time.
    salted = df.withColumn("_salt", F.pmod(row_content_hash(df), F.lit(n_salts)))

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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, REPLICATE the small
    side across every salt, join on (keys + salt).

    AQE's skew-join split handles most cases at runtime; this is the
    explicit form for when the skew is known up front (one hot service,
    one boilerplate cluster) or AQE is unavailable — e.g. inside
    streaming micro-batches, where AQE does not re-plan. Its niche is
    the middle ground where the small side is too big to broadcast
    (when it fits, just broadcast — broadcast joins don't skew) but
    ``n_salts`` copies of it are still an affordable shuffle: each hot
    key's rows then spread over ``n_salts`` reducers instead of one
    straggler.

    Only inner and left joins: replication would double-count the
    unmatched small-side rows of right/full joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    on = list(on)
    # content-derived salt for the same recomputation-stability reason
    # as salted_agg (see comment there); map-safe via row_content_hash
    salted = big.withColumn("_salt", F.pmod(row_content_hash(big), F.lit(n_salts)))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return salted.join(replicated, on + ["_salt"], how).drop("_salt")


def top_hot_keys(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: the heaviest grouping keys and their share of rows —
    run before choosing a partitioning/salting strategy. One scan: the
    total derives from the aggregated counts (an unpartitioned window
    over the small per-key frame), not a second pass over ``df``."""
    from pyspark.sql.window import Window

    counted = df.groupBy(*keys).count()
    total = F.sum("count").over(Window.partitionBy())
    return (
        counted.withColumn("share", F.col("count") / total)
        .orderBy(F.desc("count"))
        .limit(top)
    )
