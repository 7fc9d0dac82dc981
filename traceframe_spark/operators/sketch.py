"""Count-Min Sketch (Cormode & Muthukrishnan 2005) as DataFrame algebra.

The fixed-memory frequency structure a 100 TB pipeline uses when the
key universe (tokens, URLs, user ids) doesn't fit anywhere: d×w
counters, point-estimate = min over d rows of the hashed bucket's
counter — always an OVER-estimate, within εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Spark-first design decisions:

- **The sketch IS a DataFrame** of (row, bucket, cnt): building it is
  one explode (d rows per occurrence) + one aggregation with map-side
  partials; two sketches MERGE by unionByName + re-aggregation (the
  additive property that makes CMS work across partitions, days, or
  corpora — the same shape as the engine's rollup partials).
- **Hashing is md5-derived** (`sampling.md5_uniform`'s trick): bucket =
  first 8 md5 hex digits of ``<row>:<key>`` mod w. Bit-identical in
  every engine, so a SQL oracle can rebuild the exact sketch and the
  exact estimates — unlike xxhash64/sketch-library binaries, which are
  engine-private. (md5 costs more than xxhash64 per call; at 100 TB
  you'd swap in xxhash64 row-seeds and give up oracle replay, nothing
  else changes.)
- Estimation is a d-way join of candidate keys against the sketch —
  bucket-keyed equi-joins, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    """Engine-portable CMS hash: md5 over '<row>:<key>' → bucket id."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(row)), key)), 1, 8), 16, 10
    ).cast("long")
    return (h % width).alias(f"b{row}")


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Sketch table (row, bucket, cnt) from one occurrence per input
    row. d·|input| exploded rows collapse to ≤ d·w output rows — the
    whole sketch is ~d·w longs no matter how large the corpus."""
    key = F.col(key_col)
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _bucket(key, r, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum two sketches built with the same (depth, width) — the
    additive property: sketch(A ∪ B) = sketch(A) + sketch(B)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a key set: join each key's d buckets against
    the sketch, take the min counter. Missing buckets count 0 (a key
    the sketch never saw estimates 0 only if at least one of its d
    buckets is empty). Estimates are upper bounds on true counts."""
    key = F.col(key_col)
    out = keys
    for r in range(depth):
        side = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"_bk{r}"), F.col("cnt").alias(f"_c{r}")
        )
        out = out.withColumn(f"_bk{r}", _bucket(key, r, width)).join(
            side, f"_bk{r}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(depth)])
    return out.select(key_col, est.alias("est")).drop(
        *[f"_bk{r}" for r in range(depth)]
    )
