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


# ------------------------------------------------------------- bloom filter

def _bit_positions(
    key: Column, n_hashes: int, n_bits: int, fast: bool = False
) -> list[Column]:
    """k md5-derived bit positions for a key (same portable-hash trick
    as the CMS buckets). ``fast=True`` switches to seeded ``xxhash64``
    — an order of magnitude cheaper per key, but NOT oracle-portable
    (engine-specific hash); use it only where the filter's answer
    cannot change results, e.g. the novelty join prefilter, where a
    false positive merely adds join traffic."""
    if fast:
        return [
            F.pmod(F.xxhash64(key, F.lit(r)), F.lit(n_bits)).cast("long")
            for r in range(n_hashes)
        ]
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("#", F.lit(str(r)), key)), 1, 8), 16, 10
            ).cast("long")
            % n_bits
        )
        for r in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 1 << 16,
    fast: bool = False,
) -> DataFrame:
    """Bloom filter as a DataFrame of bit words: (word_idx, bits) —
    32 bits packed per long.
    Built with one explode + a ``bit_or`` aggregation (map-side
    combinable); two filters over the same geometry merge by unioning
    and re-``bit_or``-ing — additive like the CMS. ~n_bits/32 rows
    total (8 KiB of longs at the default geometry) regardless of input
    size: the membership structure for a set that doesn't fit."""
    key = F.col(key_col)
    pos = F.array(*_bit_positions(key, n_hashes, n_bits, fast))
    return (
        df.select(F.explode(pos).alias("p"))
        # pyspark's shiftleft wrapper takes only literal shift amounts;
        # the SQL form accepts a column
        # 32 bits per long word: shift amounts stay <= 31, which keeps
        # the expression portable to engines that CHECK signed shift
        # overflow (DuckDB errors on 1::BIGINT << 63)
        .select(
            (F.col("p") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe_keep(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 1 << 16,
    fast: bool = False,
    out_col: str = "probable_member",
) -> DataFrame:
    """Column-preserving membership probe: ``df`` plus a boolean
    ``out_col`` — a key is a PROBABLE member iff all k of its bits are
    set (no false negatives; false positives at the classic
    (1-e^{-kn/m})^k rate). k word-indexed broadcast equi-joins against
    the n_bits/32-row filter — broadcast-sized at any corpus scale.
    ``fast`` must match the :func:`bloom_build` call that built the
    filter (different hash families probe different bits)."""
    key = F.col(key_col)
    out = df
    for r, p in enumerate(_bit_positions(key, n_hashes, n_bits, fast)):
        side = bloom.select(
            F.col("word_idx").alias(f"_w{r}"), F.col("bits").alias(f"_b{r}")
        )
        out = out.withColumn(f"_p{r}", p).withColumn(
            f"_w{r}", (F.col(f"_p{r}") / 32).cast("long")
        ).join(F.broadcast(side), f"_w{r}", "left")
    hit = None
    for r in range(n_hashes):
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{r} % 32 AS INT))")
        this = F.coalesce(F.col(f"_b{r}"), F.lit(0)).bitwiseAND(mask) != 0
        hit = this if hit is None else (hit & this)
    return out.withColumn(out_col, hit).drop(
        *[c for r in range(n_hashes) for c in (f"_p{r}", f"_w{r}", f"_b{r}")]
    )


# NOTE (r08): a "dense" probe — bloom_collect()ing the packed words to
# the driver and probing via a single array LITERAL with element_at —
# was prototyped and measured UNUSABLE in PySpark: F.lit() on a
# 524k-element list burns minutes of single-threaded driver/py4j time
# before the first task runs. If a zero-join probe is ever needed, it
# has to enter the plan as data (broadcast relation), not as a literal;
# until then bloom_probe_keep's k broadcast equi-joins are the probe.


def bloom_probable_members(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 1 << 16,
    fast: bool = False,
) -> DataFrame:
    """``df`` filtered to PROBABLE members, via ONE join instead of
    :func:`bloom_probe_keep`'s k broadcast equi-joins: each key
    explodes to its k (word_idx, mask) probes, one broadcast join
    against the packed words answers all of them, and a per-key
    ``min(bit set)`` keeps only keys with every bit present. Same
    guarantee (no false negatives), k× fewer jobs — the shape for HOT
    paths that probe per micro-batch. Costs one shuffle of the
    k×|df| exploded probe rows (input-sized, never filter-sized)."""
    key = F.col(key_col)
    pos = F.array(*_bit_positions(key, n_hashes, n_bits, fast))
    probes = df.select(*df.columns, F.explode(pos).alias("_p")).select(
        *df.columns,
        (F.col("_p") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))").alias("_mask"),
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0
    )
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn("_hit", hit)
        .groupBy(*df.columns)
        .agg(F.min("_hit").alias("_all"))
        .filter(F.col("_all"))
        .drop("_all")
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 1 << 16,
) -> DataFrame:
    """Membership probe projecting ``(key_col, probable_member)`` — see
    :func:`bloom_probe_keep` for the semantics (this is its
    key-only view, kept for the oracle-portable md5 path)."""
    return bloom_probe_keep(bloom, keys, key_col, n_hashes, n_bits).select(
        key_col, "probable_member"
    )


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) as a DataFrame of
    (bucket, rho_max) — the fixed-memory DISTINCT-count structure that
    completes the sketch family (CMS = frequency, Bloom = membership,
    HLL = cardinality). 2^p buckets; every key contributes rho = one
    plus the count of leading zeros in a 40-bit md5-derived hash, and
    the register keeps the per-bucket max.

    Same portability contract as the other sketches: bucket and rho
    both derive from md5 substrings (``conv`` hex→dec) plus ``bin()``
    length — bit-identical in every engine, so a SQL oracle rebuilds
    the exact registers AND the exact estimate. Registers MERGE by
    unionByName + re-max (:func:`hll_merge`) across partitions, days,
    or corpora; ≤ 2^p rows total no matter the corpus size.
    """
    bucket, rho = hll_bucket_rho(F.col(key_col), p)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_bucket_rho(key: Column, p: int = 10) -> tuple[Column, Column]:
    """The (bucket, rho) column pair one key contributes — exposed so
    GROUPED sketches (per-day uniques etc.) reuse the identical hash
    definition: group on (your keys, bucket) with max(rho)."""
    m = 1 << p
    key = key.cast("string")
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % m
    # independent 40-bit hash for the rank; rho = leading zeros + 1,
    # computed integer-exactly via the binary-string length (no log2
    # float boundary): v in [1, 2^40) -> rho = 41 - len(bin(v)); v = 0
    # (prob 2^-40) -> all 40 bits are zero -> rho = 41
    v = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.lit("rho"), key)), 1, 10), 16, 10
    ).cast("long")
    rho = F.when(v == 0, F.lit(41)).otherwise(41 - F.length(F.bin(v))).cast("long")
    return bucket, rho


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Lossless register merge: union + per-bucket max (the property
    that lets each partition/day/corpus sketch independently)."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """Cardinality estimate from the registers, with the standard
    small-range (linear-counting) correction. One row out:
    (n_nonempty, n_empty, est).

    Engine-exactness note: every 2^-rho term is a dyadic rational with
    rho ≤ 41, and the full register sum is bounded by 2^p, so every
    partial sum fits EXACTLY in a double (≤ 51 significand bits) —
    the sum is order-independent, and the remaining arithmetic is one
    IEEE expression over identical inputs. The estimate is therefore
    deterministic across engines without quantizing intermediate state.
    """
    agg = registers.agg(
        F.count("*").cast("long").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("inv_sum"),
    )
    return _hll_estimate_select(agg, [], p)


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Grouped cardinality estimates from grouped registers — the
    per-day/per-tenant uniques rollup: ``registers`` carries
    (group_cols..., bucket, rho_max) (build by grouping
    :func:`hll_bucket_rho`'s pair on (group, bucket) with max). One row
    per group: (group_cols..., n_nonempty, n_empty, est). Same
    engine-exactness argument as :func:`hll_estimate`."""
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("inv_sum"),
    )
    return _hll_estimate_select(agg, group_cols, p)


def _hll_estimate_select(agg: DataFrame, group_cols: list[str], p: int) -> DataFrame:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # the m >= 128 constant
    n_empty = (F.lit(m) - F.col("n_nonempty")).cast("long")
    raw = F.lit(alpha * m * m) / (F.col("inv_sum") + n_empty.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "n_nonempty", n_empty.alias("n_empty"), est.alias("est")
    )
