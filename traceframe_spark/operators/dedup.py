"""Deduplication operators for large-scale text/embedding corpora.

Five strategies, each designed for the 100 TB regime (no reference
analogue — the reference's only dedup is spanID ``drop_duplicates``,
``/root/reference/traceframe/traceframe.py:629-630``; these generalize
B21 to training-data pipelines):

- exact:     hash-groupBy on normalized content — one shuffle.
- MinHash+LSH: shingle → k minhashes → band buckets → candidate join →
  exact-Jaccard verify. Candidate generation never compares all pairs;
  cost is O(rows × k) plus a join whose width is the bucket collision
  rate, so it scales to corpora where O(n²) is impossible.
- SimHash:   64-bit fingerprint, near-dups share all but a few bits;
  banded key join on bit-blocks.
- n-gram Jaccard: exact pairwise similarity via an inverted shingle
  index (explode + self-join + count), for bounded candidate sets.
- embedding cosine: random-hyperplane LSH buckets then exact cosine —
  see traceframe_spark.operators.similarity.

All hashing is JVM-side (``xxhash64``), all set math is native array
functions; nothing leaves codegen except the documented kernels.
"""

from __future__ import annotations

import logging
import weakref

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LOG = logging.getLogger("traceframe_spark.dedup")


def spread(df: DataFrame, key: str, cpu: bool = False) -> DataFrame:
    """Repartition a narrow input before CPU-heavy per-row work.

    A small parquet table often scans as 1-2 partitions; hashing/shingling
    then runs on 1-2 cores regardless of cluster size. Hash-repartition on
    ``key`` WITHOUT an explicit partition count: AQE can coalesce a
    ``REPARTITION_BY_COL`` exchange down when the input is small, but a
    pinned ``repartition(n, key)`` (REPARTITION_BY_NUM) it must honor
    verbatim — the count-free form is what lets well-partitioned inputs
    avoid paying a full fixed-width shuffle. Costs no driver-side RDD
    conversion at plan-build time (unlike a getNumPartitions() probe).

    ``cpu=True`` pins the width to the cluster's default parallelism
    instead: AQE's coalescing targets SHUFFLE BYTES (post-compression),
    the wrong metric when the downstream projection is CPU-bound — a
    few-MB compressed text shuffle coalesces to ONE partition and the
    shingle+MinHash kernel then runs on one core of the whole cluster
    (measured: a 4.6 s single-task materialization that runs 0.3 s
    wide). ``defaultParallelism`` is the principled width for a
    streaming row-wise kernel at any cluster size — it scales with the
    cluster, not with a local-mode constant, and per-task memory is
    flat (the kernel holds one row at a time)."""
    if cpu:
        return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
    return df.repartition(key)


def _release_jdf(jdf) -> None:
    try:
        jdf.unpersist(False)
    except Exception:  # noqa: BLE001 — session may already be gone
        pass


def _unpersist_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie cached intermediates' lifetime to the returned plan.

    ``persist()`` entries live in the JVM CacheManager until explicitly
    released — in a long-lived session every dedup call would otherwise
    leak one signature frame of cache. Each cached frame gets a GC
    finalizer that unpersists it, and the *result* carries strong
    references (``_tf_keepalive``) so the cache lives exactly as long as
    the returned plan object. Deriving a new DataFrame and dropping the
    original releases the cache early — :func:`carry_cache` propagates
    the keep-alive when the derived plan should keep it. An early
    release only drops the cache (lineage survives), so it can cost a
    recompute, never correctness.
    """
    for c in cached:
        weakref.finalize(c, _release_jdf, c._jdf)
    result._tf_keepalive = tuple(cached) + tuple(getattr(result, "_tf_keepalive", ()))
    return result


def carry_cache(derived: DataFrame, *sources: DataFrame) -> DataFrame:
    """Propagate cached-intermediate keep-alives from ``sources`` onto a
    ``derived`` plan so persisted signature frames stay cached while the
    derived DataFrame is in use (see :func:`_unpersist_with`)."""
    ka: tuple = tuple(getattr(derived, "_tf_keepalive", ()))
    for s in sources:
        ka += tuple(getattr(s, "_tf_keepalive", ()))
    if ka:
        derived._tf_keepalive = ka
    return derived


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of a string column (JVM-side).

    Built as arrays_zip of n shifted slices over the char array — a
    substr-per-position lambda re-evaluates ``col`` (usually
    lower(trim(text))) once per position after Catalyst inlines it,
    which is quadratic in document length. concat_ws drops the nulls
    that zip-padding adds, preserving the truncated final shingles of
    strings shorter than n."""
    chars = F.split(col, "")
    k = F.greatest(F.length(col) - (n - 1), F.lit(1))
    z = F.arrays_zip(*[F.slice(chars, i + 1, k) for i in range(n)])
    return F.array_distinct(
        F.transform(z, lambda s: F.concat_ws("", *[s[str(i)] for i in range(n)]))
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (lowercased, whitespace-tokenized).
    Zip-of-shifted-slices for the same inlining reason as
    :func:`char_shingles`."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    z = F.arrays_zip(*[F.slice(toks, i + 1, k) for i in range(n)])
    return F.array_distinct(
        F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    )


def exact_dedup(df: DataFrame, cols: list[str], order_col: str) -> DataFrame:
    """Keep one deterministic row per distinct combination of ``cols``
    (lowest ``order_col``). One shuffle; survives any scale."""
    w = Window.partitionBy(*cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def content_key(text_col: Column | str = "text") -> Column:
    """THE canonical exact-content key: ``md5(lower(trim(text)))``.

    One definition on purpose — the exact-dedup stage of
    :func:`dedup_pipeline`, the registry's curation-flow oracle twin,
    and the ingest loop's cross-dedup all key on this; normalization
    changes (e.g. adding NFC or whitespace collapsing) must land here
    once, or the engine, the oracles, and the store contract silently
    diverge. Matches the shingling normalization in
    :func:`minhash_signatures` (a doc differing only in case/outer
    whitespace IS an exact dup), and md5's 128 bits make engine/oracle
    collision divergence a non-concern."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(F.trim(col)))


def exact_canonical_ids(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """One row per distinct content: ``(_k, _canon_id)`` with the
    minimum id as canonical. The narrow-shuffle primitive (only
    ``(id, md5)`` pairs move — never document bytes) that exact-dedup
    compositions left-semi join against."""
    return (
        df.select(content_key(text_col).alias("_k"), F.col(id_col).alias("_id"))
        .groupBy("_k")
        .agg(F.min("_id").alias("_canon_id"))
    )


#: modulus of the PORTABLE MinHash hash families: the Mersenne prime
#: 2^31 − 1. Keeping base hash and multipliers below 2^31 bounds every
#: intermediate product under 2^62, so the same affine arithmetic is
#: exact 64-bit in Spark AND DuckDB — no overflow divergence.
PORTABLE_P = (1 << 31) - 1


def portable_family(i: int) -> tuple[int, int]:
    """(a_i, b_i) of the i-th affine family ``(a·h + b) mod P`` — pure
    integer arithmetic on the family index, so an oracle derives the
    identical constants from ``i`` instead of pasting literals."""
    a = ((2 * i + 1) * 1103515245) % PORTABLE_P
    b = (i * 104729 + 12345) % PORTABLE_P
    assert a != 0, f"degenerate multiplier at family {i}"
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    shingle_size: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Per-row MinHash signature: ``sig[i] = min(h_i(shingle))``.

    Output: (id, shingles array<string>, sig array<bigint>). Default
    hash families are xxhash64 salted by the family index — the fast
    JVM path. ``portable=True`` switches to md5-based affine families
    (``h = md5-prefix mod P``; ``h_i = (a_i·h + b_i) mod P`` with
    :func:`portable_family` constants, P = 2^31−1): ~the HLL trick —
    every value is reproducible in ANSI SQL, so signatures, band
    buckets, and the estimated-Jaccard verify can all be value-checked
    by an external oracle. One md5 per shingle (the families are cheap
    affine transforms of the single base hash), so the portable path
    costs one extra transform, not k hashes.

    Shape: ONE higher-order fold over the shingle array updates all k
    running minima per row — no shuffle, shingling evaluated once (the
    k-projection form ``array_min(transform(...))`` looks equivalent but
    Catalyst collapses projections and re-inlines the shingling
    expression into every family: k× recompute). Input is spread across
    partitions first; a single-file scan would otherwise hash the whole
    corpus on one core.
    """
    sh = char_shingles(F.lower(F.trim(F.col(text_col))), shingle_size)
    base = spread(df, id_col, cpu=True).select(
        F.col(id_col).alias("id"), sh.alias("shingles")
    )
    # the k-family fold lands as ONE parsed SQL expression: building it
    # from Column objects costs O(n_hashes) py4j round-trips per plan
    # (measured 0.7 s portable / 0.45 s xxhash64 PER CONSTRUCTION, and
    # the index/probe rows construct it 2-3x per query); the parsed
    # tree is the same arithmetic in the same order, so every stored
    # signature value is unchanged. Same fix as _pq_lut_expr and
    # portable_hyperplane_signature.
    if portable:
        fams = [portable_family(i) for i in range(n_hashes)]
        init = ", ".join(f"CAST({PORTABLE_P} AS BIGINT)" for _ in range(n_hashes))
        upd = ", ".join(f"({a} * h + {b}) % {PORTABLE_P}" for a, b in fams)
        sig = F.expr(
            "aggregate("
            "transform(shingles, s -> "
            f"CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % {PORTABLE_P}), "
            f"array({init}), "
            f"(acc, h) -> zip_with(acc, array({upd}), (x, y) -> least(x, y)))"
        )
        return base.select("id", "shingles", sig.alias("sig"))
    max_long = (1 << 63) - 1
    init = ", ".join(f"CAST({max_long} AS BIGINT)" for _ in range(n_hashes))
    upd = ", ".join(f"xxhash64(s, {i})" for i in range(n_hashes))
    sig = F.expr(
        f"aggregate(shingles, array({init}), "
        f"(acc, s) -> zip_with(acc, array({upd}), (a, b) -> least(a, b)))"
    )
    return base.select("id", "shingles", sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    n_hashes: int | None = None,
    max_pairs_per_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` blocks, bucket rows
    whose block hashes collide, emit distinct candidate pairs (a < b).

    The self-join keys on (band_index, band_hash): only same-band
    collisions join, so the shuffle key is high-cardinality and the join
    never degenerates to a cross product. At scale, skewed buckets (e.g.
    boilerplate-heavy corpora) are handled by AQE skew-join splitting.

    ``max_pairs_per_bucket`` is the production-safety valve for the one
    failure mode AQE cannot fix: a CLONE CLUSTER (m byte-identical or
    near-identical docs) puts all m members in the same bucket in EVERY
    band, and the self-join emits O(m²) pairs — unbounded output
    quadratic in clone mass, enough to exhaust an executor when a crawl
    carries a boilerplate page repeated 10⁶ times. With the cap set,
    each (band, hash) bucket keeps only its first ``m_keep`` members in
    deterministic id order, where C(m_keep, 2) ≤ max_pairs_per_bucket,
    bounding output at bands × max_pairs_per_bucket pairs per cluster.
    Truncation is NEVER silent: the function runs a bounded aggregation
    over the over-cap buckets and logs how many buckets were truncated,
    how many members were dropped, and the worst bucket size (logger
    ``traceframe_spark.dedup``). Recall within a truncated cluster is
    deliberately reduced to pairs among its retained members — a clone
    cluster's members are interchangeable for dedup purposes (any
    spanning set of pairs collapses it via connected components). The
    default (None) is exact, unchanged behavior; pipelines should
    prefer :func:`dedup_pipeline`, whose exact stage removes clone mass
    before LSH ever runs, and keep this cap as defense in depth.
    ``max_pairs_per_bucket`` must be >= 1 (a pair cannot be emitted
    from fewer than 2 members, so the effective floor is C(2,2) = 1
    pair per bucket; asking for less is a contract error, rejected with
    ValueError). Enabling the cap costs one extra BOUNDED aggregation
    job per call (the truncation report, one row per over-cap bucket
    collapsed to one row) even when nothing ends up truncated.
    """
    if max_pairs_per_bucket is not None and max_pairs_per_bucket < 1:
        raise ValueError(
            f"max_pairs_per_bucket={max_pairs_per_bucket} < 1: the cap floor "
            "is one pair per bucket (two retained members); use None for "
            "exact uncapped behavior"
        )
    n = n_hashes if n_hashes is not None else signatures.select(F.size("sig")).first()[0]
    rows_per_band = max(n // bands, 1)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    buckets = signatures.select("id", F.explode(band_entries).alias("e")).select(
        "id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    if max_pairs_per_bucket is not None:
        import math

        # largest member count whose pair count stays within the cap
        m_keep = max(int((1 + math.isqrt(1 + 8 * max_pairs_per_bucket)) // 2), 2)
        ranked = buckets.withColumn(
            "_r",
            F.row_number().over(Window.partitionBy("band", "bh").orderBy("id")),
        ).persist()
        report = (
            ranked.filter(F.col("_r") > m_keep)
            .groupBy("band", "bh")
            .agg(F.count("*").alias("dropped"), F.max("_r").alias("bucket_size"))
            .agg(
                F.count("*").alias("n_buckets_truncated"),
                F.coalesce(F.sum("dropped"), F.lit(0)).alias("n_members_dropped"),
                F.coalesce(F.max("bucket_size"), F.lit(0)).alias("worst_bucket"),
            )
            .first()
        )
        if report["n_buckets_truncated"]:
            _LOG.warning(
                "lsh_candidate_pairs: max_pairs_per_bucket=%d truncated %d "
                "bucket(s) to %d members each (%d memberships dropped; "
                "largest bucket had %d members). Clone-cluster recall is "
                "bounded to pairs among retained members — run exact dedup "
                "first (dedup_pipeline) to remove clone mass.",
                max_pairs_per_bucket,
                report["n_buckets_truncated"],
                m_keep,
                report["n_members_dropped"],
                report["worst_bucket"],
            )
        buckets = ranked.filter(F.col("_r") <= m_keep).drop("_r")
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if max_pairs_per_bucket is not None:
        pairs = _unpersist_with(pairs, ranked)
    return pairs


def cross_near_dup_subtract(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    n_hashes: int = 64,
    bands: int | None = None,
    shingle_size: int = 5,
) -> DataFrame:
    """Asymmetric near-dup filtering: drop every ``corpus`` doc whose
    exact shingle-Jaccard with ANY ``reference`` doc is ≥ ``threshold``;
    the reference side is never modified. The cross-corpus form of
    dedup a pipeline runs against an already-curated snapshot or a
    held-out eval suite.

    Same LSH shape as :func:`minhash_dedup_pairs` but the band-bucket
    join is corpus×reference (not a self-join, no id ordering), and id
    collisions between the two tables are safe — each side verifies
    against its own signature frame. Returns the surviving corpus rows.
    """
    bands = bands or bands_for_threshold(threshold, n_hashes)
    rows_per_band = max(n_hashes // bands, 1)

    def buckets(sig: DataFrame) -> DataFrame:
        band_entries = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.hash(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bh"),
                )
                for b in range(bands)
            ]
        )
        return sig.select("id", F.explode(band_entries).alias("e")).select(
            "id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
        )

    sig_c = minhash_signatures(corpus, id_col, text_col, n_hashes, shingle_size).persist()
    sig_r = minhash_signatures(reference, id_col, text_col, n_hashes, shingle_size).persist()
    cand = (
        buckets(sig_c).alias("c")
        .join(buckets(sig_r).alias("r"), ["band", "bh"])
        .select(F.col("c.id").alias("id_c"), F.col("r.id").alias("id_r"))
        .distinct()
    )
    joined = (
        cand.join(
            sig_c.select(F.col("id").alias("id_c"), F.col("shingles").alias("sh_c")),
            "id_c",
        ).join(
            sig_r.select(F.col("id").alias("id_r"), F.col("shingles").alias("sh_r")),
            "id_r",
        )
    )
    inter = F.size(F.array_intersect("sh_c", "sh_r")).cast("double")
    union = F.size(F.array_union("sh_c", "sh_r")).cast("double")
    contaminated = (
        joined.filter(inter / union >= threshold).select(F.col("id_c").alias("_drop"))
        .distinct()
    )
    survivors = corpus.join(
        contaminated, corpus[id_col] == contaminated["_drop"], "left_anti"
    )
    return _unpersist_with(survivors, sig_c, sig_r)


def jaccard_verify(
    candidates: DataFrame, signatures: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs' shingle sets; keeps pairs ≥
    threshold. Joins are id-equi (broadcast-able when the candidate set
    is small relative to the corpus)."""
    sh = signatures.select("id", "shingles")
    joined = (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def bands_for_threshold(threshold: float, n_hashes: int = 64) -> int:
    """Pick the band count whose LSH S-curve midpoint (1/b)^(r/n... i.e.
    (1/b)^(1/r) with r = n/b) sits closest below ``threshold``: high
    thresholds want FEW bands of many rows (strict buckets, few
    candidates), low thresholds many bands (high recall)."""
    best, best_gap = 16, float("inf")
    for b in (2, 4, 8, 16, 32):
        if n_hashes % b:
            continue
        r = n_hashes // b
        midpoint = (1.0 / b) ** (1.0 / r)
        gap = threshold - midpoint
        if 0 <= gap < best_gap:
            best, best_gap = b, gap
    return best


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int | None = None,
    shingle_size: int = 5,
    max_pairs_per_bucket: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs: signatures → banded
    candidates → exact-Jaccard verification at ``threshold``.

    ``bands=None`` tunes banding to the threshold (16 bands of 4 rows
    catch ~0.5-jaccard pairs but flood the verifier with candidates when
    only ≥0.9 pairs are wanted). Signatures persist for the plan's
    lifetime: the bucket explode and both verify joins would otherwise
    each recompute the signature subplan.

    ``max_pairs_per_bucket`` (default None = exact) bounds candidate
    output per LSH bucket against clone-cluster blowup — see
    :func:`lsh_candidate_pairs` for the truncation semantics and the
    logged report. Prefer :func:`dedup_pipeline` in production; this
    cap makes the RAW operator survivable on adversarial corpora.

    ``sigs`` (optional) supplies a PRECOMPUTED :func:`minhash_signatures`
    frame covering exactly ``df``'s rows — the sharing seam for callers
    that need the same signatures again downstream (the streaming ingest
    signs each micro-batch once and feeds both the within-batch pipeline
    and the index probe). Caller contract: same id/text normalization,
    ``n_hashes`` and ``shingle_size`` as this call's arguments, and the
    caller owns the frame's persist/unpersist lifecycle.
    """
    if bands is None:
        bands = bands_for_threshold(threshold, n_hashes)
    own_sigs = sigs is None
    if own_sigs:
        sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_size).persist()
    cands = lsh_candidate_pairs(
        sigs, bands, n_hashes=n_hashes, max_pairs_per_bucket=max_pairs_per_bucket
    )
    verified = jaccard_verify(cands, sigs, threshold)
    return _unpersist_with(verified, sigs) if own_sigs else verified


def simhash64(col: Column, shingle_size: int = 4) -> Column:
    """64-bit SimHash fingerprint, fully JVM-side.

    Each shingle hash votes ±1 per bit position; the fingerprint takes
    the sign of each bit's vote sum. Expressed as a fold over an
    array<int> accumulator of the 64 counters — stays in codegen, no
    Python exchange.

    NOTE: this single-expression form carries a large codegen cost on
    first compile (~10 s); :func:`simhash_fingerprints` is the
    aggregate-shaped equivalent used by the pair finder.
    """
    sh = char_shingles(F.lower(F.trim(col)), shingle_size)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # bit positions are unrolled as Python literals: shiftright/shiftleft
    # take only literal shift amounts.
    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int") for i in range(64)]),
            lambda a, bit: a + (bit * 2 - 1),
        ),
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(F.get(votes, i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


# sign-of-vote bit packing shared by both simhash_fingerprints paths:
# left-associated OR chain from 0L, exactly the Column-built original
_FP_OR_CHAIN = "CAST(0 AS BIGINT)" + "".join(
    f" | (CASE WHEN _v{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
    "ELSE CAST(0 AS BIGINT) END)"
    for i in range(64)
)


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 4,
    portable: bool = False,
) -> DataFrame:
    """(id, fp) SimHash fingerprints via explode + 64 conditional-sum
    aggregates — map-side combinable, small generated methods (the
    one-expression :func:`simhash64` is semantically identical but pays
    ~10 s of whole-stage codegen compilation on first use).

    ``portable=True`` draws the 64 vote bits from the first 16 hex
    chars of md5(shingle) (two 32-bit halves) instead of xxhash64 —
    the same trick as the portable MinHash families: every vote, the
    fingerprint, the block keys, and the hamming verify become exactly
    replayable in ANSI SQL, so the raw SimHash near-dup pair set
    (recall effects included) can be value-checked by an external
    oracle. Cost: one md5 per distinct shingle instead of one xxhash64
    (same shape, marginally slower hash)."""
    sh = char_shingles(F.lower(F.trim(F.col(text_col))), shingle_size)
    # hash hoisted into a projection: runtime subexpression elimination
    # would dedup the 64 copies anyway, but one shared column keeps the
    # generated aggregate code small (3x faster first-run compile)
    base = spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(sh).alias("sh")
    )
    if portable:
        # bit i of the vote vector: i < 32 from h1 (md5 hex chars 1-8),
        # else from h2 (chars 9-16). Both halves < 2^32, so every shift
        # and mask is identical signed-64 arithmetic in Spark and DuckDB.
        exploded = base.select(
            "id",
            F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5("sh"), 9, 8), 16, 10).cast("long").alias("h2"),
        )
        # the 64 vote aggregates and the 64-term fingerprint OR-chain
        # land as parsed SQL (one F.expr each / one for the chain):
        # the Column-built forms cost ~1.8 s of py4j PER CONSTRUCTION
        # (measured); same expressions, same votes, same fingerprint
        votes = exploded.groupBy("id").agg(
            *[
                F.expr(
                    "sum(CAST(shiftright("
                    + ("h1" if i < 32 else "h2")
                    + f", {i if i < 32 else i - 32}) & 1 AS INT) * 2 - 1)"
                ).alias(f"_v{i}")
                for i in range(64)
            ]
        )
        return votes.select("id", F.expr(_FP_OR_CHAIN).alias("fp"))
    exploded = base.select("id", F.xxhash64(F.col("sh")).alias("h"))
    votes = exploded.groupBy("id").agg(
        *[
            F.expr(f"sum(CAST(shiftright(h, {i}) & 1 AS INT) * 2 - 1)").alias(f"_v{i}")
            for i in range(64)
        ]
    )
    return votes.select("id", F.expr(_FP_OR_CHAIN).alias("fp"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    shingle_size: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of 4
    16-bit blocks (pigeonhole guarantees recall for hamming ≤ 3), then
    exact hamming distance filters. ``portable=True`` switches the
    fingerprints to the md5-derived SQL-replayable bit families (see
    :func:`simhash_fingerprints`).

    Fingerprints persist for the plan's lifetime: the self-join's two
    sides would otherwise each recompute the full shingle explode +
    64-way aggregation (no exchange reuse across a broadcast build)."""
    fp = simhash_fingerprints(
        df, id_col, text_col, shingle_size, portable=portable
    ).persist()
    return _unpersist_with(hamming_block_pairs(fp, max_hamming), fp)


def hamming_block_pairs(fp_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs over ANY (id, fp) 64-bit fingerprint relation —
    the pigeonhole machinery shared by text SimHash and perceptual
    image hashes: candidates agree on at least one of 4 16-bit blocks
    (guaranteed recall for hamming ≤ 3; wider cutoffs trade recall the
    same way everywhere), then exact ``bit_count(xor)`` filters.

    Output: (id_a, id_b, hamming), id_a < id_b, distinct. One shuffle
    keyed on (block, key) — bucket occupancy, not corpus size, bounds
    the self-join, the same 100 TB shape as banded MinHash."""
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.shiftright(F.col("fp"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for b in range(4)
        ]
    )
    keyed = fp_df.select("id", "fp", F.explode(blocks).alias("e")).select(
        "id", "fp", F.col("e.block").alias("block"), F.col("e.key").alias("key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    hamming = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_size: int = 5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted shingle index:
    explode distinct shingles, self-join on shingle, count shared
    shingles per pair, compute |A∩B| / (|A|+|B|-|A∩B|).

    Exact but O(pairs sharing a shingle) — use on bounded candidate
    subsets; MinHash-LSH is the scale path.
    """
    sh = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        char_shingles(F.lower(F.trim(F.col(text_col))), shingle_size).alias("shingles"),
    )
    sizes = sh.select("id", F.size("shingles").alias("n_sh"))
    inv = sh.select("id", F.explode("shingles").alias("sh"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_size: int = 5,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT ``C(sub→sup) = |sub ∩ sup| / |sub|``
    — the quote/excerpt detector Jaccard cannot be: a short document
    embedded verbatim in a long one has containment ≈ 1 while Jaccard
    ≈ |sub|/|sup| stays arbitrarily low, so symmetric near-dup passes
    miss exactly the "eval question quoted inside a training document"
    case decontamination cares about (Broder's containment measure,
    1997).

    One inverted shingle index, one self-join on shingle (a < b), then
    BOTH directions are emitted from the single shared-count aggregate
    (union of a→b and b→a with the matching denominator) and filtered
    at ``threshold``. Exact and O(pairs sharing a shingle) like
    :func:`ngram_jaccard_pairs` — bounded candidate subsets; at corpus
    scale route candidates through MinHash-LSH or
    :func:`cross_near_dup_subtract` first and use this as the exact
    verifier. Output: (id_sub, id_super, containment).
    """
    sh = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        char_shingles(F.lower(F.trim(F.col(text_col))), shingle_size).alias("shingles"),
    )
    sizes = sh.select("id", F.size("shingles").alias("n_sh"))
    inv = sh.select("id", F.explode("shingles").alias("sh"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
        .join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
    )
    fwd = common.select(
        F.col("id_a").alias("id_sub"),
        F.col("id_b").alias("id_super"),
        (F.col("n_common").cast("double") / F.col("n_a").cast("double")).alias(
            "containment"
        ),
    )
    rev = common.select(
        F.col("id_b").alias("id_sub"),
        F.col("id_a").alias("id_super"),
        (F.col("n_common").cast("double") / F.col("n_b").cast("double")).alias(
            "containment"
        ),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


# ---------------------------------------------------------------------------
# Exact substring (duplicated-window) deduplication
# ---------------------------------------------------------------------------


def _word_tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit(""))


def duplicated_window_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 8,
) -> DataFrame:
    """Token positions covered by EXACT duplicated runs — the
    duplicated-substring dedup of Lee et al., *Deduplicating Training
    Data Makes Language Models Better* (arXiv:2107.06499), re-expressed
    relationally: every ``window_tokens``-token sliding window whose
    content occurs more than once in the corpus (any document,
    including its own) marks its position as duplicated — EXCEPT at the
    canonical occurrence, the corpus-wide (min doc id, min position)
    holder of that window, which survives so one copy of every repeated
    passage remains.

    Returns ``(id, pos)`` rows: 1-based token start positions of
    non-canonical duplicated windows.

    Scale shape: windows travel as 64-bit ``xxhash64`` keys, never
    window strings — the explode is O(tokens) rows of (id, pos, hash);
    ONE aggregation finds each hash's occurrence count and canonical
    holder (``min_by`` under the total (id, pos) order, with map-side
    partials); an equi-join routes the surviving marks back. Collision
    risk: a 64-bit hash pair-collides at ~1e-9 per billion distinct
    windows, and a collision can only over-remove one window, never
    corrupt the canonical copy.
    """
    toks = _word_tokens(F.col(text_col))
    base = spread(df, id_col).select(F.col(id_col).alias("id"), toks.alias("toks"))
    nwin = F.size("toks") - (window_tokens - 1)
    # the when-guard matters: F.sequence(1, 0) is a DESCENDING [1, 0],
    # not empty, and its pos=0 element makes slice() throw — a doc
    # shorter than the window must contribute zero windows
    starts = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
        F.array().cast("array<int>")
    )
    wins = base.select(
        "id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(
                        F.concat_ws("\x1f", F.slice("toks", i, window_tokens))
                    ).alias("whash"),
                ),
            )
        ).alias("w"),
    ).select("id", F.col("w.pos").alias("pos"), F.col("w.whash").alias("whash"))
    per_hash = wins.groupBy("whash").agg(
        F.count("*").alias("n_occ"),
        F.min_by(F.struct("id", "pos"), F.struct("id", "pos")).alias("canon"),
    )
    return (
        wins.join(per_hash.filter(F.col("n_occ") >= 2), "whash")
        .filter(
            (F.col("id") != F.col("canon.id")) | (F.col("pos") != F.col("canon.pos"))
        )
        .select("id", "pos")
    )


def remove_duplicated_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 8,
) -> DataFrame:
    """Cut non-canonical duplicated runs out of each document.

    Tokens covered by any non-canonical duplicated window (see
    :func:`duplicated_window_spans`) are dropped; the survivors rejoin
    with single spaces into ``<text_col>_dedup``, ORIGINAL CASE
    preserved — window matching is case-insensitive (the detector
    lowercases for hashing) but reconstruction re-splits the raw text,
    whose whitespace token positions are identical. Documents without
    duplicated runs pass through (modulo whitespace normalization,
    which applies uniformly).

    The per-document interval union is an array expression: dup starts
    collect to one bounded array per doc (at most one per token), and
    each token position tests coverage with a single ``exists`` -
    no Python in the loop.
    """
    w = window_tokens
    spans = duplicated_window_spans(df, id_col, text_col, w)
    per_doc = spans.groupBy(F.col("id").alias("_dup_id")).agg(
        F.sort_array(F.collect_list("pos")).alias("dup_starts")
    )
    # case-preserving tokens: same \s+ structure as the detector's
    # lowercased tokens, so positions line up one-to-one
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    return (
        df.join(per_doc, df[id_col] == per_doc["_dup_id"], "left")
        .drop("_dup_id")
        .withColumn("_toks", toks)
        .withColumn(
            "_kept",
            F.when(F.col("dup_starts").isNull(), F.col("_toks")).otherwise(
                # 0-based token index p is covered by a dup window with
                # 1-based start s iff s-1 <= p <= s-1 + (w-1)
                F.filter(
                    F.col("_toks"),
                    lambda t, p: ~F.exists(
                        F.col("dup_starts"),
                        lambda s: (p >= s - 1) & (p <= s + F.lit(w - 2)),
                    ),
                )
            ),
        )
        .withColumn(f"{text_col}_dedup", F.concat_ws(" ", "_kept"))
        .drop("_toks", "_kept", "dup_starts")
    )


def dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    n_hashes: int = 64,
    bands: int | None = None,
    shingle_size: int = 5,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """The production dedup composition: exact dedup → MinHash-LSH on
    the residual → connected-component clustering → keep-one-per-
    cluster. Returns the surviving rows of ``df`` unchanged in shape.

    ``sigs`` (optional): a precomputed :func:`minhash_signatures` frame
    covering ``df``'s rows (superset is fine — it is filtered to the
    exact-stage residual here, so foreign ids can never become cluster
    canonicals). Same caller contract as
    :func:`minhash_dedup_pairs(sigs=...)`: matching params and
    caller-owned persistence. This is how the streaming ingest avoids
    signing each micro-batch twice (once here, once in the index probe).

    This IS the 100 TB answer to clone-heavy corpora (crawl snapshots,
    mirrored docs): raw MinHash-LSH output is quadratic in clone-cluster
    size — a corpus where every doc has 99 byte-identical copies emits
    ~n·99²/2 candidate pairs and exhausts any executor. Stage 1
    collapses byte-identical content with ONE partial-aggregating
    shuffle of (id, md5) pairs — never the document bytes — so LSH only
    ever sees one representative per exact clone set and its cost
    follows the residual *near*-duplicate mass, which real corpora keep
    small. Stage 3 turns surviving near-dup pairs into canonical
    clusters with the O(log² n) star contraction (operators/graph.py).

    Exact-stage key: ``md5(lower(trim(text)))`` — 128 bits, so engine/
    oracle collision divergence is not a practical concern, and the
    normalization matches the shingling in :func:`minhash_signatures`
    (a doc differing only in case/outer whitespace IS an exact dup).

    No reference analogue (the reference's only dedup is spanID
    ``drop_duplicates``, ``/root/reference/traceframe/traceframe.py:
    629-630``); this is the composition its pipeline would need first
    at training-data scale.
    """
    from traceframe_spark.operators.graph import connected_components, keep_canonical

    keep = exact_canonical_ids(df, id_col, text_col).select("_canon_id")
    residual = df.join(
        keep, df[id_col] == keep["_canon_id"], "left_semi"
    ).persist()
    if sigs is not None:
        # restrict to the residual: a foreign id surviving in the shared
        # frame would otherwise enter the candidate pairs and could be
        # elected a cluster canonical, dropping every real member
        sigs = sigs.join(keep, sigs["id"] == keep["_canon_id"], "left_semi")
    pairs = minhash_dedup_pairs(
        residual, id_col, text_col, threshold, n_hashes, bands, shingle_size,
        sigs=sigs,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    out = keep_canonical(residual, id_col, comp)
    return _unpersist_with(carry_cache(out, pairs), residual)


def containment_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_size: int = 5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Corpus-scale asymmetric containment: exact-clone collapse →
    prefix-filtered candidate routing → exact containment verification.
    Returns ``(id_sub, id_super, containment)`` pairs ≥ ``threshold``
    among exact-canonical representatives — EXACTLY the
    :func:`containment_pairs` answer on the collapsed corpus, because
    the candidate stage has provably zero false negatives (below); the
    verifier stage IS :func:`containment_pairs`' measure, evaluated
    only on routed candidates.

    Candidate routing is deliberately NOT MinHash-LSH: Jaccard-banded
    LSH buckets by the SYMMETRIC measure, and the asymmetric pairs this
    operator exists for (a short eval question quoted verbatim inside a
    long training doc) have Jaccard ≈ |sub|/|sup| — arbitrarily far
    below any useful band threshold — so LSH routing forfeits exactly
    the recall containment is asked to provide. Instead, PREFIX
    FILTERING (Chaudhuri-Ganti-Kaushik, ICDE 2006; the PPJoin family,
    Xiao et al., WWW 2008), which is exact by pigeonhole: if
    ``C(A→B) = |A∩B|/|A| ≥ t`` then ``|A∖B| ≤ floor((1-t)·|A|)``, so
    ANY ``floor((1-t)·|A|) + 1`` distinct shingles of A must include at
    least one shingle of B. Probing each doc's that-many RAREST
    shingles (ascending corpus document-frequency — the ordering that
    makes the probed posting lists short) against the full inverted
    index therefore surfaces every qualifying (sub, super) pair in
    both directions.

    Scale shape: one narrow (id, md5) shuffle for stage 1; one
    document-frequency aggregation; one per-doc window (partitioned by
    id) to rank shingles; one equi-join of ~(1-t)·|shingles| probe rows
    against the inverted index — candidate-mass cost, not corpus², and
    the AQE skew machinery applies to any residual hot shingle. The
    clone blowup that breaks raw inverted-index self-joins (m copies of
    one page multiply every posting list they touch by m, and emit m²
    pairs) is removed by stage 1: collapsed, each content appears once,
    and every clone of a canonical doc has its canonical's exact
    containment BY TEXT IDENTITY — expand through the content key if
    per-clone pairs are needed. For sketch-only routing at
    internet scale see LSH Ensemble (Zhu et al., VLDB 2016 —
    size-partitioned banding for containment); unnecessary here because
    the prefix join is exact in the same shuffle class.
    """
    from pyspark.sql.window import Window

    base = df
    if collapse_exact:
        keep = exact_canonical_ids(df, id_col, text_col).select("_canon_id")
        base = df.join(keep, df[id_col] == keep["_canon_id"], "left_semi")
    # localCheckpoint, NOT persist: downstream the shingle frame feeds
    # several BROADCAST builds (dfreq, prefix, cand) whose jobs launch
    # concurrently — with a lazy persist each re-ran the whole shingle
    # subtree inside its own few-task broadcast stage (measured: three
    # ~2 s broadcast-build stages per call, the row's dominant cost),
    # and the cache keepalive dies as soon as a caller derives a new
    # plan from the returned frame (the dedup_against_index finding).
    # cpu=True pins the shingle kernel wide — AQE coalesces the tiny
    # compressed text shuffle to 1-2 partitions, the wrong width for a
    # CPU-bound per-row kernel.
    sh = (
        spread(base, id_col, cpu=True)
        .select(
            F.col(id_col).alias("id"),
            char_shingles(F.lower(F.trim(F.col(text_col))), shingle_size).alias(
                "shingles"
            ),
        )
        .localCheckpoint()
    )
    inv = sh.select("id", F.explode("shingles").alias("sh"))
    dfreq = inv.groupBy("sh").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("id").orderBy("_df", "sh")
    prefix = (
        inv.join(dfreq, "sh")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("id")))
        .filter(
            # FP-safe pigeonhole bound: (1 - 0.8) is 0.19999999999999996
            # in binary, so floor((1-t)*n) under-counts by one whenever
            # (1-t)*n is exactly integral (every n that is a multiple of
            # 5 at t=0.8) — one probe shingle too few silently drops a
            # pair sitting exactly on the containment boundary. round(,9)
            # snaps the <1e-9 representation error back before floor; a
            # true product within 5e-10 of an integer can only round UP,
            # which adds candidates (never false negatives).
            F.col("_rn")
            <= F.floor(
                F.round((F.lit(1.0) - F.lit(threshold)) * F.col("_n"), 9)
            ).cast("long")
            + F.lit(1)
        )
        .select(F.col("id").alias("id_sub"), "sh")
    )
    cand = (
        prefix.join(inv.withColumnRenamed("id", "id_super"), "sh")
        .filter(F.col("id_sub") != F.col("id_super"))
        .select("id_sub", "id_super")
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_sub"), F.col("shingles").alias("_sh_sub")),
            "id_sub",
        )
        .join(
            sh.select(
                F.col("id").alias("id_super"), F.col("shingles").alias("_sh_sup")
            ),
            "id_super",
        )
        .select(
            "id_sub",
            "id_super",
            (
                F.size(F.array_intersect("_sh_sub", "_sh_sup")).cast("double")
                / F.size("_sh_sub").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return verified
