"""Deterministic sampling operators for corpus curation.

Domain-mixture reweighting: training pipelines resample each source
("domain") at its own rate — boosting high-quality domains, shrinking
boilerplate-heavy ones (the fixed-weight form of DoReMi-style mixture
tuning). The engine-portable idiom is hash-ORDERED selection, not RNG:
rank each domain's rows by ``md5(id)`` and keep the top
``ceil(rate * n_domain)``. The same query re-run on the same data
returns the same sample, any SQL engine reproduces it bit-for-bit, and
at scale it is one window shuffle partitioned by domain — no driver
involvement, no RNG seeds to coordinate across executors.

Related: per-stratum fixed-N sampling lives in
``plans/temporal.q_stratified_sample``; this is the rate-based
(proportional) variant a mixture spec needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_domain_sample(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep a deterministic ``rates[domain]`` fraction of each domain's
    rows (hash-ordered, so reproducible across runs and engines).

    Rates are capped to [0, 1] downsampling; to UPsample a domain
    (rate > 1), explode ``ceil(rate)`` copies and apply the fractional
    remainder with this same operator.
    """
    mapping = F.create_map(
        *[F.lit(x) for k, v in rates.items() for x in (k, float(v))]
    )
    rate = F.coalesce(mapping[F.col(domain_col)], F.lit(float(default_rate)))
    w_rank = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    w_all = Window.partitionBy(domain_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_keep_n", F.ceil(rate * F.count("*").over(w_all)))
        .filter((F.col("_rn") <= F.col("_keep_n")) & (rate > 0))
        .drop("_rn", "_keep_n")
    )


def md5_uniform(col) -> F.Column:
    """Deterministic pseudo-uniform draw in ``[0, 2^32)`` from a key:
    the first 8 hex digits of ``md5(key)`` as a bigint. md5 is bit-
    identical in every engine (unlike xxhash64 seeds or RNGs), so a
    sample defined on this draw is reproducible by any SQL oracle and
    stable under Spark task retries — the properties per-row
    ``rand()`` sacrifices."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def bernoulli_quality_sample(
    df: DataFrame,
    keep_prob,
    id_col: str = "doc_id",
    prob_scale: int = 4,
) -> DataFrame:
    """Per-row deterministic Bernoulli thinning: keep a row iff its
    md5-uniform draw falls under ``keep_prob`` (a Column in [0, 1],
    typically a quality score).

    The comparison is pure integer math — ``u * 10^prob_scale <
    p_q * 2^32`` with ``p_q`` the half-up-quantized probability — so
    there is no float boundary for engines to disagree on. Unlike
    :func:`weighted_domain_sample` (rank-based, one window shuffle)
    this is a ZERO-SHUFFLE scan: each row decides independently, the
    filter pushes into the scan, and the plan is embarrassingly
    parallel at any scale. The trade: realized rates converge to
    ``keep_prob`` only in expectation, not exactly per partition.

    Returns the surviving rows plus ``p_q`` (quantized probability)
    and ``u32`` (the draw) for auditability.
    """
    p_q = F.floor(keep_prob * (10**prob_scale) + F.lit(0.5)).cast("long")
    u = md5_uniform(F.col(id_col))
    return (
        df.withColumn("p_q", p_q)
        .withColumn("u32", u)
        .filter(F.col("u32") * (10**prob_scale) < F.col("p_q") * F.lit(4294967296))
    )


def leakage_safe_split(
    df: DataFrame,
    rates: dict[str, float],
    text_col: str = "text",
    cluster_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment that CANNOT leak
    duplicate content across splits: the split is drawn from the
    document's content-cluster key, never its id, so byte-identical
    documents (after lower/trim normalization) land in the same split
    by construction. Pass ``cluster_col`` (e.g. the canonical id from
    ``graph.connected_components`` over MinHash-LSH pairs) to extend
    the guarantee to NEAR-duplicate clusters.

    Splitting on row id is the classic eval-contamination bug: a
    benchmark answer duplicated into the crawl lands in train while
    its twin lands in eval, and the eval silently measures memorized
    text. Keying the draw on content removes the failure mode without
    a join — one zero-shuffle scan when ``cluster_col`` is None.

    ``rates`` maps split name -> fraction, summing to 1 (validated).
    Assignment: the md5-uniform draw of the cluster key is compared
    against cumulative integer thresholds ``floor(cum_rate * 2^32)``
    in split-name insertion order — pure integer math, reproducible
    by any SQL engine. Returns ``df`` plus ``split``.
    """
    total = sum(rates.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split rates must sum to 1, got {total}")
    from traceframe_spark.operators.dedup import content_key

    key = F.col(cluster_col) if cluster_col is not None else content_key(text_col)
    u = md5_uniform(key)
    expr = None
    cum = 0.0
    names = list(rates)
    for name in names[:-1]:
        cum += rates[name]
        cond = u < F.lit(int(cum * 4294967296))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def temperature_domain_sample(
    df: DataFrame,
    budget: int,
    temperature: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-training
    recipe): target weight ``w_s ∝ (n_s/N)^T`` with ``T < 1`` flattening
    the natural distribution toward uniform (T=1 keeps it, T→0 equalizes
    domains), then keep ``min(ceil(w_s · budget), n_s)`` rows per domain
    by the deterministic md5 hash order. Downsampling only — a domain
    whose target exceeds its size contributes everything it has (cap,
    not upsample; explode copies upstream if true upsampling is needed).

    The per-domain quota table is computed from the domain-count
    aggregate COLLECTED to the driver — domains are a bounded dimension
    (same justification as the rate-table discovery in
    ``plans/temporal.q_domain_mix``), so this is a |domains|-row
    transfer, never corpus-scale. It also sidesteps a Spark 4 analyzer
    quirk: cross-joining an aggregate back onto the frame it derives
    from raises AMBIGUOUS_REFERENCE for the original count column even
    though the two outputs are name-disjoint. The normalization uses
    the N-free identity ``w_s/Z = n_s^T / Σ n_t^T``; selection is the
    same per-domain hash-rank window as :func:`weighted_domain_sample`.
    """
    counts = {
        r[domain_col]: r["_n"]
        for r in df.groupBy(domain_col).agg(F.count("*").alias("_n")).collect()
        # NULL domains are DROPPED from the mixture (they cannot key the
        # quota map — Spark rejects null map keys — and a row with no
        # domain has no defensible mixture weight); filter upstream to
        # keep them under an explicit bucket instead
        if r[domain_col] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    import math

    # Determinism contract: collect() returns domains in nondeterministic
    # order and float addition is non-associative, so Z is computed with
    # math.fsum (exactly-rounded — the result is the double nearest the
    # true sum, independent of term order) over key-sorted terms. A ceil()
    # sitting exactly on a ULP boundary therefore cannot flip between runs;
    # the SQL oracle's own summation order agrees because fsum's answer is
    # the correctly-rounded one.
    z = math.fsum(n**temperature for _, n in sorted(counts.items()))
    quota = {
        s: min(math.ceil(n**temperature / z * budget), n)
        for s, n in sorted(counts.items())
    }
    quota_map = F.create_map(
        *[F.lit(x) for s, k in quota.items() for x in (s, k)]
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota_map[F.col(domain_col)])
        .drop("_rn")
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically:
    Efraimidis-Spirakis priority sampling (IPL 2006) — each row draws
    ``u = md5_uniform(id) / 2^32`` and keeps priority ``u^(1/w)``; the
    k largest priorities ARE a weighted sample without replacement
    (inclusion probability proportional to weight, exactly). The draw
    is keyed on the row id, so the sample is reproducible across runs,
    engines, and Spark task retries — rand()-based weighted sampling is
    none of those. Rows with weight <= 0 are excluded (they cannot be
    drawn under the scheme and 1/w would be undefined).

    One scan + a TakeOrderedAndProject top-k (per-partition heaps, a
    k-row driver merge) — no shuffle of the corpus, so the selection
    cost at 100 TB is the scan. The id tie-break makes the order total
    (ranked_topk's documented contract). Output: the sampled rows plus
    their ``priority``.

    Rank machinery by sample size: ``k <= RANKED_TOPK_MAX`` (100) uses
    :func:`~traceframe_spark.functions.ranked_topk`'s bounded
    single-window rank; a realistically sized corpus sample (k = 1e3 …
    1e7) falls back to :func:`~traceframe_spark.functions.
    partitioned_topk` — same TakeOrderedAndProject selection, global
    rank from a range-partitioned window — so no k cap applies to this
    operator.
    """
    from traceframe_spark.functions import RANKED_TOPK_MAX, partitioned_topk, ranked_topk

    w = F.col(weight_col).cast("double")
    u = (md5_uniform(F.col(id_col)).cast("double") + F.lit(1.0)) / F.lit(
        4294967296.0
    )  # (0, 1]: +1 keeps u > 0 so priority stays defined for any weight
    pri = F.pow(u, F.lit(1.0) / w)
    keyed = df.filter(w > 0).withColumn("priority", pri)
    order = [F.col("priority").desc(), F.col(id_col).asc()]
    if k <= RANKED_TOPK_MAX:
        return ranked_topk(keyed, order, k, rank_col="rank")
    return partitioned_topk(keyed, order, k, rank_col="rank")


def _md5_bucket(col: F.Column, buckets: int) -> F.Column:
    """Engine-portable feature hash: first 8 md5 hex digits mod
    ``buckets``. DuckDB mirror: ``('0x' || substr(md5(g),1,8))::BIGINT
    % buckets`` — bit-identical, unlike xxhash64 (not in DuckDB) or
    murmur (seed-mismatched across engines)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(buckets)
    )


def dsir_importance(
    df: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2302.03169 "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is, so a raw
    100 TB crawl can be resampled toward a small high-quality target
    distribution without training a classifier.

    Features are unigrams + bigrams of lowercased whitespace tokens,
    hashed into ``buckets`` counts (the paper's hashed n-gram feature
    space). Bucket unigram models are fit by counting over the target
    rows (``is_target`` boolean Column) and over ALL rows (the raw
    distribution), each add-one smoothed over the bucket vocabulary.
    A document's log importance weight is::

        log w(d) = sum_{g in grams(d)} [ log p_target(b(g)) - log p_raw(b(g)) ]

    Output: ``(id, n_grams, logweight)`` for every input row (target
    rows score too — useful for sanity: their mean logweight must
    exceed the non-targets'). Resample by composing with
    :func:`priority_sample` / top-k on ``logweight``.

    Scale shape (100 TB): grams explode once and immediately collapse
    to ``(id, bucket, count)`` — one map-side-combinable groupBy whose
    width is bounded by ``buckets`` per doc, not gram count. The two
    bucket models reduce from that same narrow relation (a second tiny
    aggregate), and the scoring join is ``(id,bucket)``-vs-``bucket``
    against a ``buckets``-row table — broadcast, no shuffle of the
    corpus-sized side beyond the first groupBy. Nothing driver-side,
    nothing text-keyed.
    """
    from traceframe_spark.operators.text import word_ngrams

    # strict 1- and 2-grams via the shared shifted-slice builder (the
    # naive zip_with form null-pads the tail, minting a phantom unigram
    # of every doc's last token; word_ngrams documents the quadratic
    # pitfall its zip form also avoids)
    grams = F.filter(
        F.concat(word_ngrams(F.col(text_col), 1), word_ngrams(F.col(text_col), 2)),
        lambda g: g != F.lit(""),
    )
    exploded = df.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(grams).alias("_g"),
    ).select(id_col, "_tgt", _md5_bucket(F.col("_g"), buckets).alias("_b"))
    per_doc = exploded.groupBy(id_col, "_tgt", "_b").agg(F.count("*").alias("_c"))
    model = per_doc.groupBy("_b").agg(
        F.sum("_c").alias("_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))).alias("_t"),
    )
    totals = model.agg(
        F.sum("_raw").alias("_rtot"), F.sum("_t").alias("_ttot")
    )
    # log-ratio per bucket; buckets-row table, broadcast into the scoring join
    lam = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            (
                F.log((F.col("_t") + 1).cast("double") / (F.col("_ttot") + buckets).cast("double"))
                - F.log((F.col("_raw") + 1).cast("double") / (F.col("_rtot") + buckets).cast("double"))
            ).alias("_lam"),
        )
    )
    return (
        per_doc.join(F.broadcast(lam), "_b")
        .groupBy(F.col(id_col))
        .agg(
            F.sum("_c").alias("n_grams"),
            F.sum(F.col("_c") * F.col("_lam")).alias("logweight"),
        )
    )


def cluster_cap_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    cap: int,
    keep: str = "hash",
    quantize: int = 4,
) -> DataFrame:
    """Cluster-balanced resampling over an embedding clustering: assign
    every vector to its nearest centroid (quantized-cosine argmax, ties
    to the lowest centroid id — the engine's shared assignment rule)
    and keep at most ``cap`` members per cluster. The step DataComp-
    style pipelines run after semantic clustering so head clusters
    (boilerplate, templates, near-duplicate mass) stop dominating the
    mixture, and the distance-aware orderings implement the per-cluster
    pruning of Sorscher et al. 2022 (arXiv:2206.14486 — prune easy
    PROTOTYPES, keep hard boundary examples, when data is abundant):

    - ``keep="hash"``: uniform within the cluster — the deterministic
      md5 order every sampler here uses (reproducible, retry-stable);
    - ``keep="far"``: lowest cosine to the centroid first (keep the
      hard/boundary examples, prune prototypes — the abundant-data
      regime's rule);
    - ``keep="near"``: highest cosine first (keep prototypes — the
      scarce-data regime's rule).

    Ties always break on id, so the whole selection — assignment, the
    per-cluster ordering, the cap — replays in ANSI SQL and is value-
    verified by the ``cluster_cap`` oracle row. Output: the kept corpus
    rows plus (centroid_id, cos_q).

    Scale shape: ONE no-shuffle assignment scan
    (:func:`~traceframe_spark.operators.similarity.nearest_centroid_scan`
    — the centroid matrix rides in the task closure), then one
    window over (cluster, order) — a shuffle keyed by centroid_id whose
    skew is exactly the head-cluster mass the cap is about to remove;
    at 100 TB a pathological head cluster bounds one task's sort, the
    same contract as every LSH bucket here. Downsampling only (a
    cluster smaller than ``cap`` contributes everything)."""
    if keep not in ("hash", "far", "near"):
        raise ValueError(f"keep must be 'hash', 'far' or 'near', got {keep!r}")
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from traceframe_spark.operators.similarity import (
        collect_centroids,
        nearest_centroid_scan,
    )

    cids, cmat = collect_centroids(centroids, "centroid_id", vec_col)
    assigned = nearest_centroid_scan(
        corpus, cids, cmat, id_col, vec_col, quantize=quantize
    ).select(
        F.col("vec_id").alias("_aid"), "centroid_id", "cos_q"
    )
    if keep == "hash":
        order = [F.md5(F.col("_aid").cast("string")), F.col("_aid")]
    elif keep == "far":
        order = [F.col("cos_q").asc(), F.col("_aid").asc()]
    else:
        order = [F.col("cos_q").desc(), F.col("_aid").asc()]
    w = Window.partitionBy("centroid_id").orderBy(*order)
    kept = (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return corpus.join(
        kept, corpus[id_col] == kept["_aid"]
    ).drop("_aid")
