"""Hashed n-gram Naive Bayes text classifier — the quality/language
classifier stage of a pretraining-data pipeline, built as pure
relational dataflow.

Public design sources: fastText-style linear text classification over
hashed n-gram features (Joulin et al., arXiv:1607.01759), the CCNet
pipeline's trained language/quality filters (Wenzek et al.,
arXiv:1911.00359), and GPT-3's quality-classifier filtering with
stochastic score-based acceptance (Brown et al., arXiv:2005.14165,
Appendix A). No analogue in the reference
(`/root/reference/traceframe/traceframe.py` has no text classifiers);
this widens the training-data-pipeline surface alongside the stored
bigram LM (`operators/text.py`).

Why multinomial Naive Bayes and not SGD: NB's sufficient statistics
are COUNTS — training is ONE ``groupBy(label, bucket)`` over the
feature relation (map-side partials, a single shuffle bounded by
``n_buckets × n_classes`` rows, never by corpus size) and needs no
iteration, no driver-held weight vector, no parameter server. On
hashed bag-of-n-grams features NB is the classic strong baseline the
fastText paper itself benchmarks against, and every step is exactly
reproducible by a SQL oracle (the md5 feature hash is bit-identical in
every engine — same portability argument as
:func:`~traceframe_spark.operators.sampling.md5_uniform`).

Scale shape at 100 TB:
  - featurize: narrow projection + explode; no shuffle.
  - train: one aggregation to ``(label, bucket, c)`` — at the default
    2^18 buckets and ~10 classes the model is ≤ 2.6M narrow rows
    (megabytes), INDEPENDENT of corpus size.
  - score: the model side is broadcast (weights ≤ buckets × classes);
    the corpus side aggregates per-document feature counts map-side,
    then one broadcast join + one per-document aggregation. The corpus
    text is read once; nothing is collected to the driver.
  - stored model: narrow count layers + meta, same incremental
    contract as the stored bigram LM (train once on a frozen labeled
    set, score every crawl snapshot against the store); supports both
    the append and the manifest commit protocols.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.operators.sampling import md5_uniform
from traceframe_spark.operators.text import tokens
from traceframe_spark.session import read_meta_dir as _read_meta_dir

DEFAULT_BUCKETS = 1 << 18


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id[, extra…], bucket, cnt) — hashed unigram+bigram occurrence
    counts per document (multinomial bag-of-n-grams). Features are the
    namespaced strings ``'u:' + w`` and ``'b:' + w1 + ' ' + w2`` over
    lowercased whitespace tokens (empty tokens filtered), hashed with
    the portable md5 draw so any SQL engine reproduces the exact
    buckets. Documents with no tokens emit no rows (same no-row
    contract as the bigram LM scorers)."""
    toks = F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))
    # a whitespace-only document filters to an EMPTY array; slice length
    # must not go negative (the unfiltered bigram helper never sees this
    # because split() yields at least [''])
    k = F.greatest(F.size(toks) - 1, F.lit(0))
    uni = F.transform(toks, lambda w: F.concat(F.lit("u:"), w))
    bi = F.zip_with(
        F.slice(toks, 1, k),
        F.slice(toks, 2, k),
        lambda a, b: F.concat(F.lit("b:"), a, F.lit(" "), b),
    )
    keep = [F.col(id_col).alias("id")] + [F.col(c) for c in (extra_cols or [])]
    feats = df.select(*keep, F.explode(F.concat(uni, bi)).alias("f"))
    group = ["id"] + list(extra_cols or [])
    return (
        feats.select(*group, (md5_uniform(F.col("f")) % n_buckets).alias("bucket"))
        .groupBy(*group, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def train_nb(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB classifier: returns ``(weights,
    class_stats)`` where ``weights`` = (label, bucket, c) raw feature
    counts and ``class_stats`` = (label, n_docs, tot_c) document and
    feature totals per class. RAW COUNTS, not log-likelihoods, are the
    model: counts fold under addition (a future labeled delta is one
    ``groupBy`` + sum away) and the smoothing constant stays a scoring-
    time choice rather than a baked-in one. One shuffle for the
    feature counts (bounded by ``n_buckets × n_classes``), one for the
    per-class document totals (bounded by ``n_classes``)."""
    feats = hashed_features(docs, id_col, text_col, n_buckets, extra_cols=[label_col])
    w = (
        feats.groupBy(F.col(label_col).alias("label"), "bucket")
        .agg(F.sum("cnt").alias("c"))
    )
    prior = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("n_docs"))
    )
    tot = w.groupBy("label").agg(F.sum("c").alias("tot_c"))
    # LEFT join + 0: a class whose documents produce no features (all
    # empty/whitespace texts) must keep its class_stats row — an inner
    # join silently dropped it, skewing n_total and turning
    # quality_filter's hi−lo logodds NULL for every document (a
    # downstream .filter('keep') then drops the whole corpus). With
    # tot_c = 0 the smoothing floor ln(1/(0 + B)) handles it exactly.
    return w, prior.join(tot, "label", "left").fillna({"tot_c": 0})


def nb_scores(
    delta: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, label, score) — per-class add-one-smoothed log-posterior
    for every document in ``delta``:

      ``score = ln(n_docs_label / N)
                + Σ_buckets cnt · ln((c + 1) / (tot_c + n_buckets))``

    A bucket unseen for a class takes the floor ``ln(1/(tot_c + B))``
    via LEFT join + coalesce (the branch the training corpus itself
    never exercises — pinned in tests). The class table is tiny and
    broadcast for the cross join; the weights table is bounded by
    ``n_buckets × n_classes`` and broadcast-joined, so the only
    corpus-sized shuffle is the per-document feature aggregation.
    Documents with no tokens emit no rows."""
    feats = hashed_features(delta, id_col, text_col, n_buckets)
    n_total = class_stats.agg(F.sum("n_docs").alias("n_total"))
    cls = class_stats.crossJoin(F.broadcast(n_total)).select(
        "label",
        F.log(F.col("n_docs") / F.col("n_total")).alias("logprior"),
        F.col("tot_c"),
    )
    ll = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
        / (F.col("tot_c") + F.lit(float(n_buckets)))
    )
    return (
        feats.crossJoin(F.broadcast(cls))
        .join(F.broadcast(weights), ["label", "bucket"], "left")
        .groupBy("id", "label")
        .agg((F.first("logprior") + F.sum(F.col("cnt") * ll)).alias("score"))
    )


def nb_predict(
    delta: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, pred_label, score, margin) — the argmax class per document
    with deterministic tie-breaks (score desc, label asc) and the
    top1−top2 margin (the abstention/confidence signal quality filters
    threshold on). One window over the C per-class rows per document."""
    scored = nb_scores(delta, weights, class_stats, id_col, text_col, n_buckets)
    order = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.select(
            "id",
            F.col("label").alias("pred_label"),
            "score",
            (F.col("score") - F.lead("score").over(order)).alias("margin"),
            F.row_number().over(order).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# stored model (same two-protocol contract as write_bigram_lm)
# ---------------------------------------------------------------------------


def write_nb_classifier(
    docs: DataFrame,
    path: str,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    protocol: str = "append",
) -> None:
    """Persist the trained classifier: (label, bucket, c) counts at
    ``{path}/weights``, (label, n_docs, tot_c) at ``{path}/class_stats``,
    and ``n_buckets`` in ``{path}/nb_meta`` — the CCNet shape (train the
    filter ONCE on a frozen labeled set, score every snapshot against
    the store; the labeled text is never re-read at scoring time).
    ``protocol="manifest"`` commits both layers AND the meta in ONE
    atomic manifest publish (a crashed build can never leave a
    weights/stats/meta mismatch; object-store-legal; prior model
    time-travel-readable until vacuumed). Readers auto-detect."""
    if protocol not in ("append", "manifest"):
        raise ValueError(f"unknown NB store protocol {protocol!r}")
    spark = docs.sparkSession
    w, cs = train_nb(docs, label_col, id_col, text_col, n_buckets)
    # class_stats derives from the weights aggregation, and both layers
    # are written: without the pin the hashed-features explode + groupBy
    # re-runs over the whole training corpus per consumer (same guard —
    # and comment — as write_bigram_lm's `bi`)
    w = w.persist()
    try:
        # one wide featurize+count pass populates the cache; the layer
        # writes below then read cached blocks and run concurrently
        w.count()
        if protocol == "manifest":
            from traceframe_spark.streaming import manifest_store as MS

            MS.commit_layer_frames(
                spark, path, {"weights": w, "class_stats": cs},
                replace=True, meta={"n_buckets": int(n_buckets)},
            )
            return
        from concurrent.futures import ThreadPoolExecutor
        from traceframe_spark.session import write_meta_dir

        jobs = [
            lambda: w.write.mode("overwrite").parquet(f"{path}/weights"),
            lambda: cs.write.mode("overwrite").parquet(f"{path}/class_stats"),
            lambda: write_meta_dir(
                spark, f"{path}/nb_meta", {"n_buckets": int(n_buckets)}
            ),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            for _ in pool.map(lambda f: f(), jobs):
                pass
    finally:
        w.unpersist()


def append_nb_classifier(
    delta: DataFrame,
    path: str,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a LABELED delta into a stored classifier — the reason the
    store keeps raw counts: the delta's (label, bucket, c) counts and
    (label, n_docs, tot_c) totals SUM with the stored ones, so an
    incremental retrain is one pass over the delta plus a
    model-sized (≤ buckets × classes rows) merge — the corpus the
    model was trained on is never re-read. ``n_buckets`` comes from
    the store's pinned meta (the delta must hash like the snapshot
    did). On a manifest-protocol store both merged layers publish in
    ONE atomic commit (replace — the merged state supersedes);
    on an append-protocol store the layers are overwritten in
    sequence (localCheckpointed first, since the new state derives
    from the files being replaced).

    New classes fold in naturally (their rows union); scores shift
    only as the counts dictate — ``train_nb(a ∪ b)`` and
    ``train_nb(a)`` + ``append_nb_classifier(b)`` produce identical
    stored state (pinned by test)."""
    spark = delta.sparkSession
    w0, cs0, b = _read_nb_store(spark, path)
    w1, cs1 = train_nb(delta, label_col, id_col, text_col, n_buckets=b)
    # cs1's totals derive from w1's aggregation: pin it or the delta's
    # featurization re-runs once per written layer (write_bigram_lm's
    # guard, same reason)
    w1 = w1.persist()
    try:
        w = (
            w0.unionByName(w1)
            .groupBy("label", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        cs = (
            cs0.unionByName(cs1)
            .groupBy("label")
            .agg(F.sum("n_docs").alias("n_docs"), F.sum("tot_c").alias("tot_c"))
        )
        from traceframe_spark.streaming import manifest_store as MS

        if MS.is_manifest_store(spark, path):
            MS.commit_layer_frames(
                spark, path, {"weights": w, "class_stats": cs}, replace=True,
            )
            return
        # derive-then-overwrite: the merged frames read the very files
        # the writes replace — pin the merged state first or the
        # overwrite truncates its own input mid-scan
        w = w.localCheckpoint()
        cs = cs.localCheckpoint()
        w.write.mode("overwrite").parquet(f"{path}/weights")
        cs.write.mode("overwrite").parquet(f"{path}/class_stats")
    finally:
        w1.unpersist()


def _read_nb_store(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    """(weights, class_stats, n_buckets), protocol auto-detected — a
    manifest store resolves ONE manifest (snapshot-consistent layers;
    n_buckets is a driver-side JSON field, no Spark job)."""
    from traceframe_spark.streaming import manifest_store as MS

    if MS.is_manifest_store(spark, path):
        man, meta_b = MS.resolve_required_meta(
            spark, path, "n_buckets", "write_nb_classifier"
        )
        return (
            MS.read_manifest_layer(spark, path, "weights", man=man),
            MS.read_manifest_layer(spark, path, "class_stats", man=man),
            int(meta_b),
        )
    return (
        spark.read.parquet(f"{path}/weights"),
        spark.read.parquet(f"{path}/class_stats"),
        int(_read_meta_dir(spark, f"{path}/nb_meta")["n_buckets"]),
    )


def load_nb_frames(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    """Read a stored classifier ONCE and pin it in executor storage
    (persist-with-lineage, eagerly materialized) — the per-stream hoist
    for :func:`score_against_nb` inside ``foreachBatch``; same fault
    model and rationale as :func:`~traceframe_spark.operators.text.
    load_lm_frames` (executor loss recomputes from the captured store
    listing; a lineage-cut pin would kill later micro-batches)."""
    w, cs, b = _read_nb_store(spark, path)
    w = w.persist()
    cs = cs.persist()
    w.count()
    cs.count()
    return w, cs, b


def score_against_nb(
    delta: DataFrame,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    frames: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """(id, pred_label, score, margin) for ``delta`` under the STORED
    classifier — :func:`nb_predict` without re-training. ``frames``
    (from :func:`load_nb_frames`) scores against an already-pinned
    model instead of reading ``path`` per call."""
    if frames is not None:
        w, cs, b = frames
    else:
        if path is None:
            raise ValueError("score_against_nb needs `path` or `frames`")
        w, cs, b = _read_nb_store(delta.sparkSession, path)
    return nb_predict(delta, w, cs, id_col, text_col, b)


# ---------------------------------------------------------------------------
# the GPT-3 quality-filter composition
# ---------------------------------------------------------------------------


def quality_filter(
    docs: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    hi_label: str = "hi",
    lo_label: str = "lo",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, logodds, keep) — binary quality filtering with stochastic
    score-based acceptance (Brown et al. 2020, Appendix A): ``logodds =
    score(hi) − score(lo)`` under a classifier trained to separate a
    curated corpus from the crawl, and a document is kept when a
    deterministic per-document uniform draw falls under
    ``sigmoid(logodds)`` — high-scoring docs are (almost) always kept,
    low-scoring docs survive with proportionally small probability, so
    the filtered corpus keeps tail diversity instead of a hard cut.
    The draw is the md5 uniform (reproducible by any engine and stable
    under task retries), standing in for the paper's Pareto draw with
    the same keep-probability-monotone-in-score contract."""
    scored = nb_scores(docs, weights, class_stats, id_col, text_col, n_buckets)
    lo = scored.groupBy("id").agg(
        (
            F.max(F.when(F.col("label") == hi_label, F.col("score")))
            - F.max(F.when(F.col("label") == lo_label, F.col("score")))
        ).alias("logodds")
    )
    u = md5_uniform(F.col("id")) / F.lit(float(1 << 32))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logodds")))
    return lo.select("id", "logodds", (u < p).alias("keep"))
