"""Persistent dedup index: probe daily deltas without re-reading the corpus.

Every dedup/decontamination operator in :mod:`.dedup` prices a FULL pass
over the reference side — :func:`~.dedup.cross_near_dup_subtract`
re-shingles and re-hashes the entire curated snapshot on every call. At
100 TB the reference scan IS the cost: a 1 TB daily delta against a
100 TB snapshot should cost ~1 TB of work, not ~101 TB. This module
persists the snapshot's dedup state ONCE — exact content keys, MinHash
signatures, and LSH band buckets, all narrow rows — and every
subsequent delta probes the stored layers:

- **exact layer** ``{path}/exact``: ``(ckey, id)`` keyed by
  :func:`~.dedup.content_key` (md5 of normalized text). Byte-identical
  re-crawls die here in one narrow anti-join.
- **band layer** ``{path}/bands``: ``(band, bh, id)`` — the LSH bucket
  entries a fresh run of :func:`~.dedup.cross_near_dup_subtract` would
  have computed for the reference side. The probe joins the delta's
  bucket entries against this, so candidate generation never touches
  reference text.
- **signature layer** ``{path}/sigs``: ``(id, sig)`` for verification.
  Candidates are confirmed by MinHash-estimated Jaccard (the fraction
  of agreeing signature positions), NOT exact shingle Jaccard — the
  index deliberately does not store shingle arrays (they are the same
  order of magnitude as the text itself, which would defeat the point).
  The estimate's standard error is ~sqrt(t(1-t)/k); at k=128 and
  t=0.9 that is ±2.7%, the accepted trade for never re-reading the
  snapshot. Exact-verification consumers run the in-memory
  :func:`~.dedup.cross_near_dup_subtract` instead.
- ``{path}/meta``: one JSON row pinning ``n_hashes/bands/shingle_size``.
  Probes ALWAYS hash with the stored parameters — a probe hashed with
  different parameters would silently miss everything, so the API reads
  them from the store rather than trusting call-site defaults.

Parity: the reference engine's dedup helpers (reference
``traceframe/traceframe.py`` has no incremental form — its eager
pandas frames recompute per call); this is the scale path the
reference's API shape implies but cannot express. Literature: the
persisted-bands form of Broder's MinHash/LSH (STOC'98) as deployed in
crawl pipelines (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL'22 — their suffix/MinHash indexes are
likewise built once and probed per shard).

Single-writer contract like the rollup store: ``write``/``append`` from
one writer at a time; readers see a consistent index because appends
are parquet-atomic per layer and the layers only ADD rows (a doc
present in ``bands`` but not yet ``sigs`` can produce a candidate that
verification then drops — appends write ``sigs`` before ``bands`` so
the race resolves to a false candidate, never a missed duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import content_key, minhash_signatures, spread

__all__ = [
    "write_dedup_index",
    "append_dedup_index",
    "dedup_against_index",
    "read_index_meta",
    "write_gram_layer",
    "append_gram_layer",
    "read_gram_meta",
    "novelty_against_index",
    "contamination_against_index",
]


def _band_entries(
    sig: DataFrame, bands: int, rows_per_band: int, portable: bool = False
) -> DataFrame:
    """(id, sig) → one (band, bh, id) row per band, same hashing as
    :func:`~.dedup.cross_near_dup_subtract` so a stored index and an
    on-the-fly run bucket identically. ``portable=True`` keys buckets by
    the dash-joined slice VALUES (a string) instead of Spark's murmur
    ``F.hash`` — equality-preserving either way, but the portable key is
    reproducible in ANSI SQL for oracle replay."""
    if portable:
        bh = lambda b: F.array_join(
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            "-",
        )
    else:
        bh = lambda b: F.hash(
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        )
    entries = F.array(
        *[
            F.struct(F.lit(b).alias("band"), bh(b).alias("bh"))
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(entries).alias("e")).select(
        F.col("e.band").alias("band"), F.col("e.bh").alias("bh"), "id"
    )


def _layers(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_size: int,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One corpus scan → (exact, sigs, bands) layer frames."""
    rows_per_band = max(n_hashes // bands, 1)
    exact = spread(docs, id_col).select(
        content_key(text_col).alias("ckey"), F.col(id_col).alias("id")
    )
    sig = minhash_signatures(
        docs, id_col, text_col, n_hashes, shingle_size, portable=portable
    ).select("id", "sig")
    return exact, sig, _band_entries(sig, bands, rows_per_band, portable)


def write_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    with_near: bool = True,
    portable: bool = False,
) -> None:
    """Build the index from scratch at ``path`` (overwrites).

    One scan of ``docs`` feeds all three layers; the signature frame is
    persisted so the shingle+hash pass — the expensive part — runs once
    even though it feeds both ``sigs`` and ``bands``. Layer rows are
    narrow (≤ id + 8·n_hashes bytes); the written index is a small
    multiple of ``n_docs``, independent of document length.

    ``with_near=False`` writes the exact layer only — the content-key
    registry shape (re-crawl/mirror blocklists) — skipping the MinHash
    pass entirely; probes must then use ``near_dup=False`` (the near
    probe fails loudly on an exact-only store).

    ``portable=True`` builds the MinHash layers with the md5-affine
    hash families (see :func:`~.dedup.minhash_signatures`) and keys
    band buckets by slice values — every stored value reproducible in
    ANSI SQL. The flag is pinned in meta like the hash parameters;
    probes always hash the stored way.
    """
    spark = docs.sparkSession

    def _meta(near: bool) -> None:
        meta = spark.createDataFrame(
            [(int(n_hashes), int(bands), int(shingle_size), near, bool(portable))],
            "n_hashes int, bands int, shingle_size int, near boolean, portable boolean",
        )
        meta.coalesce(1).write.mode("overwrite").json(f"{path}/meta")

    if not with_near:
        exact = spread(docs, id_col).select(
            content_key(text_col).alias("ckey"), F.col(id_col).alias("id")
        )
        exact.write.mode("overwrite").parquet(f"{path}/exact")
        _meta(False)
        return
    exact, sig, band = _layers(
        docs, id_col, text_col, n_hashes, bands, shingle_size, portable
    )
    sig = sig.persist()
    try:
        exact.write.mode("overwrite").parquet(f"{path}/exact")
        sig.write.mode("overwrite").parquet(f"{path}/sigs")
        band.write.mode("overwrite").parquet(f"{path}/bands")
        _meta(True)
    finally:
        sig.unpersist()


def _meta_all(spark: SparkSession, path: str) -> tuple[int, int, int, bool, bool]:
    """ONE driver job for the whole pinned-parameter row:
    (n_hashes, bands, shingle_size, near, portable). Every probe/append
    needs several of these at once, and each separate accessor used to
    cost its own ``spark.read.json().collect()`` round trip."""
    row = spark.read.json(f"{path}/meta").collect()[0]

    def flag(name: str, default: bool) -> bool:
        # stores written before a flag existed read as its default
        try:
            v = row[name]
        except (KeyError, ValueError):
            return default
        return default if v is None else bool(v)

    return (
        int(row["n_hashes"]),
        int(row["bands"]),
        int(row["shingle_size"]),
        flag("near", True),
        flag("portable", False),
    )


def read_index_meta(spark: SparkSession, path: str) -> tuple[int, int, int]:
    """→ (n_hashes, bands, shingle_size) as pinned at build time."""
    return _meta_all(spark, path)[:3]


def _index_has_near(spark: SparkSession, path: str) -> bool:
    """Whether the store carries the MinHash layers."""
    return _meta_all(spark, path)[3]


def _index_is_portable(spark: SparkSession, path: str) -> bool:
    """Whether the MinHash layers use the md5-affine portable families."""
    return _meta_all(spark, path)[4]


def append_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold new (already-deduped) docs into the index — the daily loop is
    ``survivors = dedup_against_index(delta); append_dedup_index(survivors)``.

    Hashing parameters come from the stored meta, never the call site.
    ``sigs`` is appended BEFORE ``bands`` (see the module docstring's
    race note). Single writer, like the rollup store.

    The input is localCheckpoint-ed first, ON THE CALLER'S FRAME: in
    the canonical loop the caller's frame DERIVES from this very index
    (``survivors = dedup_against_index(delta, path)``), and a plan that
    reads a path this function just wrote re-evaluates against the
    UPDATED store — to empty (its own keys absorbed). The full-row
    checkpoint does double duty and both halves are load-bearing:
    (1) it pins what "the delta's survivors" meant at call time for the
    layer writes below, and (2) because ``Dataset.localCheckpoint``
    checkpoints the SHARED QueryExecution's RDD in place, it also pins
    the caller's own DataFrame object — which the canonical
    ``append_dedup_index(surv); append_gram_layer(surv)`` sequence
    depends on (the second call re-checkpoints the same, already-pinned
    RDD instead of re-probing the now-updated store). Checkpointing
    only the derived NARROW layers was tried (r09) and is measurably
    cheaper but WRONG: it loses (2), and the gram append that follows
    silently writes nothing — pinned by
    ``tests/test_dedup_index.py::test_day_n_production_loop`` and
    ``test_append_sequence_pins_callers_frame``. COST: the checkpoint
    materializes the FULL input rows, document text included — a
    delta-sized spill, bounded by the daily feed; callers with very
    large non-index-derived deltas can pre-project to ``(id, text)``.
    """
    docs = docs.localCheckpoint()
    spark = docs.sparkSession
    n_hashes, bands, shingle_size, has_near, portable = _meta_all(spark, path)
    if not has_near:
        spread(docs, id_col).select(
            content_key(text_col).alias("ckey"), F.col(id_col).alias("id")
        ).write.mode("append").parquet(f"{path}/exact")
        return
    exact, sig, band = _layers(
        docs, id_col, text_col, n_hashes, bands, shingle_size, portable=portable
    )
    sig = sig.persist()
    try:
        exact.write.mode("append").parquet(f"{path}/exact")
        sig.write.mode("append").parquet(f"{path}/sigs")
        band.write.mode("append").parquet(f"{path}/bands")
    finally:
        sig.unpersist()


def dedup_against_index(
    delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    near_dup: bool = True,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Surviving ``delta`` rows: exact layer first, then (optionally)
    the LSH layer with MinHash-estimated Jaccard ≥ ``threshold``.

    Cost shape at 100 TB: the delta is shingled/hashed once; the index
    side contributes only narrow stored rows (ckey/band/sig scans —
    never reference text). Both joins shuffle ``O(|delta| + index
    rows)`` narrow keys; reference DOCUMENT BYTES are untouched, which
    is the entire point versus :func:`~.dedup.cross_near_dup_subtract`.
    With ``near_dup=False`` only the exact layer runs (the oracle-exact
    twin of the registry's rows-only probe query).

    ``sigs`` (optional): a precomputed
    :func:`~.dedup.minhash_signatures` frame covering ``delta``'s rows
    (superset fine — filtered to the exact-layer survivors here).
    CALLER CONTRACT: it must be computed with THIS index's pinned meta
    — same n_hashes/shingle_size AND the same hash family (the
    ``portable`` flag), or the band join compares apples to oranges
    against the stored band hashes. The streaming ingest uses this to
    sign each micro-batch once for both the within-batch pipeline and
    this probe; caller owns the frame's persistence.
    """
    spark = delta.sparkSession
    n_hashes, bands, shingle_size, has_near, portable = _meta_all(spark, path)
    rows_per_band = max(n_hashes // bands, 1)

    ids = spread(delta, id_col).select(
        F.col(id_col).alias("_pid"), content_key(text_col).alias("ckey")
    )
    exact_hits = (
        ids.join(spark.read.parquet(f"{path}/exact"), "ckey", "left_semi")
        .select("_pid")
        .distinct()
    )
    survivors = delta.join(
        exact_hits, delta[id_col] == exact_hits["_pid"], "left_anti"
    )
    if not near_dup:
        return survivors
    if not has_near:
        raise ValueError(
            f"dedup index at {path!r} was built exact-only "
            "(with_near=False); probe with near_dup=False or rebuild "
            "with the MinHash layers"
        )

    if sigs is not None:
        surv_ids = survivors.select(F.col(id_col).alias("id"))
        sig_d = sigs.select("id", "sig").join(surv_ids, "id", "left_semi").persist()
    else:
        sig_d = minhash_signatures(
            survivors, id_col, text_col, n_hashes, shingle_size, portable=portable
        ).select("id", "sig").persist()
    cand = (
        _band_entries(sig_d, bands, rows_per_band, portable).alias("d")
        .join(spark.read.parquet(f"{path}/bands").alias("r"), ["band", "bh"])
        .select(F.col("d.id").alias("id_d"), F.col("r.id").alias("id_r"))
        .distinct()
    )
    est = F.size(
        F.filter(F.zip_with("sig_d", "sig_r", lambda a, b: a == b), lambda x: x)
    ) / F.lit(float(n_hashes))
    near_hits = (
        cand.join(sig_d.select(F.col("id").alias("id_d"), F.col("sig").alias("sig_d")), "id_d")
        .join(
            spark.read.parquet(f"{path}/sigs").select(
                F.col("id").alias("id_r"), F.col("sig").alias("sig_r")
            ),
            "id_r",
        )
        .filter(est >= F.lit(threshold))
        .select(F.col("id_d").alias("_pid"))
        .distinct()
    )
    out = survivors.join(
        near_hits, survivors[id_col] == near_hits["_pid"], "left_anti"
    )
    from .dedup import _unpersist_with

    return _unpersist_with(out, sig_d)


# ---------------------------------------------------------------------------
# gram layer: incremental n-gram novelty without re-reading the snapshot
# ---------------------------------------------------------------------------


def _gram_keys(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gk) — one row per DISTINCT word n-gram of each doc, keyed by
    the full 128-bit md5 of the gram text (16-byte binary): narrow
    enough to store corpus-scale (16 bytes vs the gram's ~3 words),
    collision-negligible at 2^128, and engine-portable (md5 is md5 in
    DuckDB too, so an oracle reading the stored layer lands on the
    identical keys). Gram semantics are :func:`~.text.word_ngrams`'s —
    the one definition contamination/ngram_novelty already share."""
    from .text import word_ngrams

    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("g"),
    ).select("id", F.unhex(F.md5("g")).alias("gk"))


def write_gram_layer(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> None:
    """Add (or rebuild) the snapshot's n-gram membership layer at
    ``{path}/grams``: the distinct gram keys of the whole corpus, the
    state :func:`novelty_against_index` probes so daily novelty triage
    (``operators/text.ngram_novelty``'s answer) never re-reads snapshot
    text. One corpus scan → explode → one distinct shuffle of 16-byte
    keys; the stored layer is O(distinct grams), independent of
    document count or length. ``n`` is pinned in ``{path}/gram_meta``
    exactly like the MinHash parameters — probes always gram with the
    stored ``n``."""
    spark = docs.sparkSession
    grams = _gram_keys(docs, id_col, text_col, n).select("gk").distinct()
    grams.write.mode("overwrite").parquet(f"{path}/grams")
    meta = spark.createDataFrame([(int(n),)], "n int")
    meta.coalesce(1).write.mode("overwrite").json(f"{path}/gram_meta")


def read_gram_meta(spark: SparkSession, path: str) -> int:
    """→ n (gram order) as pinned at gram-layer build time."""
    return int(spark.read.json(f"{path}/gram_meta").collect()[0]["n"])


def append_gram_layer(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold accepted docs' grams into the layer — the daily loop's last
    step alongside :func:`append_dedup_index`. Appends only the keys
    the store does not already hold (one anti-join against the narrow
    stored layer), so the layer stays a distinct set and its growth
    follows the corpus's NOVEL gram mass, not the feed volume.

    localCheckpoint-ed first, ON THE CALLER'S FRAME, for the same
    two-part reason as :func:`append_dedup_index` (see its docstring):
    the caller's frame typically derives from this index (the daily
    loop appends the index layers right before this call), and this
    checkpoint both re-pins the shared RDD that call already
    checkpointed — so the grams come from the delta as of PROBE time,
    not a re-probe of the updated store (which would be empty) — and
    protects this function's own write. Checkpointing only the derived
    narrow keys was tried (r09) and breaks the sequence; same
    regression tests as the index append."""
    docs = docs.localCheckpoint()
    spark = docs.sparkSession
    n = read_gram_meta(spark, path)
    fresh = (
        _gram_keys(docs, id_col, text_col, n)
        .select("gk")
        .distinct()
        .join(spark.read.parquet(f"{path}/grams"), "gk", "left_anti")
    )
    fresh.write.mode("append").parquet(f"{path}/grams")


def _gram_probe(
    delta: DataFrame, path: str, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_grams, n_hit) per delta doc against the stored gram layer.

    Cost shape at 100 TB: the delta is grammed once (one scan + one
    explode); the snapshot contributes only its stored 16-byte keys.
    The membership probe is a LEFT SEMI join, so duplicate stored keys
    (the benign append race) can never double-count a hit. Both sides
    shuffle narrow keys; snapshot TEXT is never touched — same argument
    as :func:`dedup_against_index`."""
    spark = delta.sparkSession
    n = read_gram_meta(spark, path)
    ids = spread(delta, id_col)
    grams = _gram_keys(ids, id_col, text_col, n)
    totals = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    hits = (
        grams.join(spark.read.parquet(f"{path}/grams"), "gk", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit"))
    )
    base = ids.select(F.col(id_col).alias("id"))
    return (
        base.join(totals, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )


def novelty_against_index(
    delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-delta-doc n-gram novelty against the STORED gram layer —
    ``operators/text.ngram_novelty``'s exact answer (id, n_grams,
    n_novel, novelty) with the reference side read from ``{path}/grams``
    instead of re-gramming reference text. Zero-gram docs report
    novelty 0.0, same contract as the batch operator. The triage half of
    the daily incremental loop (see :func:`_gram_probe` for the cost
    shape)."""
    out = _gram_probe(delta, path, id_col, text_col)
    return out.select(
        id_col,
        "n_grams",
        (F.col("n_grams") - F.col("n_hit")).cast("long").alias("n_novel"),
        F.when(
            F.col("n_grams") > 0,
            1.0 - F.col("n_hit").cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("novelty"),
    )


def contamination_against_index(
    delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination against a STORED gram layer —
    ``operators/text.contamination``'s exact answer (id, n_grams,
    n_hit, overlap) with the benchmark suite's distinct grams written
    once (:func:`write_gram_layer` over the eval set) and every delta
    probed against the stored keys. The same probe as
    :func:`novelty_against_index` read from the opposite direction:
    high overlap = test-set leakage, drop before training. Zero-gram
    docs report overlap 0.0, same contract as the batch operator."""
    out = _gram_probe(delta, path, id_col, text_col)
    return out.select(
        id_col,
        "n_grams",
        "n_hit",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_hit").cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("overlap"),
    )
