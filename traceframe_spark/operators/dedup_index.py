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

Two commit protocols, chosen at build time and auto-detected ever
after (probes and appends read the store's own shape — callers never
pass a protocol flag after ``write_dedup_index``):

- ``protocol="append"`` (default): each layer is a plain parquet
  directory, appends add files in place. Simple, but appends are only
  per-layer atomic (the benign races above), replay protection needs
  external markers, and object-store append behavior is whatever
  ``parquet append`` does there.
- ``protocol="manifest"``: the index is a LAYER-manifest store
  (:mod:`~traceframe_spark.streaming.manifest_store`): every layer's
  live data is a list of immutable directories and a multi-layer
  append (exact + sigs + bands + grams) publishes ONE manifest — all
  layers advance atomically, probes are whole-index SNAPSHOT reads
  (a probe resolves one manifest and every layer join sees the same
  store version, even under a concurrent fold-back), the pinned
  parameters live IN the manifest (meta reads are a driver-side JSON
  field, not a Spark job), and a streaming fold-back commits the
  replay watermark atomically with the data
  (:func:`append_curation_layers`) — the write-then-mark window and
  the "index append may run twice" residual are structurally gone.
  This is the object-store-safe shape; S3-class schemes get the same
  guarantees the rollup/HLL manifest stores document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import content_key, minhash_signatures, spread

__all__ = [
    "write_dedup_index",
    "append_dedup_index",
    "append_curation_layers",
    "dedup_against_index",
    "read_index_meta",
    "write_gram_layer",
    "append_gram_layer",
    "read_gram_meta",
    "novelty_against_index",
    "contamination_against_index",
]


from traceframe_spark.session import read_meta_dir as _read_meta_dir  # noqa: E402
from traceframe_spark.session import write_meta_dir as _write_meta_dir  # noqa: E402


def _manifest_of(spark: SparkSession, path: str) -> dict | None:
    """The store's latest manifest if ``path`` is a manifest-protocol
    index, else None (append-protocol). The one detection seam every
    probe/append funnels through — resolved ONCE per operation and
    passed down, so all of an operation's layer reads come from the
    same snapshot."""
    from traceframe_spark.streaming import manifest_store as MS

    if not MS.is_manifest_store(spark, path):
        return None
    man = MS._latest_manifest(spark, path)
    if man is None:
        raise FileNotFoundError(
            f"manifest-protocol dedup index at {path!r} has no commits"
        )
    return man


from traceframe_spark.session import schema_json_of as _schema_json_of  # noqa: E402


def _layer_df(
    spark: SparkSession,
    path: str,
    layer: str,
    man: dict | None,
    schemas: dict | None = None,
) -> DataFrame:
    """One stored layer, protocol-appropriately: a snapshot read of the
    manifest's directory list, or the plain parquet directory.

    ``schemas`` (append protocol; the manifest path resolves its own
    from the manifest meta): the build-time ``layer_schemas`` dict from
    the store meta. Passing the pinned schema skips parquet schema
    inference — one Spark job per layer read, paid at PROBE PLAN TIME
    otherwise (3 jobs per near-dup probe). Stores written before the
    field existed fall back to inference."""
    if man is not None:
        from traceframe_spark.streaming import manifest_store as MS

        return MS.read_manifest_layer(spark, path, layer, man=man)
    sj = (schemas or {}).get(layer)
    if isinstance(sj, dict):  # non-dict = degraded meta read; just infer
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(sj)).parquet(f"{path}/{layer}")
    return spark.read.parquet(f"{path}/{layer}")


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


_CKEYS_BLOOM_BITS = 1 << 20
_CKEYS_BLOOM_HASHES = 5


def _ckeys_bloom_words(
    exact: DataFrame,
    n_bits: int = _CKEYS_BLOOM_BITS,
    n_hashes: int = _CKEYS_BLOOM_HASHES,
) -> DataFrame:
    """Word-packed Bloom rows over an exact-layer frame's ``ckey``
    column — the dedup index's ``ckeys_bloom`` sidecar (xxhash64
    family: a membership prefilter needs no SQL oracle). ~n_bits/32
    long rows per commit regardless of delta size; compaction OR-folds
    the layer back to one row set."""
    from traceframe_spark.operators.sketch import bloom_build

    return bloom_build(
        exact.select("ckey"), "ckey", n_hashes=n_hashes, n_bits=n_bits, fast=True
    )


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
    protocol: str = "append",
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

    ``protocol="manifest"`` builds a layer-manifest store instead of
    plain parquet directories (see the module docstring's protocol
    comparison); the build is ONE atomic commit carrying every layer
    plus the pinned meta — a crashed build leaves no torn store, and a
    REBUILD over an existing manifest index is itself a commit (the
    prior version stays time-travel-readable until vacuumed). The
    protocol is a property of the store, auto-detected by every later
    probe/append.
    """
    if protocol not in ("append", "manifest"):
        raise ValueError(f"unknown index protocol {protocol!r}")
    spark = docs.sparkSession
    meta_row = {
        "n_hashes": int(n_hashes),
        "bands": int(bands),
        "shingle_size": int(shingle_size),
        "near": bool(with_near),
        "portable": bool(portable),
        # exact-layer Bloom sidecar geometry (manifest protocol only):
        # a point probe whose delta ckeys all miss the filter PROVES
        # zero exact hits without reading the ckey layer at all
        "ckeys_bloom_bits": _CKEYS_BLOOM_BITS,
        "ckeys_bloom_hashes": _CKEYS_BLOOM_HASHES,
    }

    def _meta_json(layer_schemas: dict) -> None:
        _write_meta_dir(
            spark,
            f"{path}/meta",
            {
                "n_hashes": int(n_hashes),
                "bands": int(bands),
                "shingle_size": int(shingle_size),
                "near": bool(with_near),
                "portable": bool(portable),
                # pinned layer schemas: probes skip parquet schema
                # inference (one plan-time Spark job per layer read)
                "layer_schemas": layer_schemas,
            },
        )

    if not with_near:
        exact = spread(docs, id_col).select(
            content_key(text_col).alias("ckey"), F.col(id_col).alias("id")
        )
        if protocol == "manifest":
            from traceframe_spark.streaming import manifest_store as MS

            # commit_layer_frames pins each layer's schema in the
            # manifest meta automatically (layer_schemas)
            MS.commit_layer_frames(
                spark, path,
                {"exact": exact, "ckeys_bloom": _ckeys_bloom_words(exact)},
                replace=True, meta=meta_row,
            )
        else:
            exact.write.mode("overwrite").parquet(f"{path}/exact")
            _meta_json({"exact": _schema_json_of(exact)})
        return
    exact, sig, band = _layers(
        docs, id_col, text_col, n_hashes, bands, shingle_size, portable
    )
    sig = sig.persist()
    try:
        # materialize the expensive shingle+MinHash pass ONCE, wide,
        # before the layer writes fan out concurrently (sigs and bands
        # both read it; without the eager count the concurrent jobs
        # race to compute it)
        sig.count()
        if protocol == "manifest":
            from traceframe_spark.streaming import manifest_store as MS

            MS.commit_layer_frames(
                spark,
                path,
                {
                    "exact": exact,
                    "sigs": sig,
                    "bands": band,
                    "ckeys_bloom": _ckeys_bloom_words(exact),
                },
                replace=True,
                meta=meta_row,
            )
        else:
            # independent overwrite jobs into three fresh directories —
            # run them (plus the meta write) from a thread pool, same
            # §2.6 overlap as the manifest commit; a fresh build has no
            # readers to order against
            from concurrent.futures import ThreadPoolExecutor

            jobs = [
                lambda: exact.write.mode("overwrite").parquet(f"{path}/exact"),
                lambda: sig.write.mode("overwrite").parquet(f"{path}/sigs"),
                lambda: band.write.mode("overwrite").parquet(f"{path}/bands"),
                lambda: _meta_json(
                    {
                        "exact": _schema_json_of(exact),
                        "sigs": _schema_json_of(sig),
                        "bands": _schema_json_of(band),
                    }
                ),
            ]
            with ThreadPoolExecutor(max_workers=4) as pool:
                for _ in pool.map(lambda f: f(), jobs):
                    pass
    finally:
        sig.unpersist()


_UNRESOLVED = object()  # sentinel: "detect the protocol yourself"


def _meta_all(
    spark: SparkSession, path: str, man: dict | None = _UNRESOLVED
) -> tuple[int, int, int, bool, bool]:
    """ONE driver read for the whole pinned-parameter row:
    (n_hashes, bands, shingle_size, near, portable). Every probe/append
    needs several of these at once, and each separate accessor used to
    cost its own ``spark.read.json().collect()`` round trip. On a
    manifest-protocol store the row is a field of the manifest — a
    driver-side JSON read, no Spark job at all; pass a pre-resolved
    ``man`` (None meaning "append protocol") to skip re-detection."""
    if man is _UNRESOLVED:
        man = _manifest_of(spark, path)
    if man is not None:
        m = man.get("meta", {})
        if "n_hashes" not in m:
            raise ValueError(
                f"manifest store at {path!r} carries no dedup-index meta "
                "(not built by write_dedup_index?)"
            )
        return (
            int(m["n_hashes"]),
            int(m["bands"]),
            int(m["shingle_size"]),
            bool(m.get("near", True)),
            bool(m.get("portable", False)),
        )
    row = _read_meta_dir(spark, f"{path}/meta")

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


def _meta_schemas(
    spark: SparkSession, path: str, man: dict | None
) -> dict:
    """The build-time ``layer_schemas`` dict for an APPEND-protocol
    store ({} when absent — pre-r15 stores fall back to inference; a
    manifest store's schemas ride the manifest meta and are resolved
    inside ``read_manifest_layer``)."""
    if man is not None:
        return {}
    try:
        row = _read_meta_dir(spark, f"{path}/meta")
        return dict(row.get("layer_schemas") or {})
    except Exception:  # noqa: BLE001 — schema pin is an optimization only
        return {}


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
    (On a MANIFEST-protocol store the self-read hazard is structurally
    absent — the probe's plan names immutable snapshot directories that
    survive the append — but the checkpoint is kept there too: it still
    pins cost (the fold-back would otherwise re-run the probe joins)
    and keeps the call's semantics protocol-independent.)

    On a manifest-protocol store the append is ONE atomic commit of all
    index layers; streaming callers that also need the replay watermark
    (or the gram layer in the same commit) use
    :func:`append_curation_layers` instead.
    """
    docs = docs.localCheckpoint()
    spark = docs.sparkSession
    man = _manifest_of(spark, path)
    if man is not None:
        _commit_curation_append(docs, path, id_col, text_col, man, grams=False)
        return
    n_hashes, bands, shingle_size, has_near, portable = _meta_all(spark, path, man)
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


def _gram_n_of(spark: SparkSession, path: str, man: dict | None) -> int:
    """Pinned gram order, protocol-appropriately: the manifest's
    ``gram_n`` meta field, or the ``gram_meta`` JSON directory. Raises
    if the store has no gram layer."""
    if man is not None:
        n = man.get("meta", {}).get("gram_n")
        if n is None:
            raise ValueError(
                f"manifest index at {path!r} has no gram layer; run "
                "write_gram_layer on it first"
            )
        return int(n)
    return int(_read_meta_dir(spark, f"{path}/gram_meta")["n"])


def _commit_curation_append(
    docs: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    man: dict,
    grams: bool,
    checkpoint: str | None = None,
    batch_id: int | None = None,
) -> int:
    """Shared body of the manifest-protocol fold-back: compute the
    index layers (and optionally the fresh gram keys) from ``docs`` and
    publish them in ONE commit, with the replay watermark folded in
    when a stream passes (checkpoint, batch_id). ``docs`` must already
    be pinned (localCheckpoint/persist) by the caller."""
    from traceframe_spark.streaming import manifest_store as MS

    spark = docs.sparkSession
    n_hashes, bands, shingle_size, has_near, portable = _meta_all(spark, path, man)
    frames: dict[str, DataFrame] = {}
    sig = None
    if has_near:
        frames["exact"], sig, frames["bands"] = _layers(
            docs, id_col, text_col, n_hashes, bands, shingle_size, portable=portable
        )
        sig = sig.persist()
        sig.count()  # one wide pass before the concurrent layer writes
        frames["sigs"] = sig
    else:
        frames["exact"] = spread(docs, id_col).select(
            content_key(text_col).alias("ckey"), F.col(id_col).alias("id")
        )
    if grams:
        n = _gram_n_of(spark, path, man)
        frames["grams"] = (
            _gram_keys(docs, id_col, text_col, n)
            .select("gk")
            .distinct()
            .join(_layer_df(spark, path, "grams", man, _GRAMS_SCHEMAS), "gk", "left_anti")
        )
    if "ckeys_bloom" in man.get("layers", {}):
        # the sidecar must cover every stored ckey or its negative
        # answers lie — maintained in the SAME commit whenever the
        # build created it (pre-sidecar stores just keep not having one)
        m = man.get("meta", {})
        frames["ckeys_bloom"] = _ckeys_bloom_words(
            frames["exact"],
            n_bits=int(m.get("ckeys_bloom_bits", _CKEYS_BLOOM_BITS)),
            n_hashes=int(m.get("ckeys_bloom_hashes", _CKEYS_BLOOM_HASHES)),
        )
    try:
        return MS.commit_layer_frames(
            spark, path, frames, checkpoint=checkpoint, batch_id=batch_id, prev=man
        )
    finally:
        if sig is not None:
            sig.unpersist()


def append_curation_layers(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: bool = False,
    checkpoint: str | None = None,
    batch_id: int | None = None,
    man: dict | None = _UNRESOLVED,
) -> int:
    """Manifest-protocol fold-back as ONE atomic commit: the index
    layers (exact + sigs + bands), optionally the gram layer
    (``grams=True``), and — when a stream passes (checkpoint,
    batch_id) — the replay watermark, all published in a single
    manifest write. This is what makes the streaming curation loop's
    fold-back exactly-once WITHOUT external markers: a crash anywhere
    before the publish leaves only invisible directories and the
    replay re-runs cleanly; a crash after it is a completed commit
    whose replay is skipped via :func:`manifest_last_batch
    <traceframe_spark.streaming.manifest_store.manifest_last_batch>`.
    The append-protocol residual ("the index append may run twice —
    duplicate rows absorbed by dedup semantics") does not exist here.

    Requires a manifest-protocol index
    (``write_dedup_index(..., protocol="manifest")``); raises on an
    append-protocol store. Returns the commit counter."""
    spark = docs.sparkSession
    if man is _UNRESOLVED:
        man = _manifest_of(spark, path)
    if man is None:
        raise ValueError(
            f"append_curation_layers needs a manifest-protocol index; "
            f"{path!r} is an append-protocol store (use append_dedup_index/"
            "append_gram_layer, or rebuild with protocol='manifest')"
        )
    docs = docs.localCheckpoint()
    return _commit_curation_append(
        docs, path, id_col, text_col, man, grams=grams,
        checkpoint=checkpoint, batch_id=batch_id,
    )


def dedup_against_index(
    delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    near_dup: bool = True,
    sigs: DataFrame | None = None,
    man: dict | None = _UNRESOLVED,
    bloom_prefilter: bool = False,
) -> DataFrame:
    """Surviving ``delta`` rows: exact layer first, then (optionally)
    the LSH layer with MinHash-estimated Jaccard ≥ ``threshold``.

    ``bloom_prefilter=True`` (manifest stores with the ``ckeys_bloom``
    sidecar) screens the delta's ckeys against the Bloom filter before
    the exact join: an all-fresh delta is PROVEN hit-free without
    reading the ckey layer at all, and a mixed delta joins only its
    probable members. The flag defaults OFF because the prefilter's
    fixed cost (a words read + one probe join + a delta-bounded
    materialization — ~3 extra bounded jobs) exceeds the ckey-layer
    read it avoids until the layer is large: measured 0.5-0.7x at
    210k stored ckeys even compacted (tools/bench_ckeys_bloom_r13.py);
    the filter stays n_bits/32 rows while the layer grows linearly, so
    turn it on once the stored-key count makes the exact scan the
    probe's dominant term (≳10M keys as a rule of thumb, or measure
    with the A/B tool on your store). Answers are identical either
    way (no false negatives; false positives only re-check).

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

    On a manifest-protocol index the probe is a whole-index SNAPSHOT:
    one manifest resolve up front, and the exact/bands/sigs joins all
    read the same store version — consistent even under a concurrent
    fold-back, and the plan survives that fold-back unchanged (it
    names immutable directories).
    """
    spark = delta.sparkSession
    if man is _UNRESOLVED:
        man = _manifest_of(spark, path)
    n_hashes, bands, shingle_size, has_near, portable = _meta_all(spark, path, man)
    rows_per_band = max(n_hashes // bands, 1)
    schemas = _meta_schemas(spark, path, man)

    ids = spread(delta, id_col).select(
        F.col(id_col).alias("_pid"), content_key(text_col).alias("ckey")
    )
    if bloom_prefilter and man is not None and "ckeys_bloom" in man.get("layers", {}):
        # Bloom prefilter (r13): delta ckeys missing any of their k
        # bits are PROVEN absent from the exact layer — a low-hit
        # delta (the healthy-feed steady state) skips the ckey-layer
        # read entirely, and a mixed delta joins only its probable
        # members. The filter words are n_bits/32 long rows —
        # broadcast-sized at any index size; false positives only ever
        # cost re-checking, never answers.
        from traceframe_spark.operators.sketch import bloom_probable_members
        from traceframe_spark.streaming import manifest_store as MS

        m = man.get("meta", {})
        # localCheckpoint: bloom_probe_keep broadcasts the words frame
        # once PER HASH (k=5) — without pinning, each broadcast re-runs
        # the layer read + OR-fold (measured 5x the probe's cost).
        # <= n_bits/32 long rows, trivially materializable.
        words = (
            MS.read_manifest_layer(spark, path, "ckeys_bloom", man=man)
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint()
        )
        ids = bloom_probable_members(
            words, ids, "ckey",
            n_hashes=int(m.get("ckeys_bloom_hashes", _CKEYS_BLOOM_HASHES)),
            n_bits=int(m.get("ckeys_bloom_bits", _CKEYS_BLOOM_BITS)),
            fast=True,
        ).localCheckpoint()  # delta-bounded narrow rows, read twice below
        if ids.isEmpty():
            exact_hits = ids.select("_pid").limit(0)
        else:
            exact_hits = (
                ids.join(_layer_df(spark, path, "exact", man, schemas), "ckey", "left_semi")
                .select("_pid")
                .distinct()
            )
    else:
        exact_hits = (
            ids.join(_layer_df(spark, path, "exact", man, schemas), "ckey", "left_semi")
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

    # LAZY persist, not an eager localCheckpoint (r15 re-A/B of the r14
    # conversion, tools/ab_probe_r15.py, standing-store probes
    # best-of-5 per fresh session): the eager checkpoint is a
    # serializing barrier — the whole delta MinHash chain materializes
    # in its own job before ANY of the probe's joins can start
    # (measured 3.07 s vs 1.96 s for this form; the r13 record was
    # 1.80 s). A lazy persist has no barrier, and the band join / sig
    # join / anti-join broadcast builds that launch concurrently SHARE
    # the computation through BlockInfoManager's per-partition write
    # locks (one task computes, racers block on the lock, everyone
    # reads the cached block) — unpinned, the racers each recompute
    # the subtree and occasionally collide badly (best-of-5 tail up to
    # 20 s). The cache entry's lifetime rides the RETURNED frame
    # (`_unpersist_with` below); callers deriving a new plan carry it
    # with :func:`~.dedup.carry_cache`, exactly the minhash_dedup_pairs
    # contract.
    from .dedup import _unpersist_with

    if sigs is not None:
        surv_ids = survivors.select(F.col(id_col).alias("id"))
        sig_d = (
            sigs.select("id", "sig").join(surv_ids, "id", "left_semi").persist()
        )
    else:
        sig_d = minhash_signatures(
            survivors, id_col, text_col, n_hashes, shingle_size, portable=portable
        ).select("id", "sig").persist()
    cand = (
        _band_entries(sig_d, bands, rows_per_band, portable).alias("d")
        .join(_layer_df(spark, path, "bands", man, schemas).alias("r"), ["band", "bh"])
        .select(F.col("d.id").alias("id_d"), F.col("r.id").alias("id_r"))
        .distinct()
    )
    est = F.size(
        F.filter(F.zip_with("sig_d", "sig_r", lambda a, b: a == b), lambda x: x)
    ) / F.lit(float(n_hashes))
    near_hits = (
        cand.join(sig_d.select(F.col("id").alias("id_d"), F.col("sig").alias("sig_d")), "id_d")
        .join(
            _layer_df(spark, path, "sigs", man, schemas).select(
                F.col("id").alias("id_r"), F.col("sig").alias("sig_r")
            ),
            "id_r",
        )
        .filter(est >= F.lit(threshold))
        .select(F.col("id_d").alias("_pid"))
        .distinct()
    )
    return _unpersist_with(
        survivors.join(
            near_hits, survivors[id_col] == near_hits["_pid"], "left_anti"
        ),
        sig_d,
    )


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


# the gram layer's shape is pinned by construction (_gram_keys →
# select("gk")): one binary md5-key column. A static schema lets every
# append-protocol gram read skip parquet schema inference (one
# plan-time Spark job per read); manifest stores carry theirs in the
# manifest meta (layer_schemas).
_GRAMS_SCHEMAS = {
    "grams": {
        "type": "struct",
        "fields": [
            {"name": "gk", "type": "binary", "nullable": True, "metadata": {}}
        ],
    }
}


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
    stored ``n``.

    Protocol auto-detected from the index at ``path``: on a
    manifest-protocol store the layer and its pinned ``n`` publish as
    ONE commit (``gram_n`` in the manifest meta) — a crashed rebuild
    can never leave a layer/meta mismatch."""
    spark = docs.sparkSession
    man = _manifest_of(spark, path)
    grams = _gram_keys(docs, id_col, text_col, n).select("gk").distinct()
    if man is not None:
        from traceframe_spark.streaming import manifest_store as MS

        MS.commit_layer_frames(
            spark, path, {"grams": grams}, replace=True,
            meta={"gram_n": int(n)}, prev=man,
        )
        return
    grams.write.mode("overwrite").parquet(f"{path}/grams")
    _write_meta_dir(spark, f"{path}/gram_meta", {"n": int(n)})


def read_gram_meta(spark: SparkSession, path: str) -> int:
    """→ n (gram order) as pinned at gram-layer build time."""
    return _gram_n_of(spark, path, _manifest_of(spark, path))


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
    regression tests as the index append.

    On a manifest-protocol store the fresh keys publish as one commit;
    streams that want the gram append atomic WITH the index append use
    :func:`append_curation_layers(grams=True) <append_curation_layers>`
    instead of this two-call sequence."""
    docs = docs.localCheckpoint()
    spark = docs.sparkSession
    man = _manifest_of(spark, path)
    n = _gram_n_of(spark, path, man)
    fresh = (
        _gram_keys(docs, id_col, text_col, n)
        .select("gk")
        .distinct()
        .join(_layer_df(spark, path, "grams", man, _GRAMS_SCHEMAS), "gk", "left_anti")
    )
    if man is not None:
        from traceframe_spark.streaming import manifest_store as MS

        MS.commit_layer_frames(spark, path, {"grams": fresh}, prev=man)
        return
    fresh.write.mode("append").parquet(f"{path}/grams")


def _gram_probe(
    delta: DataFrame, path: str, id_col: str, text_col: str,
    man: dict | None = _UNRESOLVED,
) -> DataFrame:
    """(id, n_grams, n_hit) per delta doc against the stored gram layer.

    Cost shape at 100 TB: the delta is grammed once (one scan + one
    explode); the snapshot contributes only its stored 16-byte keys.
    The membership probe is a LEFT SEMI join, so duplicate stored keys
    (the benign append race) can never double-count a hit. Both sides
    shuffle narrow keys; snapshot TEXT is never touched — same argument
    as :func:`dedup_against_index`."""
    spark = delta.sparkSession
    if man is _UNRESOLVED:
        man = _manifest_of(spark, path)
    n = _gram_n_of(spark, path, man)
    ids = spread(delta, id_col)
    grams = _gram_keys(ids, id_col, text_col, n)
    totals = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    hits = (
        grams.join(_layer_df(spark, path, "grams", man, _GRAMS_SCHEMAS), "gk", "left_semi")
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
    man: dict | None = _UNRESOLVED,
) -> DataFrame:
    """Per-delta-doc n-gram novelty against the STORED gram layer —
    ``operators/text.ngram_novelty``'s exact answer (id, n_grams,
    n_novel, novelty) with the reference side read from ``{path}/grams``
    instead of re-gramming reference text. Zero-gram docs report
    novelty 0.0, same contract as the batch operator. The triage half of
    the daily incremental loop (see :func:`_gram_probe` for the cost
    shape)."""
    out = _gram_probe(delta, path, id_col, text_col, man=man)
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
