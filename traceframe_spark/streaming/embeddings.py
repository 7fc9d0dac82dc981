"""Streaming embedding ingest into a manifest-committed IVF index —
the vector twin of :mod:`~traceframe_spark.streaming.documents`'
curation loop: per micro-batch, drop exact duplicates WITHIN the batch
and (optionally, ``near_threshold``) vectors near-duplicate to
anything previously accepted, then fold the survivors into the
standing inverted lists with the replay watermark committed ATOMICALLY
alongside — so a replayed batch can never double-insert vectors, the
failure mode a plain ``parquet append`` index cannot exclude.

Cross-batch duplicate coverage, stated precisely: the exact stage is
WITHIN-BATCH only (one aggregation over the batch — it never reads the
standing corpus). A re-sent vector from an earlier batch is caught by
the NEAR stage when ``near_threshold`` is set — the standing-index
probe does not self-exclude (``exclude_self=False``), so a re-send
carrying its ORIGINAL id matches its own standing copy at cosine 1.0
and is dropped like any other near-dup. Independently, ``id_guard``
(default True) drops batch rows whose ID is already stored: a Bloom
probe against the index's ``ids_bloom`` sidecar proves most fresh ids
absent without touching the corpus, and only probable members pay a
cid-column confirm scan (:func:`~traceframe_spark.operators.similarity.
ivf_id_hits`) — so with the near stage OFF, a replayed feed still
lands each id exactly once. The id guard is by ID, not content: a
re-send under a NEW id needs the near stage to die.

No reference analogue (the reference has no vector operators); this
completes the incremental-curation story across modalities: text flows
through ``stream_dedup_ingest`` into the dedup-index/gram/LM stores,
embeddings flow through ``stream_embed_ingest`` into the IVF store,
and all five stores share one commit protocol (immutable commit dirs +
one atomic manifest publish; see
:mod:`~traceframe_spark.streaming.manifest_store`).

Scale shape per micro-batch: the exact stage is one aggregation of
(id, vector-md5) pairs over the BATCH only; the near stage probes the
standing index partition-pruned (``nprobe/n_centroids`` of the corpus,
via the manifest's per-list directory lists — unprobed lists are never
listed); the fold is one partitioned write job + one manifest object.
Nothing rescans the standing corpus, nothing collects vectors to the
driver.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.operators import similarity as sim
from traceframe_spark.streaming import manifest_store as MS

_LOG = logging.getLogger("traceframe_spark.streaming.embeddings")


def _dedup_exact_vectors(batch: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """One survivor per distinct vector CONTENT within the batch (min
    id wins — deterministic under replay), after collapsing duplicate
    ids. The key is md5 over the comma-joined float repr: content
    equality for bit-identical vectors, which is what 'the same
    embedding arrived twice' means upstream (re-sent rows, not
    approximately-equal recomputations — those are the NEAR stage's
    job)."""
    key = F.md5(F.concat_ws(",", F.col(vec_col).cast("array<string>")))
    w = Window.partitionBy("_ck").orderBy(F.col(id_col).asc())
    return (
        batch.dropDuplicates([id_col])
        .withColumn("_ck", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_ck", "_rn")
    )


def _dedup_near_within_batch(
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    cap: int | None = None,
) -> DataFrame:
    """Collapse near-duplicates OF EACH OTHER within one micro-batch —
    the gap the standing-index probe can't close (the index only knows
    previous batches), mirroring the text loop's ``within_batch_near``.
    Candidates come from a self-join WITHIN the frozen quantizer's
    lists (two near-identical vectors assign to the same list, the same
    determinism that catches exact re-sends at nprobe=1 — a near-pair
    straddling a centroid boundary can slip through, the IVF tier's
    usual recall contract), verified by exact cosine, collapsed to the
    min-id canonical per connected component (transitive chains
    A≈B≈C keep exactly one row). Cost is per-batch: candidate mass
    follows within-list batch pairs, never the standing corpus.

    ``cap`` bounds the adversarial worst case — a burst that lands an
    entire batch in ONE list makes the self-join O(batch²): only each
    list's first ``cap`` members (by id — deterministic under replay)
    participate in the pair join; rows beyond the cap pass through
    UNCOLLAPSED (documented partial collapse, the minhash pair-cap
    precedent) and the truncation is logged loudly with per-list
    counts. The exact-dedup stage has already run, so capped overflow
    is genuinely distinct content — near-copies among it reach the
    standing index and are caught by the NEXT batch's index probe once
    the retained canonicals have folded in."""
    from traceframe_spark.operators.graph import connected_components, keep_canonical

    assigned = batch.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sim.l2_norm(F.col(vec_col)).alias("nrm"),
        sim.ivf_assign(vec_col, centroids).alias("list_id"),
    )
    ranked = None
    if cap is not None:
        ranked = assigned.withColumn(
            "_r", F.row_number().over(Window.partitionBy("list_id").orderBy("id"))
        ).persist()
        report = (
            ranked.filter(F.col("_r") > cap)
            .groupBy("list_id")
            .agg(F.count("*").alias("dropped"), F.max("_r").alias("list_size"))
            .agg(
                F.count("*").alias("n_lists_truncated"),
                F.coalesce(F.sum("dropped"), F.lit(0)).alias("n_rows_over_cap"),
                F.coalesce(F.max("list_size"), F.lit(0)).alias("worst_list"),
            )
            .first()
        )
        if report["n_lists_truncated"]:
            _LOG.warning(
                "stream_embed_ingest within-batch near-dedup: cap=%d "
                "truncated %d list(s) (%d rows beyond the cap pass through "
                "UNCOLLAPSED this batch; largest list held %d batch rows). "
                "Near-copies among the overflow are caught by later batches' "
                "standing-index probes once the retained canonicals fold in.",
                cap,
                report["n_lists_truncated"],
                report["n_rows_over_cap"],
                report["worst_list"],
            )
        assigned = ranked.filter(F.col("_r") <= cap).drop("_r")
    a = assigned.alias("a")
    b = assigned.alias("b")
    # SAME 1e-4 quantized grid as _rerank_topk: both near stages (this
    # self-join and the standing-index probe) must share one threshold
    # boundary, or a pair within ~5e-5 of it is classified differently
    # depending on which stage happens to see it
    cos_q = F.floor(
        sim.dot_f64(F.col("a.vec"), F.col("b.vec"))
        / (F.col("a.nrm") * F.col("b.nrm")) * 10000
        + F.lit(0.5)
    ).cast("long")
    pairs = (
        a.join(b, (F.col("a.list_id") == F.col("b.list_id"))
               & (F.col("a.id") < F.col("b.id")))
        .filter(cos_q >= int(round(threshold * 10000)))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    try:
        if pairs.isEmpty():
            return batch
        comp = connected_components(pairs, "id_a", "id_b")
        return keep_canonical(batch, id_col, comp)
    finally:
        if ranked is not None:
            ranked.unpersist()


def stream_embed_ingest(
    vecs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    near_threshold: float | None = None,
    nprobe: int | str = "auto",
    near_probe: str = "float",
    adc_shortlist: int = 32,
    id_guard: bool = True,
    within_batch_near: bool = False,
    within_batch_cap: int | None = 4096,
    lease: bool = False,
    lease_ttl_s: int = 900,
    compact_every: int | None = None,
    vacuum_keep: int | None = None,
    trigger_available_now: bool = False,
):
    """Run a streaming embedding feed into the persistent IVF index at
    ``index_path`` (which must be a MANIFEST-protocol index — build the
    snapshot with ``write_ivf_index(..., protocol="manifest")`` first;
    an empty corpus snapshot is fine). Per micro-batch:

    1. exact dedup within the batch (one survivor per distinct vector
       content, min id wins);
    1b. ``id_guard=True`` (default): drop batch rows whose ID the
       index already stores — the cross-batch exactly-once-by-id
       contract with or without the near stage. Per-batch cost shape:
       one Bloom probe of the ``ids_bloom`` sidecar (n_bits/32 long
       rows, broadcast; ids missing any bit are PROVEN fresh), then a
       cid-column-only confirm scan for the probable members ONLY —
       an all-fresh batch (the steady state of a healthy feed) never
       reads the corpus at all, and the confirm scan reads one
       fixed-width column, never vectors or codes. Indexes built
       before the sidecar existed confirm-always (correct, unpruned).
    2. ``near_threshold`` set: drop batch vectors whose best cosine
       against the STANDING index is ≥ the threshold (the embedding
       twin of ``dedup_against_index`` — a near-copy of anything
       previously accepted never lands; an exact re-send is the
       cosine-1.0 special case, caught even when it carries its
       original id — the probe runs with ``exclude_self=False``). The
       probe is partition-pruned top-1 over ``nprobe`` lists, so its
       recall is the IVF tier's — a near-dup whose nearest neighbour
       hides in an unprobed list survives.

       **Picking nprobe — the clone-mass hazard**: near-dup feeds are
       EXACTLY the data shape where small probe counts fail. The r11
       volume instrument (100x corpus, clone-heavy — see SCALING.md)
       measured IVF/brute-force agreement of only 0.56 at nprobe=8
       over 64 lists, recovering to 0.84 at nprobe=32: clone mass
       concentrates in few lists, so a query's near-dup often sits
       just across a centroid boundary from the lists the query ranks
       nearest. The default ``nprobe="auto"`` therefore derives a
       probe count from the index's OWN list-size skew at stream start
       (``ivf_list_stats``): probe at least 8 lists, widen linearly
       with ``max_list/mean_list`` (the clone-mass signal), clamp at
       full probe — ``min(n_lists, max(8, ceil(skew)))``. Derived at
       stream start and RE-DERIVED whenever the ``compact_every``
       cadence fires (skew evolves as the stream folds — clone mass
       arriving late concentrates lists after the day-one
       measurement; without a cadence the width stays pinned until
       restart). An exact re-send is always
       caught even at nprobe=1 (the frozen quantizer assigns the
       clone to the original's list); only genuine near-dups need the
       width. For a measured operating point on your own data, run
       the agreement instrument (``bitext_ann_agreement``
       methodology) against a brute-force sample.

       **Compressed-domain probing** (``near_probe="adc"``, requires
       an IVF-PQ index — ``write_ivf_index(..., pq_samples=...)``):
       the probe scans 1-byte codes instead of float vectors (the
       candidate read skips the vector column entirely), shortlists
       the ``adc_shortlist`` best by approximate distance, and only
       those pay a float read + exact quantized cosine
       (``rerank_k=1``) — at 100 TB the steady-state dedup loop's
       probe I/O drops ~32x on the scan side. The trade: the re-send
       guarantee weakens from "always caught" to "caught unless more
       than ``adc_shortlist`` candidates in the probed lists tie at
       or beat the clone's own code distance" (code collisions —
       rare, but clone-heavy feeds are exactly where collisions
       concentrate). Keep the default ``"float"`` when the
       exactly-once-by-content property matters more than probe I/O;
       thresholds compare on the same 1e-4 quantized grid either way.
    2b. ``within_batch_near=True`` (requires ``near_threshold``):
       additionally collapse near-duplicates OF EACH OTHER arriving in
       the same micro-batch — candidates from a self-join within the
       frozen quantizer's lists, exact-cosine verified, min-id
       canonical per connected component (the vector twin of the text
       loop's ``within_batch_near``). ``within_batch_cap`` bounds the
       adversarial single-list burst (the self-join is otherwise
       O(batch²) within a list): each list's first ``cap`` batch
       members by id participate; overflow passes through uncollapsed
       with a loud log and is swept by later batches' index probes
       (see :func:`_dedup_near_within_batch`). ``None`` uncaps.
    3. fold survivors into their inverted lists with the replay
       watermark in the SAME manifest commit — a recorded batch is a
       completely applied batch; an unrecorded replay recomputes
       against the identical index snapshot (the commit that would
       have changed it didn't happen) and lands identical rows. A
       batch with zero survivors publishes a metadata-only commit so
       the watermark still advances exactly-once.

    ``lease=True`` makes the index's single-writer contract
    self-enforcing: acquire the store's writer lease before starting
    (a second stream against the same index fails AT START, loudly,
    naming the holder), renew every batch, release on termination;
    a crashed holder's lease expires after ``lease_ttl_s``.

    ``compact_every=N`` schedules index compaction INTO the loop:
    every fold appends one directory to each touched list's live
    directory list, so a long-running stream's probe plans otherwise
    list O(batches) directories per probed list. With the knob set,
    whenever any list's live count reaches N the batch ends by
    rewriting every list to ONE directory (a normal commit — racing
    probes keep their resolved snapshot), bounding probe listing cost
    at N directories per probed list while answers stay identical.
    Cadence state is the manifest itself (restart-safe, no counters);
    ``vacuum_keep=K`` reclaims superseded directories after each
    compaction with K manifests of reader grace.

    Returns the started StreamingQuery. Read the index back with
    ``ivf_topk_over_index`` / ``read_parts_layers``; watch
    ``ivf_rebuild_due`` for frozen-quantizer drift.
    """
    spark0 = vecs.sparkSession
    if not MS.is_manifest_store(spark0, index_path):
        raise ValueError(
            f"stream_embed_ingest needs a manifest-protocol IVF index, but "
            f"{index_path!r} is not one — build it with "
            "write_ivf_index(..., protocol='manifest')"
        )
    if within_batch_near and near_threshold is None:
        raise ValueError("within_batch_near=True needs near_threshold")
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")
    if near_probe not in ("float", "adc"):
        raise ValueError(f"near_probe must be 'float' or 'adc', got {near_probe!r}")
    if near_probe == "adc" and adc_shortlist < 1:
        # an empty ADC shortlist would silently disable near-dup
        # suppression (nothing survives to the exact re-rank, so every
        # re-send lands) — fail at stream start, not per batch
        raise ValueError(
            f"adc_shortlist must be >= 1, got {adc_shortlist}"
        )
    # fail fast at stream start on a store without centroids; the
    # centroids are FROZEN (append never retrains), so pin them once
    # for the within-batch assignment instead of re-resolving per batch
    centroids0, man0 = sim._ivf_resolve(spark0, index_path)
    if near_probe == "adc" and (
        man0 is None or man0.get("meta", {}).get("pq_samples") is None
    ):
        raise ValueError(
            f"near_probe='adc' needs an IVF-PQ index at {index_path!r} — "
            "build it with write_ivf_index(..., pq_samples=...)"
        )
    def _auto_nprobe(man=None) -> int:
        # one bounded job: <= n_lists narrow rows
        import math

        sizes = [
            r["n_vectors"]
            for r in sim.ivf_list_stats(spark0, index_path, man=man).collect()
        ]
        mean = (sum(sizes) / len(sizes)) if sizes else 0.0
        skew = (max(sizes) / mean) if mean else 0.0
        got = min(len(centroids0), max(8, math.ceil(skew)))
        _LOG.info(
            "stream_embed_ingest: nprobe='auto' -> %d "
            "(n_lists=%d, list-size skew=%.1f)",
            got, len(centroids0), skew,
        )
        return got

    auto_nprobe = nprobe == "auto"
    if auto_nprobe:
        if near_threshold is None:
            nprobe = 8  # unused (no near stage); keep the type honest
            auto_nprobe = False
        else:
            nprobe = _auto_nprobe()
    elif not isinstance(nprobe, int):
        raise ValueError(f"nprobe must be an int or 'auto', got {nprobe!r}")
    # mutable so the compaction cadence can refresh the auto probe
    # width mid-stream (list-size skew EVOLVES as clone mass folds in —
    # day-one geometry must not pin the width forever)
    probe_state = {"nprobe": nprobe}
    lease_token = (
        MS.acquire_writer_lease(
            spark0, index_path,
            owner=f"embed-ingest:{MS._lineage(checkpoint)}", ttl_s=lease_ttl_s,
        )
        if lease
        else None
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if lease_token is not None:
            MS.renew_writer_lease(spark, index_path, lease_token)
        # ONE manifest resolve per batch, shared by the watermark check,
        # the near-dup probe, and the fold — each resolve is a
        # _manifests/ listing + JSON read of driver metadata ('the
        # per-commit bill on an object store'), and the stages must see
        # one snapshot anyway. Must be PER BATCH, not per stream: prior
        # batches' folds advance the lists (only the centroids are
        # frozen).
        man = MS._latest_manifest(spark, index_path)
        if man is None:
            raise IOError(
                f"IVF manifest store at {index_path!r} lost its commits "
                "mid-stream"
            )
        last = man.get("lineage", {}).get(MS._lineage(checkpoint))
        if last is not None and batch_id <= int(last):
            return
        survivors = _dedup_exact_vectors(batch_df, id_col, vec_col)
        if id_guard:
            hits = sim.ivf_id_hits(spark, index_path, survivors, id_col, man=man)
            survivors = survivors.join(F.broadcast(hits), id_col, "left_anti")
        if within_batch_near:
            survivors = _dedup_near_within_batch(
                survivors, id_col, vec_col, centroids0, near_threshold,
                cap=within_batch_cap,
            )
        if near_threshold is not None:
            # exclude_self=False: an ingest probe must let a re-sent
            # row match its OWN standing copy (cosine 1.0) — the
            # search-style qid != cid exclusion would make exactly the
            # re-send case invisible (see module docstring)
            if near_probe == "adc":
                # compressed-domain candidate scan + exact head: the
                # shortlist pays the only float read, and the final
                # cos is the same 1e-4 quantized grid as the float
                # probe, so the threshold boundary is shared
                best = sim.ivf_adc_topk_over_index(
                    spark, index_path, survivors, id_col, vec_col,
                    k=adc_shortlist, nprobe=probe_state["nprobe"],
                    exclude_self=False,
                    rerank_k=1, resolved=(centroids0, man),
                )
            else:
                best = sim.ivf_topk_over_index(
                    spark, index_path, survivors, id_col, vec_col,
                    k=1, nprobe=probe_state["nprobe"],
                    resolved=(centroids0, man),
                    exclude_self=False,
                )
            best = best.filter(
                F.col("cos") >= int(round(near_threshold * 10000))
            )
            survivors = survivors.join(
                best.select(F.col("qid").alias(id_col)), id_col, "left_anti"
            )
        survivors = survivors.persist()
        try:
            if survivors.isEmpty():
                MS.commit_layer_frames(
                    spark, index_path, {},
                    checkpoint=checkpoint, batch_id=batch_id, prev=man,
                )
            else:
                sim.append_to_ivf_index(
                    survivors, index_path, id_col, vec_col,
                    checkpoint=checkpoint, batch_id=batch_id,
                    resolved=(centroids0, man),
                )
            # AFTER the watermarked fold: a crash between them replays
            # into a watermark skip and the over-bound dir counts
            # re-trigger compaction on the next live batch
            compacted = MS.run_scheduled_compaction(
                spark, index_path, compact_every, vacuum_keep, man
            )
            if compacted and auto_nprobe:
                # skew EVOLVES as the stream folds (clone mass arriving
                # late concentrates lists after the stream-start
                # measurement) — re-derive the probe width at the
                # natural refresh point the cadence already provides.
                # Costs ONE extra manifest resolve + one <=n_lists
                # aggregate, only on compaction batches; plain batches
                # keep the one-resolve discipline.
                probe_state["nprobe"] = _auto_nprobe(
                    man=MS._latest_manifest(spark, index_path)
                )
        finally:
            survivors.unpersist()

    writer = vecs.writeStream.foreachBatch(ingest_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if lease_token is not None:
        return MS._start_leased_stream(spark0, writer, index_path, lease_token)
    return writer.start()


def read_indexed_vectors(spark: SparkSession, index_path: str) -> DataFrame:
    """Everything the index holds (cid, c_vec, c_nrm, list_id) as one
    snapshot-consistent scan — the corpus-read twin of
    ``read_ingested``. Protocol auto-detected."""
    if MS.is_manifest_store(spark, index_path):
        return MS.read_parts_layers(spark, index_path)
    return spark.read.parquet(index_path)
