"""Streaming document ingest with incremental dedup.

The batch loop the persistent index enables (``operators/dedup_index``:
probe a delta in O(delta + narrow index rows), never O(snapshot)) has a
streaming form: a document feed arrives in micro-batches, each batch is
deduped against everything ever accepted — exact layer, then LSH
near-dup layer — and only the survivors land in the curated corpus and
fold back into the index. This is the continuous version of the daily
``survivors = dedup_against_index(delta); append_dedup_index(survivors)``
loop, so a 100 TB corpus never gets re-read no matter how long the
stream runs: each batch pays its own size plus the narrow index rows.

Crash-safety (foreachBatch is at-least-once, and this sink is
multi-step):

- Each batch's survivors land at ``{out}/ingest_batch=<id>`` with
  per-directory overwrite, so re-writing the same batch is idempotent.
- A marker (``_applied_batches/``, lineage-namespaced like the rollup
  store's) is written AFTER the corpus write and BEFORE the index
  append. On replay, a marked batch re-reads its survivors from its own
  corpus directory instead of re-probing — the re-probe would find the
  batch's docs already in the index (if the append had completed) and
  compute an EMPTY survivor set, and an unguarded overwrite would then
  erase the batch's data. Reading back the landed rows makes the replay
  immune to the index's state.
- The index append itself may run twice (crash between append and the
  stream's checkpoint commit). Duplicate index rows are semantically
  harmless by construction: the exact layer feeds an anti-join, and the
  candidate/verify joins end in ``distinct()`` — a duplicated ``ckey``/
  ``band``/``sig`` row changes storage, never answers.

All of the above describes ``store_protocol="markers"`` (the default,
and the only legal shape for an APPEND-protocol index). With a
MANIFEST-protocol index (``write_dedup_index(protocol="manifest")``)
pass ``store_protocol="manifest"`` and the crash story gets strictly
stronger — and simpler:

- The fold-back (index layers + gram layer) is ONE atomic manifest
  commit carrying the batch watermark
  (:func:`~traceframe_spark.operators.dedup_index.append_curation_layers`),
  so "the index append may run twice" is structurally impossible — no
  markers, no write-then-mark window, no read-back-from-landed-rows
  replay path. A replayed batch either sees its watermark (committed
  atomically with the layers — skip everything) or recomputes from the
  SAME index snapshot (immutable directories — the probe is
  deterministic, so the rerun lands identical survivors).
- The curated corpus lands through its own manifest store at
  ``out_path`` (one commit per batch, partitioned by ``ingest_batch``),
  so corpus readers get snapshot isolation too and a replayed landing
  REPLACES the batch's pointer instead of overwriting files in place.
  Read it back with :func:`read_ingested` (protocol auto-detected).
- Both stores are object-store-safe: every publish is one small-object
  write; nothing relies on rename atomicity or in-place overwrite.

Within-batch duplicates (the index only knows PREVIOUS batches) are
collapsed exact-first per batch via ``exact_canonical_ids``;
``within_batch_near=True`` additionally runs the full batch near-dup
pipeline (``dedup_pipeline`` — LSH + connected components + keep-one,
with the index's own pinned parameters) INSIDE each micro-batch, so a
burst of near-copies arriving in ONE batch cannot all land. Off by
default: a micro-batch is delta-sized, so the extra pipeline stages
are cheap where intra-batch near-dups matter, but feeds that already
dedup upstream shouldn't pay them per batch.

Single writer, like the rollup and HLL stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from traceframe_spark.operators.dedup import (
    dedup_pipeline,
    exact_canonical_ids,
    minhash_signatures,
)
from traceframe_spark.operators import dedup_index as di
from traceframe_spark.streaming import manifest_store as MS
from traceframe_spark.streaming.spans import (
    _batch_already_applied,
    _mark_batch_applied,
)

__all__ = ["stream_dedup_ingest", "read_ingested"]


def _dedup_within_batch(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Collapse exact duplicates inside one micro-batch (keep the
    minimum id per content key) — narrow shuffle of (id, md5) pairs."""
    canon = exact_canonical_ids(batch, id_col, text_col).select(
        F.col("_canon_id").alias("_keep_id")
    )
    return batch.join(
        canon, batch[id_col] == canon["_keep_id"], "left_semi"
    )


def stream_dedup_ingest(
    docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    near_dup: bool = True,
    within_batch_near: bool = False,
    annotate_novelty: bool = False,
    lm_path: str | None = None,
    nb_path: str | None = None,
    bpe_path: str | None = None,
    unigram_path: str | None = None,
    store_protocol: str = "markers",
    lease: bool = False,
    lease_ttl_s: int = 900,
    compact_every: int | None = None,
    vacuum_keep: int | None = None,
    compact_corpus_every: int | None = None,
    corpus_bin_size: int = 100,
    bloom_prefilter: bool = False,
    trigger_available_now: bool = False,
):
    """Run a streaming document feed through the persistent dedup index:
    per micro-batch, drop exact and (``near_dup=True``) LSH near-dup
    matches against everything previously accepted, land survivors at
    ``{out_path}/ingest_batch=<id>``, and fold them into the index at
    ``index_path`` (which must already exist — build the snapshot index
    with ``write_dedup_index`` first; an empty corpus snapshot is fine).

    ``within_batch_near=True`` closes the one gap the index probe
    can't: near-copies of EACH OTHER arriving in the same micro-batch
    (the index only knows previous batches, and the exact-only
    within-batch collapse passes near-copies through). It runs the
    batch near-dup pipeline inside each micro-batch — with the same
    n_hashes/bands/shingle_size the index pinned at build time, so
    in-batch and cross-batch dedup agree on what "near" means — before
    the index probe. Cost is per-batch and batch-sized (the pipeline's
    exact stage has already run, so LSH sees only distinct-content
    residuals), and the batch is shingled + MinHash-signed exactly ONCE:
    the same persisted signature frame feeds the pipeline's candidate/
    verify stages and the index probe's band join (both hash with the
    index's pinned meta, family included).

    ``annotate_novelty=True`` additionally scores each surviving doc
    against the index's STORED gram layer (``write_gram_layer`` must
    have been run on the snapshot) and lands it with ``n_grams``/
    ``n_novel``/``novelty`` columns — the triage signal downstream
    consumers use to prioritise the curation pass — then folds the
    survivors' grams back so later batches are scored against
    everything accepted so far. Replays are safe: the landed rows carry
    their annotation, and both the index append and the gram append are
    idempotent (anti-joined / distinct-consumed).

    ``lm_path`` (optional) additionally scores each surviving doc
    against a FROZEN stored bigram LM
    (:func:`~traceframe_spark.operators.text.write_bigram_lm` — the
    CCNet contract: the quality model is trained once on a reference
    corpus and deliberately NOT folded back, unlike the dedup/gram
    layers, so scores stay comparable across the stream's lifetime) and
    lands it with an ``avg_logprob`` column — the perplexity-style
    quality signal downstream gates threshold on. Documents with fewer
    than 2 tokens land with a null score (the batch scorer's
    no-row contract, surfaced here as a LEFT join).

    ``nb_path`` (optional) additionally classifies each surviving doc
    with a FROZEN stored Naive Bayes classifier
    (:func:`~traceframe_spark.operators.classifier.write_nb_classifier`
    — same frozen-model contract as ``lm_path``: trained once on a
    labeled reference set, deliberately never folded back, so labels
    and margins stay comparable across the stream's lifetime) and
    lands it with ``pred_label``/``nb_score``/``nb_margin`` columns —
    the trained-filter signal (language routing, quality gating)
    downstream consumers threshold on. Documents with no tokens land
    with null columns (the scorer's no-row contract, surfaced here as
    a LEFT join). The model is read + pinned ONCE at stream start.

    ``bpe_path`` (optional) additionally tokenizes each surviving doc
    with a FROZEN stored BPE model
    (:func:`~traceframe_spark.operators.bpe.write_bpe_model` — same
    frozen contract: the merge list IS the tokenizer, and it must stay
    fixed or token ids drift between snapshots) and lands it with an
    ``n_bpe_tokens`` column — the budget signal sequence packing and
    cost accounting consume. The merge list is driver-bounded
    (n_merges rows) and read ONCE at stream start; encoding is a pure
    zero-shuffle projection per batch.

    ``unigram_path`` (optional) does the same with a FROZEN stored
    unigram-LM tokenizer
    (:func:`~traceframe_spark.operators.unigram.write_unigram_model`
    — the second tokenizer family, for pipelines that must match a
    SentencePiece-style target model or compare tokenizations):
    survivors land with ``n_unigram_tokens`` and ``unigram_cost_q``
    columns (the Viterbi segmentation's total quantized cost — a
    per-doc compression/quality signal the BPE path doesn't expose).
    The vocabulary is driver-bounded, read ONCE at stream start, and
    rides each batch's Arrow-batched encode kernel; NULL-text
    survivors keep NULL columns (the encoder's no-row contract,
    surfaced as a LEFT join).

    ``store_protocol="manifest"`` (requires a MANIFEST-protocol index)
    replaces the write-then-mark crash discipline with atomic manifest
    commits for both the fold-back (watermark committed WITH the index
    layers — exactly-once without markers) and the corpus landing
    (snapshot-isolated, object-store-safe); see the module docstring's
    protocol comparison.

    ``lease=True`` (manifest protocol only) makes the single-writer
    contract on the INDEX store self-enforcing: the stream acquires the
    store's writer lease before starting — a second stream against the
    same index fails AT START, loudly, naming the holder — renews it
    every batch (losing the lease mid-stream fails the query instead
    of writing on), and releases it on termination; a crashed holder's
    lease expires after ``lease_ttl_s`` (keep it ≫ the batch
    interval). The corpus store at ``out_path`` rides the same guard:
    one stream writes both.

    ``compact_every=N`` (manifest protocol only) schedules index-store
    compaction INTO the loop: every fold-back appends one directory
    per index layer, so a long-running stream's probe plans otherwise
    list O(batches-since-compaction) directories per layer — forever.
    With the knob set, whenever any layer's live directory list
    reaches N the batch ends by rewriting every layer to ONE directory
    (:func:`~traceframe_spark.streaming.manifest_store.compact_manifest_layers`
    — a normal commit, so racing readers keep full snapshot
    isolation), bounding every probe's listing cost at N directories
    per layer while answers stay byte-identical. The cadence state is
    the manifest itself (live-dir counts), so restarts need no memory.
    Cost per trigger: one index-layer-sized read+write — narrow rows,
    independent of corpus size. ``vacuum_keep=K`` additionally vacuums
    superseded directories after each compaction with ``keep_manifests
    =K`` reader grace (K >= 2 keeps a grace snapshot for readers that
    resolved just before the compaction commit).

    ``bloom_prefilter=True`` (manifest index with the ``ckeys_bloom``
    sidecar) screens each batch's ckeys against the exact layer's
    Bloom filter before the exact join — see
    :func:`~traceframe_spark.operators.dedup_index.dedup_against_index`
    for the measured crossover (default OFF: it pays only once the
    stored-key count makes the ckey scan the probe's dominant term).

    ``compact_corpus_every=M`` (manifest protocol only) puts the CORPUS
    store at ``out_path`` on its own cadence: each batch lands one
    ``ingest_batch=<id>`` directory forever, so a 10k-batch corpus
    otherwise costs full readers a 10k-way union of per-directory
    scans and a batch-count-sized small-file population. When the live
    directory count reaches M, the batch ends by bin-packing
    (:func:`~traceframe_spark.streaming.manifest_store.compact_corpus_store`
    with ``corpus_bin_size``-wide ``ingest_batch`` ranges): only the
    under-packed bins are read+rewritten — O(bin) data per trigger,
    never the corpus — rows stay byte-identical, per-batch pruning
    survives via the manifest's value→bin map + row-group stats, and
    ``vacuum_keep`` reclaims the superseded directories with the same
    reader grace. This cadence is DELIBERATELY separate from
    ``compact_every``: index compaction moves narrow rows every N
    batches, corpus compaction moves data bytes — couple them only if
    your batch bytes are small.

    Returns the started StreamingQuery. Read the curated corpus back
    with :func:`read_ingested`.
    """
    if store_protocol not in ("markers", "manifest"):
        raise ValueError(f"unknown store_protocol {store_protocol!r}")
    manifest_proto = store_protocol == "manifest"
    if manifest_proto and di._manifest_of(docs.sparkSession, index_path) is None:
        raise ValueError(
            f"store_protocol='manifest' needs a manifest-protocol dedup "
            f"index, but {index_path!r} is an append-protocol store — "
            "build it with write_dedup_index(..., protocol='manifest')"
        )
    if lease and not manifest_proto:
        raise ValueError(
            "lease=True needs store_protocol='manifest' (the writer "
            "lease lives in the manifest store)"
        )
    if compact_every is not None and not manifest_proto:
        raise ValueError(
            "compact_every needs store_protocol='manifest' (layer-list "
            "compaction is a manifest-store operation)"
        )
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")
    if compact_corpus_every is not None:
        if not manifest_proto:
            raise ValueError(
                "compact_corpus_every needs store_protocol='manifest' "
                "(corpus bin-packing is a manifest-store operation)"
            )
        if compact_corpus_every < 1:
            raise ValueError("compact_corpus_every must be >= 1")
    lease_token = (
        MS.acquire_writer_lease(
            docs.sparkSession, index_path,
            owner=f"dedup-ingest:{MS._lineage(checkpoint)}", ttl_s=lease_ttl_s,
        )
        if lease
        else None
    )
    if annotate_novelty:
        # fail fast, before any batch commits: without this, a missing
        # gram layer surfaces MID-STREAM inside foreachBatch as a raw
        # missing-path error, possibly after earlier batches landed
        try:
            di.read_gram_meta(docs.sparkSession, index_path)
        except Exception as exc:  # noqa: BLE001 — any read failure means no layer
            raise ValueError(
                f"annotate_novelty=True but the index at {index_path!r} has "
                "no gram layer; run write_gram_layer on the snapshot first"
            ) from exc
    # pinned once at stream start (also fails fast on a missing index):
    # the within-batch pipeline must hash exactly like the index probe —
    # including the hash FAMILY (portable flag), because the batch is
    # signed ONCE and the shared frame feeds both the pipeline and the
    # index probe's band join against stored band hashes
    wb_params = (
        di._meta_all(docs.sparkSession, index_path)
        if within_batch_near
        else None
    )
    lm_frames = None
    if lm_path is not None:
        # read + PIN the frozen model once per stream (fails fast on a
        # missing LM, same rationale as the gram layer above): scoring
        # inside foreachBatch against per-batch reads re-listed the
        # store and re-ran the meta job every micro-batch for a model
        # that is frozen by contract. Persisted WITH lineage: executor
        # loss recomputes from the store (see load_lm_frames).
        from traceframe_spark.operators.text import load_lm_frames

        try:
            lm_frames = load_lm_frames(docs.sparkSession, lm_path)
        except Exception as exc:  # noqa: BLE001 — any read failure means no LM
            raise ValueError(
                f"lm_path={lm_path!r} has no stored bigram LM; run "
                "write_bigram_lm on the reference corpus first"
            ) from exc
    nb_frames = None
    if nb_path is not None:
        # same read-once + pin discipline as the LM above
        from traceframe_spark.operators.classifier import load_nb_frames

        try:
            nb_frames = load_nb_frames(docs.sparkSession, nb_path)
        except Exception as exc:  # noqa: BLE001 — any read failure means no model
            raise ValueError(
                f"nb_path={nb_path!r} has no stored NB classifier; run "
                "write_nb_classifier on the labeled reference set first"
            ) from exc
    bpe_merges = None
    if bpe_path is not None:
        # the tokenizer pin is even simpler than the LM/NB frames: the
        # merge list is n_merges driver rows, loaded once and embedded
        # in each batch's encode projection
        from traceframe_spark.operators.bpe import load_bpe_merges

        try:
            bpe_merges = load_bpe_merges(docs.sparkSession, bpe_path)
        except Exception as exc:  # noqa: BLE001 — any read failure means no model
            raise ValueError(
                f"bpe_path={bpe_path!r} has no stored tokenizer; run "
                "write_bpe_model on the trained merges first"
            ) from exc
    uni_vocab = None
    if unigram_path is not None:
        # same driver-bounded pin as the merge list: vocab rows, once
        from traceframe_spark.operators.unigram import load_unigram_vocab

        try:
            uni_vocab = load_unigram_vocab(docs.sparkSession, unigram_path)
        except Exception as exc:  # noqa: BLE001 — any read failure means no model
            raise ValueError(
                f"unigram_path={unigram_path!r} has no stored tokenizer; "
                "run write_unigram_model on the trained vocabulary first"
            ) from exc

    def _fold_back(survivors: DataFrame) -> None:
        di.append_dedup_index(survivors, index_path, id_col, text_col)
        if annotate_novelty:
            di.append_gram_layer(survivors, index_path, id_col, text_col)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if lease_token is not None:
            MS.renew_writer_lease(spark, index_path, lease_token)
        batch_dir = f"{out_path}/ingest_batch={batch_id}"
        # resolve the index store's manifest ONCE per batch and thread
        # it through every stage (watermark check, probe, novelty,
        # fold-back): each _manifests/ listing + JSON read is driver
        # metadata traffic — 'the per-commit bill on an object store' —
        # and the stages must share one snapshot anyway. None = the
        # append-protocol store, a valid resolved value downstream.
        man0 = di._manifest_of(spark, index_path)
        if manifest_proto:
            # the watermark commits ATOMICALLY with the fold-back, so a
            # recorded batch is a COMPLETELY applied batch — no partial
            # states to patch up, unlike the markers branch below. An
            # unrecorded replay recomputes against the same immutable
            # index snapshot (the fold-back that would have changed it
            # didn't commit), lands identical survivors, and re-commits
            # the corpus pointer idempotently.
            last = (man0 or {}).get("lineage", {}).get(MS._lineage(checkpoint))
            if last is not None and batch_id <= int(last):
                return
        elif _batch_already_applied(spark, out_path, checkpoint, batch_id):
            # corpus write is durable; only the index append may be
            # missing. Re-append from the landed rows (duplicate index
            # rows are harmless — see module docstring).
            survivors = spark.read.parquet(batch_dir)
            if survivors.isEmpty():
                return
            _fold_back(survivors)
            return
        deduped = _dedup_within_batch(batch_df, id_col, text_col)
        shared_sigs = None
        survivors = None
        # ONE try/finally spans signing through fold-back: an exception
        # in any stage (pipeline, probe, novelty, LM scoring, the write)
        # must still unpersist whatever was pinned, or each failed batch
        # attempt leaks a persisted frame in the JVM CacheManager for
        # the life of the session. unpersist() on a never-persisted
        # frame is a no-op, so the finally is unconditional-safe.
        try:
            if wb_params is not None:
                n_hashes, bands, shingle_size, _has_near, portable = wb_params
                # sign the batch ONCE with the index's pinned meta
                # (family included) and feed BOTH stages — the pipeline
                # and the index probe previously each re-shingled +
                # re-signed the same rows with identical parameters
                shared_sigs = minhash_signatures(
                    deduped, id_col, text_col, n_hashes, shingle_size,
                    portable=portable,
                ).persist()
                deduped = dedup_pipeline(
                    deduped,
                    id_col,
                    text_col,
                    threshold=threshold,
                    n_hashes=n_hashes,
                    bands=bands,
                    shingle_size=shingle_size,
                    sigs=shared_sigs,
                )
            survivors = di.dedup_against_index(
                deduped,
                index_path,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
                near_dup=near_dup,
                sigs=shared_sigs,
                man=man0,
                bloom_prefilter=bloom_prefilter,
            )
            # hold the probe's persisted signature frame alive for the
            # whole batch scope (operators/dedup._unpersist_with ties
            # the cache's lifetime to the returned frame; the rebinds
            # below would drop it and unpersist mid-batch)
            _probe_keepalive = getattr(survivors, "_tf_keepalive", ())  # noqa: F841
            if annotate_novelty:
                # score BEFORE the fold-back below so a doc is never
                # "not novel" because of its own grams
                nov = di.novelty_against_index(
                    survivors, index_path, id_col, text_col, man=man0
                )
                survivors = survivors.join(nov, id_col)
            if lm_frames is not None:
                from traceframe_spark.operators.text import score_against_lm

                lp = score_against_lm(
                    survivors, id_col=id_col, text_col=text_col, frames=lm_frames
                )
                survivors = survivors.join(
                    lp.withColumnRenamed("id", id_col), id_col, "left"
                )
            if nb_frames is not None:
                from traceframe_spark.operators.classifier import score_against_nb

                nb = score_against_nb(
                    survivors, id_col=id_col, text_col=text_col, frames=nb_frames
                ).select(
                    F.col("id").alias(id_col),
                    "pred_label",
                    F.col("score").alias("nb_score"),
                    F.col("margin").alias("nb_margin"),
                )
                survivors = survivors.join(nb, id_col, "left")
            if bpe_merges is not None:
                from traceframe_spark.operators.bpe import encode

                # encode(NULL text) yields a NULL token array, and
                # F.size(NULL) is -1 under Spark's legacy sizeOfNull —
                # a nonsense budget signal. NULL-text survivors (their
                # NULL content hash never matches the index) keep a
                # NULL token count instead.
                survivors = encode(
                    survivors, bpe_merges, text_col=text_col, out_col="_toks"
                ).withColumn(
                    "n_bpe_tokens",
                    F.when(
                        F.col("_toks").isNull(), F.lit(None)
                    ).otherwise(F.size("_toks")).cast("long"),
                ).drop("_toks")
            if uni_vocab is not None:
                from traceframe_spark.operators.unigram import encode_unigram

                uni = encode_unigram(
                    survivors, uni_vocab, id_col=id_col, text_col=text_col
                ).select(
                    F.col("id").alias(id_col),
                    F.col("n_tokens").alias("n_unigram_tokens"),
                    F.col("cost_q").alias("unigram_cost_q"),
                )
                survivors = survivors.join(uni, id_col, "left")
            survivors = survivors.persist()
            if manifest_proto:
                if survivors.isEmpty():
                    # record "this batch produced nothing" exactly-once:
                    # a metadata-only commit carrying just the watermark
                    MS.commit_layer_frames(
                        spark, index_path, {},
                        checkpoint=checkpoint, batch_id=batch_id,
                    )
                else:
                    # corpus FIRST, fold-back (with watermark) SECOND: a
                    # crash between them replays into an identical
                    # recompute whose corpus commit REPLACES this
                    # batch's pointer (the orphaned directory is
                    # vacuum-reclaimable); once the fold-back commits,
                    # the watermark skips the whole batch. shuffle=False:
                    # the commit touches one partition value, so the
                    # repartition would funnel the batch through 1 task.
                    MS.commit_merged_parts(
                        survivors.withColumn("ingest_batch", F.lit(batch_id)),
                        out_path, "ingest_batch", shuffle=False,
                    )
                    di.append_curation_layers(
                        survivors, index_path, id_col, text_col,
                        grams=annotate_novelty,
                        checkpoint=checkpoint, batch_id=batch_id,
                        man=man0,
                    )
                # cadence check runs AFTER the watermarked fold-back:
                # a crash between them replays into a watermark skip,
                # and the still-over-bound dir counts re-trigger the
                # compaction on the next live batch
                MS.run_scheduled_compaction(
                    spark, index_path, compact_every, vacuum_keep, man0
                )
                if compact_corpus_every is not None:
                    # the CORPUS store's cadence: one parts directory
                    # lands per batch forever; when the live directory
                    # count reaches the knob, bin-pack (reads only the
                    # under-packed bins — O(bin) data, not the corpus)
                    # and reclaim. Cadence state is the corpus manifest
                    # itself — restart-safe, same as the index cadence.
                    cman = MS._latest_manifest(spark, out_path)
                    if cman is not None and len(
                        set(cman.get("parts", {}).values())
                    ) >= compact_corpus_every:
                        MS.compact_corpus_store(
                            spark, out_path, bin_size=corpus_bin_size
                        )
                        if vacuum_keep is not None:
                            MS.vacuum_manifest_store(
                                spark, out_path, keep_manifests=vacuum_keep
                            )
            else:
                survivors.write.mode("overwrite").parquet(batch_dir)
                _mark_batch_applied(spark, out_path, checkpoint, batch_id)
                if not survivors.isEmpty():
                    _fold_back(survivors)
        finally:
            if survivors is not None:
                survivors.unpersist()
            if shared_sigs is not None:
                shared_sigs.unpersist()

    writer = docs.writeStream.foreachBatch(ingest_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if lease_token is not None:
        return MS._start_leased_stream(
            docs.sparkSession, writer, index_path, lease_token
        )
    return writer.start()


def read_ingested(spark: SparkSession, out_path: str) -> DataFrame:
    """The curated corpus the stream has landed so far: all surviving
    documents plus the ``ingest_batch`` partition column (which batch
    accepted each doc). Protocol auto-detected: a manifest-protocol
    corpus resolves one manifest (whole-corpus snapshot, even mid-
    commit); a markers-protocol corpus is plain partitioned parquet.
    Partition pruning on ``ingest_batch`` works for incremental
    consumers either way."""
    if MS.is_manifest_store(spark, out_path):
        return MS.read_manifest_store(spark, out_path)
    return spark.read.parquet(out_path)
