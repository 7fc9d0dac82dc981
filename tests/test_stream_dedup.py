"""Streaming dedup ingest: micro-batches probed against the persistent
dedup index, survivors landed + folded back (streaming/documents.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import dedup_index as di
from traceframe_spark.streaming.documents import read_ingested, stream_dedup_ingest

UNIQ = "w{i} " * 40  # 40-token template; formatted per doc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(i):
    return " ".join(f"tok{i}x{j} word{j} base{i}" for j in range(20))


@pytest.fixture()
def corpus_feed(spark, tmp_path):
    """Snapshot of 3 docs; feed of 3 micro-batch files exercising every
    layer: exact clone of a snapshot doc, exact clone WITHIN a batch,
    clone of a doc accepted in an EARLIER batch, near-clone (one-word
    edit) of a snapshot doc, and fresh docs."""
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx = str(tmp_path / "idx")
    di.write_dedup_index(snap, idx, n_hashes=64, bands=16)

    near = _uniq(1).replace("word3", "edited3", 1)  # near-clone of doc 1
    batches = [
        [(100, _uniq(0)), (101, _uniq(50))],             # clone of snapshot; fresh
        [(200, _uniq(60)), (201, _uniq(60)), (202, near)],  # within-batch pair; near-clone
        [(300, _uniq(50)), (301, _uniq(70))],            # clone of batch-0 survivor; fresh
    ]
    import json

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate(batches):
        with open(feed / f"b{i}.jsonl", "w") as f:
            for doc_id, text_ in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text_}) + "\n")
    return idx, str(feed)


def _run_stream(spark, idx, feed, out, ckpt, **kw):
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(feed)
    q = stream_dedup_ingest(
        stream, idx, out, ckpt, trigger_available_now=True, **kw
    )
    q.awaitTermination()


def test_stream_dedup_layers(spark, tmp_path, corpus_feed):
    idx, feed = corpus_feed
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, idx, feed, out, ckpt)
    got = {r.doc_id for r in read_ingested(spark, out).collect()}
    # 100 dies in the exact layer (snapshot clone); 201 dies within its
    # batch (200 is the min-id canonical); 202 dies in the LSH layer
    # (near-clone of snapshot doc 1); 300 dies in the exact layer
    # against a PREVIOUS BATCH's survivor (101) — the incremental fold
    assert got == {101, 200, 301}
    # every survivor is now in the index: re-probing them kills them all
    again = _docs(spark, [(900 + i, t) for i, t in enumerate(
        [_uniq(50), _uniq(60), _uniq(70)])])
    assert di.dedup_against_index(again, idx).count() == 0


def test_stream_dedup_restart_is_idempotent(spark, tmp_path, corpus_feed):
    idx, feed = corpus_feed
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, idx, feed, out, ckpt)
    first = sorted(r.doc_id for r in read_ingested(spark, out).collect())
    # availableNow restart on the same checkpoint: no new files, no change
    _run_stream(spark, idx, feed, out, ckpt)
    assert sorted(r.doc_id for r in read_ingested(spark, out).collect()) == first


def test_stream_dedup_exact_only(spark, tmp_path, corpus_feed):
    idx, feed = corpus_feed
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _run_stream(spark, idx, feed, out, ckpt, near_dup=False)
    got = {r.doc_id for r in read_ingested(spark, out).collect()}
    # with the LSH layer off, the near-clone 202 SURVIVES
    assert got == {101, 200, 202, 301}


def test_stream_near_layer_knows_batch_survivors(spark, tmp_path, corpus_feed):
    # REGRESSION (r08): the fold-back must append REAL sig/band rows for
    # batch survivors (the recacheByPath empty-append bug) — a NEAR-clone
    # of a doc accepted mid-stream must die on a later probe, not just
    # its exact copy
    idx, feed = corpus_feed
    out, ckpt = str(tmp_path / "out4"), str(tmp_path / "ckpt4")
    sig0 = spark.read.parquet(f"{idx}/sigs").count()
    _run_stream(spark, idx, feed, out, ckpt)
    # three survivors folded back -> three new signature rows
    assert spark.read.parquet(f"{idx}/sigs").count() == sig0 + 3
    near_of_survivor = _docs(spark, [(950, _uniq(50) + " y")])
    assert di.dedup_against_index(near_of_survivor, idx, threshold=0.9).count() == 0


def test_stream_within_batch_near_collapses_burst(spark, tmp_path):
    """A burst of near-copies arriving in ONE micro-batch: the exact
    within-batch collapse passes them (different bytes) and the index
    probe passes them (previous batches only), so without
    within_batch_near they ALL land; with it, the in-batch pipeline
    collapses the burst to its min-id canonical. Replay-idempotent.
    Each arm gets its OWN index: the stream folds survivors back, so a
    shared index would let the control run poison the treatment run."""
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx0, idx = str(tmp_path / "idx_ctl"), str(tmp_path / "idx_wb")
    di.write_dedup_index(snap, idx0, n_hashes=64, bands=16)
    di.write_dedup_index(snap, idx, n_hashes=64, bands=16)
    base = _uniq(80)
    burst = [
        (400, base),
        (401, base.replace("word2", "edit2", 1)),   # near-copy of 400
        (402, base.replace("word5", "edit5", 1)),   # near-copy of 400
        (403, _uniq(90)),                           # fresh
    ]
    import json

    feed = tmp_path / "burst_feed"
    feed.mkdir()
    with open(feed / "b0.jsonl", "w") as f:
        for doc_id, text_ in burst:
            f.write(json.dumps({"doc_id": doc_id, "text": text_}) + "\n")

    # control: near-copies of each other all land without the flag
    out0, ckpt0 = str(tmp_path / "outc"), str(tmp_path / "ckptc")
    _run_stream(spark, idx0, str(feed), out0, ckpt0)
    assert {r.doc_id for r in read_ingested(spark, out0).collect()} == {
        400, 401, 402, 403,
    }

    out, ckpt = str(tmp_path / "outw"), str(tmp_path / "ckptw")
    _run_stream(spark, idx, str(feed), out, ckpt, within_batch_near=True)
    got = {r.doc_id for r in read_ingested(spark, out).collect()}
    assert got == {400, 403}  # burst collapsed to its canonical
    # replay on the same checkpoint: idempotent
    _run_stream(spark, idx, str(feed), out, ckpt, within_batch_near=True)
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {400, 403}


def test_stream_dedup_novelty_annotation(spark, tmp_path, corpus_feed):
    idx, feed = corpus_feed
    # gram layer over the same snapshot the index was built from
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    di.write_gram_layer(snap, idx, n=3)
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    _run_stream(spark, idx, feed, out, ckpt, annotate_novelty=True)
    rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    # survivors are annotated, fresh content scores fully novel against
    # the snapshot + earlier batches
    for r in rows.values():
        assert r.n_grams > 0 and 0.0 <= r.novelty <= 1.0
    assert rows[101].novelty == 1.0   # nothing shares its grams
    assert rows[200].novelty == 1.0
    # fold-back includes grams: a delta repeating an ACCEPTED doc's text
    # scores novelty 0 afterwards
    again = _docs(spark, [(900, _uniq(50))])
    nov = di.novelty_against_index(again, idx).first()
    assert nov["novelty"] == 0.0
    # replay on the same checkpoint: idempotent, annotation preserved
    _run_stream(spark, idx, feed, out, ckpt, annotate_novelty=True)
    again_rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(again_rows) == {101, 200, 301}
    assert again_rows[101].novelty == 1.0


def test_stream_dedup_lm_quality_annotation(spark, tmp_path, corpus_feed):
    """lm_path: survivors land with an avg_logprob column scored against
    the FROZEN stored LM (trained once on the snapshot, never folded
    back), matching the batch scorer's answer for the same rows;
    replay-idempotent; a missing LM fails fast at stream start."""
    from traceframe_spark.operators.text import score_against_lm, write_bigram_lm

    idx, feed = corpus_feed
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    lm = str(tmp_path / "lm")
    write_bigram_lm(snap, lm)
    out, ckpt = str(tmp_path / "out_lm"), str(tmp_path / "ckpt_lm")
    _run_stream(spark, idx, feed, out, ckpt, lm_path=lm)
    rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    landed = {i: rows[i].avg_logprob for i in rows}
    # batch twin on the same surviving texts against the same store
    survivors = _docs(spark, [(i, rows[i].text) for i in rows])
    want = {
        r["id"]: r["avg_logprob"]
        for r in score_against_lm(survivors, lm).collect()
    }
    assert set(want) == set(landed)
    for i in want:
        assert abs(landed[i] - want[i]) < 1e-12
    # replay: idempotent, annotation preserved
    _run_stream(spark, idx, feed, out, ckpt, lm_path=lm)
    again = {r.doc_id: r.avg_logprob for r in read_ingested(spark, out).collect()}
    assert again == landed
    # fail-fast on a missing LM, before any batch commits
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stored bigram LM"):
        _run_stream(
            spark, idx, feed, str(tmp_path / "out_bad"),
            str(tmp_path / "ckpt_bad"), lm_path=str(tmp_path / "nope"),
        )


def test_stream_dedup_nb_classifier_annotation(spark, tmp_path, corpus_feed):
    """nb_path: survivors land with pred_label/nb_score/nb_margin from
    the FROZEN stored classifier (same frozen-model contract as
    lm_path), matching the batch scorer's answer for the same rows;
    replay-idempotent; a missing model fails fast at stream start."""
    from traceframe_spark.operators.classifier import (
        score_against_nb,
        write_nb_classifier,
    )

    idx, feed = corpus_feed
    labeled = _docs(spark, [(i, _uniq(i)) for i in range(4)]).withColumn(
        "lab", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    nb = str(tmp_path / "nb")
    write_nb_classifier(labeled, nb, "lab", n_buckets=512)
    out, ckpt = str(tmp_path / "out_nb"), str(tmp_path / "ckpt_nb")
    _run_stream(spark, idx, feed, out, ckpt, nb_path=nb)
    rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    landed = {
        i: (rows[i].pred_label, rows[i].nb_score, rows[i].nb_margin) for i in rows
    }
    survivors = _docs(spark, [(i, rows[i].text) for i in rows])
    want = {
        r["id"]: (r["pred_label"], r["score"], r["margin"])
        for r in score_against_nb(survivors, nb).collect()
    }
    assert set(want) == set(landed)
    for i in want:
        assert landed[i][0] == want[i][0]
        assert abs(landed[i][1] - want[i][1]) < 1e-12
        assert abs(landed[i][2] - want[i][2]) < 1e-12
    # replay: idempotent, annotation preserved
    _run_stream(spark, idx, feed, out, ckpt, nb_path=nb)
    again = {
        r.doc_id: (r.pred_label, r.nb_score, r.nb_margin)
        for r in read_ingested(spark, out).collect()
    }
    assert again == landed
    # fail-fast on a missing model, before any batch commits
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stored NB classifier"):
        _run_stream(
            spark, idx, feed, str(tmp_path / "out_nbbad"),
            str(tmp_path / "ckpt_nbbad"), nb_path=str(tmp_path / "nope_nb"),
        )


def test_within_batch_near_signs_each_batch_once(spark, tmp_path, monkeypatch):
    """within_batch_near=True used to shingle + MinHash-sign every
    micro-batch TWICE with identical pinned params (once in
    dedup_pipeline, once in dedup_against_index). The batch is now
    signed exactly once and the shared persisted frame feeds both
    stages — pinned by counting minhash_signatures calls across a
    1-batch run (every import site patched). Answers unchanged
    (test_stream_within_batch_near_collapses_burst covers semantics)."""
    import json

    import traceframe_spark.operators.dedup as D
    import traceframe_spark.operators.dedup_index as DI
    import traceframe_spark.streaming.documents as SD

    calls = []
    real = D.minhash_signatures

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(D, "minhash_signatures", counting)
    monkeypatch.setattr(DI, "minhash_signatures", counting)
    monkeypatch.setattr(SD, "minhash_signatures", counting)

    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx = str(tmp_path / "idx_once")
    di.write_dedup_index(snap, idx, n_hashes=64, bands=16)
    calls.clear()  # ignore any signing during the index build
    feed = tmp_path / "feed_once"
    feed.mkdir()
    base = _uniq(80)
    with open(feed / "b0.jsonl", "w") as f:
        for doc_id, text_ in [(500, base), (501, base.replace("word2", "e2", 1))]:
            f.write(json.dumps({"doc_id": doc_id, "text": text_}) + "\n")
    out, ckpt = str(tmp_path / "out_once"), str(tmp_path / "ckpt_once")
    _run_stream(spark, idx, str(feed), out, ckpt, within_batch_near=True)
    # exactly 2: the ONE shared probe-side signing (pipeline + index
    # probe both consume it; pre-r10 each signed separately = 3 total)
    # plus the fold-back append's storage signing of the survivors
    assert sum(calls) == 2, f"signed {sum(calls)} times, expected 2"
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {500}


def test_stream_lm_is_pinned_once_per_stream(spark, tmp_path, corpus_feed):
    """The frozen LM is read + persist-PINNED (eagerly materialized,
    lineage retained) at stream start, not re-read per micro-batch:
    (a) scoring against pinned frames survives the model path being
    DELETED while the blocks stay cached — if any per-batch read
    remained, every score after the delete would throw; (b) end-to-end,
    a stream whose model directory vanishes right after start still
    lands every batch with correct scores. (Lineage is deliberately
    retained so executor loss recomputes from the store — see
    load_lm_frames.)"""
    import shutil

    from traceframe_spark.operators.text import (
        load_lm_frames,
        score_against_lm,
        write_bigram_lm,
    )

    idx, feed = corpus_feed
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    lm = str(tmp_path / "lm_pin")
    write_bigram_lm(snap, lm)
    # (a) direct: pin, delete the store, score — values match the
    # pre-delete path-based scorer
    probe = _docs(spark, [(7, _uniq(1))])
    want = {r["id"]: r["avg_logprob"] for r in score_against_lm(probe, lm).collect()}
    frames = load_lm_frames(spark, lm)
    shutil.rmtree(lm)
    got = {
        r["id"]: r["avg_logprob"]
        for r in score_against_lm(probe, frames=frames).collect()
    }
    assert got == want
    # (b) end-to-end: the stream pins before start(); deleting the model
    # directory immediately after start must not fail any batch
    lm2 = str(tmp_path / "lm_pin2")
    write_bigram_lm(snap, lm2)
    out, ckpt = str(tmp_path / "out_pin"), str(tmp_path / "ckpt_pin")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(feed)
    q = stream_dedup_ingest(
        stream, idx, out, ckpt, trigger_available_now=True, lm_path=lm2
    )
    shutil.rmtree(lm2)
    assert q.awaitTermination(600)
    rows = {r.doc_id: r.avg_logprob for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    assert all(v is not None and v < 0 for v in rows.values())


def test_manifest_loop_resolves_store_once_per_batch(spark, tmp_path, monkeypatch):
    """store_protocol='manifest' used to resolve the index store's
    latest manifest FOUR times per micro-batch (watermark check, probe,
    novelty, fold-back) — each a _manifests/ listing + JSON read of
    driver metadata, the documented per-commit bill on an object store.
    The batch now resolves once and threads the manifest through every
    stage — pinned by counting _latest_manifest calls on the INDEX path
    across a 1-batch run (the corpus store at out_path legitimately
    resolves during its own commit and is excluded)."""
    import json

    import traceframe_spark.streaming.manifest_store as MSm

    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx = str(tmp_path / "idx_res")
    di.write_dedup_index(snap, idx, n_hashes=64, bands=16, protocol="manifest")
    di.write_gram_layer(snap, idx, n=3)

    calls = []
    real = MSm._latest_manifest

    def counting(spark_, path):
        if path == idx:
            calls.append(path)
        return real(spark_, path)

    monkeypatch.setattr(MSm, "_latest_manifest", counting)

    feed = tmp_path / "feed_res"
    feed.mkdir()
    for b, did in enumerate((700, 701)):
        with open(feed / f"b{b}.jsonl", "w") as f:
            f.write(json.dumps({"doc_id": did, "text": _uniq(70 + b)}) + "\n")
    out, ckpt = str(tmp_path / "out_res"), str(tmp_path / "ckpt_res")
    _run_stream(
        spark, idx, str(feed), out, ckpt,
        annotate_novelty=True, store_protocol="manifest",
    )
    # 2 one-time stream-START validations (protocol check + gram
    # fail-fast) + 1 per batch (threaded through watermark check,
    # probe, novelty, AND the fold-back commit) = 4 for two batches.
    # The pre-fix loop resolved 4x per batch (= 10 here).
    assert len(calls) <= 4, f"index manifest resolved {len(calls)} times"
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {700, 701}


def test_stream_dedup_bpe_token_annotation(spark, tmp_path, corpus_feed):
    """bpe_path: survivors land with n_bpe_tokens from the FROZEN
    stored tokenizer (write_bpe_model), matching the batch encoder for
    the same rows; replay-idempotent; a missing model fails fast at
    stream start."""
    from traceframe_spark.operators import bpe

    idx, feed = corpus_feed
    train = _docs(spark, [(i, _uniq(i)) for i in range(4)])
    merges, syms = bpe.learn_bpe(train, 6)
    syms.unpersist()
    model = str(tmp_path / "bpe_model")
    bpe.write_bpe_model(spark, merges, model, protocol="manifest")
    out, ckpt = str(tmp_path / "out_bpe"), str(tmp_path / "ckpt_bpe")
    _run_stream(spark, idx, feed, out, ckpt, bpe_path=model)
    rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    landed = {i: rows[i].n_bpe_tokens for i in rows}
    survivors = _docs(spark, [(i, rows[i].text) for i in rows])
    want = {
        r["doc_id"]: len(r["tokens"])
        for r in bpe.encode_against_bpe(survivors, model).collect()
    }
    assert landed == want and all(v > 0 for v in landed.values())
    # replay: idempotent, annotation preserved
    _run_stream(spark, idx, feed, out, ckpt, bpe_path=model)
    again = {r.doc_id: r.n_bpe_tokens for r in read_ingested(spark, out).collect()}
    assert again == landed
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stored tokenizer"):
        _run_stream(
            spark, idx, feed, str(tmp_path / "out_bpebad"),
            str(tmp_path / "ckpt_bpebad"), bpe_path=str(tmp_path / "nope_bpe"),
        )


def test_stream_dedup_unigram_token_annotation(spark, tmp_path, corpus_feed):
    """unigram_path: survivors land with n_unigram_tokens +
    unigram_cost_q from the FROZEN stored unigram-LM tokenizer
    (write_unigram_model), matching the batch encoder for the same
    rows; NULL-text survivors keep NULL columns; a missing model fails
    fast at stream start. Both tokenizer annotations compose (bpe_path
    + unigram_path on one stream)."""
    import json

    from traceframe_spark.operators import bpe, unigram

    idx, feed = corpus_feed
    train = _docs(spark, [(i, _uniq(i)) for i in range(4)])
    vocab = unigram.learn_unigram(train, seed_size=8, n_rounds=1)
    model = str(tmp_path / "uni_model")
    unigram.write_unigram_model(spark, vocab, model, protocol="manifest")
    merges, syms = bpe.learn_bpe(train, 4)
    syms.unpersist()
    bmodel = str(tmp_path / "uni_bpe_model")
    bpe.write_bpe_model(spark, merges, bmodel)
    out, ckpt = str(tmp_path / "out_uni"), str(tmp_path / "ckpt_uni")
    _run_stream(
        spark, idx, feed, out, ckpt, bpe_path=bmodel, unigram_path=model
    )
    rows = {r.doc_id: r for r in read_ingested(spark, out).collect()}
    assert set(rows) == {101, 200, 301}
    survivors = _docs(spark, [(i, rows[i].text) for i in rows])
    want = {
        r["id"]: (r["n_tokens"], r["cost_q"])
        for r in unigram.encode_against_unigram(survivors, model).collect()
    }
    got = {
        i: (rows[i].n_unigram_tokens, rows[i].unigram_cost_q) for i in rows
    }
    assert got == want and all(n > 0 for n, _ in got.values())
    assert all(rows[i].n_bpe_tokens > 0 for i in rows)  # both annotations

    # NULL-text survivor keeps NULL token columns
    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx2 = str(tmp_path / "idx_nulluni")
    di.write_dedup_index(snap, idx2, n_hashes=64, bands=16)
    feed2 = tmp_path / "feed_nulluni"
    feed2.mkdir()
    with open(feed2 / "b0.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 900, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": 901, "text": _uniq(90)}) + "\n")
    out2, ckpt2 = str(tmp_path / "out_nulluni"), str(tmp_path / "ckpt_nulluni")
    _run_stream(spark, idx2, str(feed2), out2, ckpt2, unigram_path=model)
    r2 = {r.doc_id: r for r in read_ingested(spark, out2).collect()}
    assert r2[900].n_unigram_tokens is None and r2[900].unigram_cost_q is None
    assert r2[901].n_unigram_tokens > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stored tokenizer"):
        _run_stream(
            spark, idx, feed, str(tmp_path / "out_unibad"),
            str(tmp_path / "ckpt_unibad"),
            unigram_path=str(tmp_path / "nope_uni"),
        )


def test_stream_dedup_bpe_null_text_token_count(spark, tmp_path):
    """A NULL-text survivor (its NULL content hash never matches the
    index, so it passes dedup) lands with n_bpe_tokens NULL — not the
    -1 that F.size(NULL) produces under legacy sizeOfNull (the r12
    advisory finding)."""
    import json

    from traceframe_spark.operators import bpe

    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    idx = str(tmp_path / "idx_nullbpe")
    di.write_dedup_index(snap, idx, n_hashes=64, bands=16)
    train = _docs(spark, [(i, _uniq(i)) for i in range(4)])
    merges, syms = bpe.learn_bpe(train, 6)
    syms.unpersist()
    model = str(tmp_path / "bpe_model_null")
    bpe.write_bpe_model(spark, merges, model, protocol="manifest")

    feed = tmp_path / "feed_nullbpe"
    feed.mkdir()
    with open(feed / "b0.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 900, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": 901, "text": _uniq(90)}) + "\n")
    out, ckpt = str(tmp_path / "out_nullbpe"), str(tmp_path / "ckpt_nullbpe")
    _run_stream(spark, idx, str(feed), out, ckpt, bpe_path=model)
    rows = {r.doc_id: r.n_bpe_tokens for r in read_ingested(spark, out).collect()}
    assert rows[900] is None
    assert rows[901] is not None and rows[901] > 0


@pytest.mark.volume
def test_corpus_compaction_cadence_bounds_files(spark, tmp_path):
    """compact_corpus_every: a 9-batch feed that would land 9 corpus
    directories (and 9+ small files) forever stays bin-packed — live
    corpus directory count bounded, parquet file count bounded, rows
    (incl. ingest_batch) byte-identical to an uncompacted control run,
    per-batch pruning still exact; markers protocol refuses the knob."""
    import json
    import subprocess

    from traceframe_spark.streaming import manifest_store as MS

    snap = _docs(spark, [(i, _uniq(i)) for i in range(3)])
    feed = tmp_path / "feed_cbins"
    feed.mkdir()
    for b in range(9):
        with open(feed / f"b{b}.jsonl", "w") as f:
            f.write(json.dumps({"doc_id": 500 + b, "text": _uniq(200 + b)}) + "\n")

    def run(name, **kw):
        idx = str(tmp_path / f"idx_{name}")
        di.write_dedup_index(snap, idx, n_hashes=64, bands=16, protocol="manifest")
        out = str(tmp_path / f"out_{name}")
        _run_stream(
            spark, idx, str(feed), out, str(tmp_path / f"ckpt_{name}"),
            store_protocol="manifest", **kw,
        )
        return out

    ctrl = run("cb_ctrl")
    packed = run(
        "cb_on", compact_corpus_every=3, corpus_bin_size=4, vacuum_keep=2
    )
    want = sorted(
        (r["doc_id"], r["text"], r["ingest_batch"])
        for r in read_ingested(spark, ctrl).collect()
    )
    got = sorted(
        (r["doc_id"], r["text"], r["ingest_batch"])
        for r in read_ingested(spark, packed).collect()
    )
    assert got == want and len(got) == 9
    man_ctrl = MS._latest_manifest(spark, ctrl)
    man_pack = MS._latest_manifest(spark, packed)
    assert len(set(man_ctrl["parts"].values())) == 9  # unbounded control
    assert len(set(man_pack["parts"].values())) <= 4  # bins + live tail
    n_files = int(subprocess.run(
        ["bash", "-c", f"find {packed} -name '*.parquet' | wc -l"],
        capture_output=True, text=True,
    ).stdout)
    n_ctrl = int(subprocess.run(
        ["bash", "-c", f"find {ctrl} -name '*.parquet' | wc -l"],
        capture_output=True, text=True,
    ).stdout)
    assert n_files < n_ctrl  # vacuumed bins beat one-dir-per-batch
    # pruning is still per batch after packing (file->batch order is the
    # source's choice, so compare against the control run's mapping)
    expect_b3 = sorted(d for d, _, ib in want if ib == 3)
    one = MS._read_parts(spark, packed, man_pack, ["3"])
    assert sorted(r["doc_id"] for r in one.collect()) == expect_b3
    # the knob needs the manifest protocol
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compact_corpus_every"):
        _run_stream(
            spark, str(tmp_path / "idx_cb_ctrl"), str(feed),
            str(tmp_path / "out_bad"), str(tmp_path / "ckpt_bad"),
            compact_corpus_every=3,
        )
