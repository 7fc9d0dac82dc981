"""Manifest-protocol curation stores: the dedup index / gram layer /
stored LM committed through the layer-manifest protocol
(operators/dedup_index.py + streaming/manifest_store.commit_layer_frames),
and stream_dedup_ingest(store_protocol="manifest") — the atomic
in-manifest replay watermark that replaces the write-then-mark markers.

Covers: answer equivalence with the append protocol, auto-detection,
whole-index snapshot isolation under a concurrent fold-back, the
exactly-once stream (no duplicate index rows EVER — stronger than the
markers protocol's "duplicates are absorbed"), crash replay in the
corpus-committed-but-not-folded window, torn manifests not consuming
vacuum grace slots, and layer compaction."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import dedup_index as di
from traceframe_spark.operators.text import (
    load_lm_frames,
    score_against_lm,
    write_bigram_lm,
)
from traceframe_spark.streaming import manifest_store as MS
from traceframe_spark.streaming.documents import read_ingested, stream_dedup_ingest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(i):
    return " ".join(f"tok{i}x{j} word{j} base{i}" for j in range(20))


def _snap(spark):
    return _docs(spark, [(i, _uniq(i)) for i in range(3)])


def _delta(spark):
    near = _uniq(1).replace("word3", "edited3", 1)  # near-clone of doc 1
    return _docs(spark, [(100, _uniq(0)), (101, _uniq(50)), (102, near)])


def _layer_counts(spark, idx):
    return {
        layer: MS.read_manifest_layer(spark, idx, layer).count()
        for layer in MS._latest_manifest(spark, idx)["layers"]
    }


def test_manifest_index_matches_append_and_probe_is_snapshot(spark, tmp_path):
    """Same build/probe/novelty answers under both protocols; and on the
    manifest index a LAZY probe plan survives a concurrent fold-back
    unchanged (whole-index snapshot isolation — the structural property
    the append protocol's localCheckpoint discipline exists to paper
    over)."""
    got = {}
    for proto in ("append", "manifest"):
        idx = str(tmp_path / f"idx_{proto}")
        di.write_dedup_index(_snap(spark), idx, n_hashes=64, bands=16, protocol=proto)
        di.write_gram_layer(_snap(spark), idx, n=3)
        surv = di.dedup_against_index(_delta(spark), idx)
        nov = di.novelty_against_index(_delta(spark), idx)
        got[proto] = (
            sorted(r.doc_id for r in surv.collect()),
            {r.doc_id: round(r.novelty, 6) for r in nov.collect()},
            di.read_gram_meta(spark, idx),
        )
    assert got["append"] == got["manifest"]
    assert got["manifest"][0] == [101]  # 100 exact-dies, 102 LSH-dies

    # snapshot isolation: resolve a probe plan, fold survivors' CONTENT
    # into the index through an independent frame, then evaluate the
    # old plan — it must still answer against the pre-append snapshot
    idx = str(tmp_path / "idx_manifest")
    lazy = di.dedup_against_index(_delta(spark), idx)
    di.append_curation_layers(
        _docs(spark, [(500, _uniq(50))]), idx, grams=True
    )
    assert sorted(r.doc_id for r in lazy.collect()) == [101]
    # a FRESH probe sees the new snapshot: 101's content is now stored
    assert di.dedup_against_index(_delta(spark), idx).count() == 0


def test_manifest_appends_autodetect_and_day_n_loop(spark, tmp_path):
    """The canonical daily two-call sequence (append_dedup_index then
    append_gram_layer) auto-detects the manifest store and still pins
    the caller's frame; re-probe after fold-back is 0; layer row counts
    are EXACT (one copy per doc — the protocol cannot produce duplicate
    rows)."""
    idx = str(tmp_path / "idx")
    di.write_dedup_index(_snap(spark), idx, n_hashes=64, bands=16, protocol="manifest")
    di.write_gram_layer(_snap(spark), idx, n=3)
    surv = di.dedup_against_index(_delta(spark), idx)
    di.append_dedup_index(surv, idx)
    di.append_gram_layer(surv, idx)
    counts = _layer_counts(spark, idx)
    assert counts["exact"] == 4 and counts["sigs"] == 4  # 3 snap + 1 survivor
    assert counts["bands"] == 4 * 16
    assert di.dedup_against_index(_docs(spark, [(900, _uniq(50))]), idx).count() == 0
    nov = di.novelty_against_index(_docs(spark, [(901, _uniq(50))]), idx)
    assert nov.collect()[0]["novelty"] == 0.0  # grams folded back too


def test_append_curation_layers_is_one_commit_with_watermark(spark, tmp_path):
    idx = str(tmp_path / "idx")
    di.write_dedup_index(_snap(spark), idx, n_hashes=32, bands=8, protocol="manifest")
    di.write_gram_layer(_snap(spark), idx, n=3)
    before = MS._latest_manifest(spark, idx)["n"]
    n = di.append_curation_layers(
        _docs(spark, [(7, _uniq(7))]), idx, grams=True, checkpoint="ck", batch_id=4
    )
    assert n == before + 1  # exact+sigs+bands+grams+watermark: ONE commit
    assert MS.manifest_last_batch(spark, idx, "ck") == 4
    man = MS._latest_manifest(spark, idx)
    # ckeys_bloom: the r13 exact-layer sidecar rides the same commit
    assert set(man["layers"]) == {"exact", "sigs", "bands", "grams", "ckeys_bloom"}
    with pytest.raises(ValueError, match="manifest-protocol"):
        idx2 = str(tmp_path / "idx_append")
        di.write_dedup_index(_snap(spark), idx2, n_hashes=32, bands=8)
        di.append_curation_layers(_docs(spark, [(8, _uniq(8))]), idx2)


def test_manifest_lm_store_matches_append(spark, tmp_path):
    docs = _docs(spark, [(i, _uniq(i % 4)) for i in range(12)])
    probe = _docs(spark, [(50, _uniq(0)), (51, _uniq(99))])
    scores = {}
    for proto in ("append", "manifest"):
        lm = str(tmp_path / f"lm_{proto}")
        write_bigram_lm(docs, lm, protocol=proto)
        scores[proto] = {
            r.id: round(r.avg_logprob, 9)
            for r in score_against_lm(probe, lm).collect()
        }
        frames = load_lm_frames(spark, lm)  # pinned-read path too
        pinned = {
            r.id: round(r.avg_logprob, 9)
            for r in score_against_lm(probe, frames=frames).collect()
        }
        assert pinned == scores[proto]
        frames[0].unpersist(), frames[1].unpersist()
    assert scores["append"] == scores["manifest"]
    # the manifest LM commits layers+|V| atomically: one manifest, meta field
    man = MS._latest_manifest(spark, str(tmp_path / "lm_manifest"))
    assert set(man["layers"]) == {"bigrams", "prefix"} and man["meta"]["v"] > 0


@pytest.fixture()
def manifest_feed(spark, tmp_path):
    """Manifest-protocol index + gram layer + 4-batch feed: the three
    batches the markers-protocol suite uses (exact clone of snapshot /
    within-batch pair + near-clone / clone of an earlier survivor +
    fresh) plus a batch that dies COMPLETELY (watermark-only commit)."""
    idx = str(tmp_path / "idx")
    di.write_dedup_index(
        _snap(spark), idx, n_hashes=64, bands=16, protocol="manifest"
    )
    di.write_gram_layer(_snap(spark), idx, n=3)
    near = _uniq(1).replace("word3", "edited3", 1)
    batches = [
        [(100, _uniq(0)), (101, _uniq(50))],
        [(200, _uniq(60)), (201, _uniq(60)), (202, near)],
        [(300, _uniq(50)), (301, _uniq(70))],
        [(400, _uniq(0))],  # dies entirely: empty batch, watermark only
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate(batches):
        p = feed / f"b{i}.jsonl"
        with open(p, "w") as f:
            for doc_id, text_ in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text_}) + "\n")
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))  # pin batch order
    return idx, str(feed)


def _run_stream(spark, idx, feed, out, ckpt, **kw):
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(feed)
    q = stream_dedup_ingest(
        stream, idx, out, ckpt, store_protocol="manifest",
        trigger_available_now=True, **kw,
    )
    q.awaitTermination()


def test_stream_manifest_end_to_end_and_restart(spark, tmp_path, manifest_feed):
    idx, feed = manifest_feed
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_stream(spark, idx, feed, out, ckpt, annotate_novelty=True)
    got = {r.doc_id for r in read_ingested(spark, out).collect()}
    assert got == {101, 200, 301}
    # layer rows EXACT (3 snap + 3 survivors): the atomic commit can
    # never duplicate — the append protocol only promises "absorbed"
    counts = _layer_counts(spark, idx)
    assert counts["exact"] == 6 and counts["sigs"] == 6 and counts["bands"] == 96
    # the all-die batch advanced the watermark with a metadata-only commit
    assert MS.manifest_last_batch(spark, idx, ckpt) == 3
    # novelty annotation landed and the gram layer folded back in the
    # SAME commits: a survivor's clone scores novelty 0
    assert "novelty" in read_ingested(spark, out).columns
    nov = di.novelty_against_index(_docs(spark, [(901, _uniq(70))]), idx)
    assert nov.collect()[0]["novelty"] == 0.0
    # restart on the same checkpoint: every batch watermark-skipped
    _run_stream(spark, idx, feed, out, ckpt, annotate_novelty=True)
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {101, 200, 301}
    assert _layer_counts(spark, idx) == counts


def test_stream_manifest_requires_manifest_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    di.write_dedup_index(_snap(spark), idx, n_hashes=32, bands=8)  # append proto
    (tmp_path / "feed").mkdir()
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(tmp_path / "feed")
    )
    with pytest.raises(ValueError, match="manifest-protocol"):
        stream_dedup_ingest(
            stream, idx, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            store_protocol="manifest",
        )


def test_stream_manifest_crash_between_corpus_and_foldback(
    spark, tmp_path, manifest_feed, monkeypatch
):
    """THE crash window the protocol must close: batch 0's corpus commit
    lands, the fold-back (and with it the watermark) does not. The
    restart must replay batch 0 against the UNCHANGED index snapshot,
    land identical survivors (replacing the orphaned corpus pointer,
    not duplicating rows), and converge to the clean run's exact
    state."""
    idx, feed = manifest_feed
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    real = di.append_curation_layers
    calls = {"n": 0}

    def crash_once(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise IOError("injected crash after corpus commit, before fold-back")
        return real(*a, **kw)

    monkeypatch.setattr(di, "append_curation_layers", crash_once)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        _run_stream(spark, idx, feed, out, ckpt)
    # the batch is NOT recorded: corpus pointer exists, watermark doesn't
    assert MS.manifest_last_batch(spark, idx, ckpt) is None
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {101}
    # restart replays batch 0 (identical recompute) and drains the rest
    _run_stream(spark, idx, feed, out, ckpt)
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {101, 200, 301}
    counts = _layer_counts(spark, idx)
    assert counts["exact"] == 6 and counts["sigs"] == 6 and counts["bands"] == 96
    assert MS.manifest_last_batch(spark, idx, ckpt) == 3
    # the batch-0 replay REPLACED the corpus pointer; exactly one live
    # directory per landed batch, the orphan is vacuum-reclaimable
    man = MS._latest_manifest(spark, out)
    assert sorted(man["parts"]) == ["0", "1", "2"]
    MS.vacuum_manifest_store(spark, out, keep_manifests=1)
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {101, 200, 301}


def test_vacuum_grace_ignores_torn_manifest(spark, tmp_path):
    """A torn (unparseable) newest manifest must not consume a
    keep_manifests grace slot: with keep=2 and a torn newest, the two
    newest PARSEABLE versions both stay readable."""
    idx = str(tmp_path / "idx")
    di.write_dedup_index(_snap(spark), idx, n_hashes=32, bands=8, protocol="manifest")
    di.append_curation_layers(_docs(spark, [(7, _uniq(7))]), idx)      # v2
    di.append_curation_layers(_docs(spark, [(8, _uniq(8))]), idx)      # v3
    # torn publish leftover as the newest name
    with open(os.path.join(idx, "_manifests", "m-000000000004.json"), "w") as f:
        f.write('{"n": 4, "layers": {"exa')  # truncated mid-write
    MS.vacuum_manifest_store(spark, idx, keep_manifests=2)
    # v2 AND v3 remain time-travel-readable (torn v4 took no slot)
    assert MS.read_manifest_layer(spark, idx, "exact", version=3).count() == 5
    assert MS.read_manifest_layer(spark, idx, "exact", version=2).count() == 4
    with pytest.raises(FileNotFoundError):
        MS.read_manifest_layer(spark, idx, "exact", version=1)


def test_compact_manifest_layers_resets_dir_lists(spark, tmp_path):
    """Appends grow each layer's directory list (and so its scan's
    file-listing bill); compaction rewrites every layer into one
    directory with rows preserved, and vacuum then reclaims the
    superseded directories without changing answers."""
    idx = str(tmp_path / "idx")
    di.write_dedup_index(_snap(spark), idx, n_hashes=32, bands=8, protocol="manifest")
    for i in range(3):
        di.append_curation_layers(_docs(spark, [(10 + i, _uniq(10 + i))]), idx)
    man = MS._latest_manifest(spark, idx)
    assert len(man["layers"]["exact"]) == 4  # build + 3 appends
    MS.compact_manifest_layers(spark, idx)
    man2 = MS._latest_manifest(spark, idx)
    assert all(len(dirs) == 1 for dirs in man2["layers"].values())
    assert man2["meta"]["n_hashes"] == 32  # pinned meta carried through
    assert MS.read_manifest_layer(spark, idx, "exact").count() == 6
    removed = MS.vacuum_manifest_store(spark, idx, keep_manifests=1)
    assert removed >= 4
    assert di.dedup_against_index(_docs(spark, [(99, _uniq(11))]), idx).count() == 0


def test_stream_dedup_ingest_lease_wiring(spark, tmp_path, manifest_feed):
    """lease=True on the text curation loop: refused while another
    writer holds the index's lease; a leased run produces the same
    curated corpus and releases on termination; lease=True without the
    manifest protocol is refused up front (the lease lives in the
    manifest store)."""
    import time

    from traceframe_spark.streaming import manifest_store as MS

    idx, feed = manifest_feed
    out, ckpt = str(tmp_path / "outL"), str(tmp_path / "ckptL")
    held = MS.acquire_writer_lease(spark, idx, owner="other-writer")
    with pytest.raises(IOError, match="held by 'other-writer'"):
        _run_stream(spark, idx, feed, out, ckpt, lease=True)
    MS.release_writer_lease(spark, idx, held)
    _run_stream(spark, idx, feed, out, ckpt, lease=True)
    assert {r.doc_id for r in read_ingested(spark, out).collect()} == {101, 200, 301}
    for _ in range(60):
        if not os.path.exists(f"{idx}/_lease.json"):
            break
        time.sleep(0.5)
    assert not os.path.exists(f"{idx}/_lease.json")
    # markers protocol has no manifest store to hold the lease
    idx2 = str(tmp_path / "idx_markers")
    di.write_dedup_index(_snap(spark), idx2, n_hashes=32, bands=8)
    stream = spark.readStream.schema("doc_id long, text string").json(feed)
    with pytest.raises(ValueError, match="store_protocol='manifest'"):
        stream_dedup_ingest(
            stream, idx2, str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
            lease=True,
        )


@pytest.mark.volume
def test_compaction_cadence_bounds_dedup_stream_layers(spark, tmp_path, manifest_feed):
    """compact_every=N on the text curation loop: every fold-back
    appends one directory per index layer, so the 4-batch feed leaves
    4+ live dirs per layer uncompacted; with the cadence the lists stay
    <= N while the curated corpus, the layer ROWS, and a post-stream
    probe are identical to the uncompacted run."""
    from traceframe_spark.streaming import manifest_store as MS

    idx, feed = manifest_feed
    out, ckpt = str(tmp_path / "outC"), str(tmp_path / "ckptC")
    _run_stream(spark, idx, feed, out, ckpt, annotate_novelty=True)
    man_ctrl = MS._latest_manifest(spark, idx)
    ctrl_max = max(len(d) for d in man_ctrl["layers"].values())
    assert ctrl_max >= 4  # snapshot + one append per surviving batch
    ctrl_counts = _layer_counts(spark, idx)

    # fresh index + same feed, cadence on
    idx2 = str(tmp_path / "idxC")
    di.write_dedup_index(
        _snap(spark), idx2, n_hashes=64, bands=16, protocol="manifest"
    )
    di.write_gram_layer(_snap(spark), idx2, n=3)
    out2, ckpt2 = str(tmp_path / "outC2"), str(tmp_path / "ckptC2")
    _run_stream(
        spark, idx2, feed, out2, ckpt2, annotate_novelty=True,
        compact_every=2, vacuum_keep=2,
    )
    man_cad = MS._latest_manifest(spark, idx2)
    assert max(len(d) for d in man_cad["layers"].values()) <= 2
    assert _layer_counts(spark, idx2) == ctrl_counts
    assert {r.doc_id for r in read_ingested(spark, out2).collect()} == {
        r.doc_id for r in read_ingested(spark, out).collect()
    }
    # the compacted index still probes identically: a clone of an
    # accepted survivor dies, a fresh doc passes
    probe = _docs(spark, [(900, _uniq(50)), (901, _uniq(99))])
    alive = {r.doc_id for r in di.dedup_against_index(probe, idx2).collect()}
    assert alive == {901}
    # knob without the manifest protocol is refused
    idx3 = str(tmp_path / "idx_markers2")
    di.write_dedup_index(_snap(spark), idx3, n_hashes=32, bands=8)
    stream = spark.readStream.schema("doc_id long, text string").json(feed)
    with pytest.raises(ValueError, match="compact_every"):
        stream_dedup_ingest(
            stream, idx3, str(tmp_path / "outC3"), str(tmp_path / "ckptC3"),
            compact_every=2,
        )
