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
