"""Tests for the hashed n-gram Naive Bayes classifier
(operators/classifier.py): statistical learnability on a separable
constructed corpus (the driver testdata's labels are deliberately
uncorrelated with text, so learnability must be pinned on a fixture),
the unseen-bucket smoothing floor, store-protocol equality, the
no-token contract, and the model-size bound."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import classifier as C

B = 512


@pytest.fixture(scope="module")
def separable_docs(spark):
    """Two disjoint vocabularies -> perfectly separable classes. 40
    train + 10 held-out docs per class, deterministic construction."""
    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["zeta", "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(100):
        words = a_words if i % 2 == 0 else b_words
        label = "A" if i % 2 == 0 else "Bc"
        # vary length and order deterministically
        txt = " ".join(words[(i + j) % 5] for j in range(5 + i % 7))
        rows.append((i, label, txt))
    return spark.createDataFrame(rows, ["doc_id", "label", "text"])


def test_separable_corpus_is_learned_exactly(separable_docs):
    train = separable_docs.filter(F.col("doc_id") < 80)
    held = separable_docs.filter(F.col("doc_id") >= 80)
    w, cs = C.train_nb(train, "label", n_buckets=B)
    pred = C.nb_predict(held, w, cs, n_buckets=B)
    got = {r["id"]: r["pred_label"] for r in pred.collect()}
    truth = {r["doc_id"]: r["label"] for r in held.collect()}
    assert got == truth  # disjoint vocab -> zero errors
    # margins are strictly positive (argmax is unambiguous)
    assert all(r["margin"] > 0 for r in pred.collect())


def test_unseen_bucket_floor_and_prior(spark):
    """A held-out doc sharing NO feature with training exercises the
    left-join floor for every bucket: score must equal
    prior + sum(cnt * ln(1/(tot_c + B))) exactly."""
    train = spark.createDataFrame(
        [(0, "x", "red red blue"), (1, "y", "green green green yellow")],
        ["doc_id", "label", "text"],
    )
    w, cs = C.train_nb(train, "label", n_buckets=B)
    delta = spark.createDataFrame([(9, "purple orange")], ["doc_id", "text"])
    scored = {
        r["label"]: r["score"]
        for r in C.nb_scores(delta, w, cs, n_buckets=B).collect()
    }
    stats = {r["label"]: (r["n_docs"], r["tot_c"]) for r in cs.collect()}
    n_total = sum(n for n, _ in stats.values())
    # features: 2 unigrams + 1 bigram, all unseen -> 3 floor hits
    for lab, (n_docs, tot_c) in stats.items():
        expect = math.log(n_docs / n_total) + 3 * math.log(1.0 / (tot_c + B))
        assert scored[lab] == pytest.approx(expect, rel=1e-12)


def test_store_protocols_preserve_predictions(separable_docs, tmp_path):
    train = separable_docs.filter(F.col("doc_id") < 80)
    held = separable_docs.filter(F.col("doc_id") >= 80)
    w, cs = C.train_nb(train, "label", n_buckets=B)
    mem = sorted(
        (r["id"], r["pred_label"], round(r["score"], 9))
        for r in C.nb_predict(held, w, cs, n_buckets=B).collect()
    )
    for protocol in ("append", "manifest"):
        path = str(tmp_path / f"nb_{protocol}")
        C.write_nb_classifier(train, path, "label", n_buckets=B, protocol=protocol)
        got = sorted(
            (r["id"], r["pred_label"], round(r["score"], 9))
            for r in C.score_against_nb(held, path).collect()
        )
        assert got == mem, protocol


def test_load_nb_frames_pin_equals_path_read(separable_docs, tmp_path):
    train = separable_docs.filter(F.col("doc_id") < 80)
    held = separable_docs.filter(F.col("doc_id") >= 80)
    path = str(tmp_path / "nb_pin")
    C.write_nb_classifier(train, path, "label", n_buckets=B)
    frames = C.load_nb_frames(train.sparkSession, path)
    try:
        via_path = sorted(
            (r["id"], r["pred_label"])
            for r in C.score_against_nb(held, path).collect()
        )
        via_pin = sorted(
            (r["id"], r["pred_label"])
            for r in C.score_against_nb(held, frames=frames).collect()
        )
        assert via_path == via_pin
    finally:
        frames[0].unpersist()
        frames[1].unpersist()


def test_no_token_docs_emit_no_rows(spark):
    train = spark.createDataFrame(
        [(0, "x", "red blue"), (1, "y", "green yellow")],
        ["doc_id", "label", "text"],
    )
    w, cs = C.train_nb(train, "label", n_buckets=B)
    delta = spark.createDataFrame(
        [(7, "   "), (8, ""), (9, "red")], ["doc_id", "text"]
    )
    got = C.nb_predict(delta, w, cs, n_buckets=B).collect()
    assert {r["id"] for r in got} == {9}


def test_model_size_is_bounded_by_buckets_times_classes(separable_docs):
    w, cs = C.train_nb(separable_docs, "label", n_buckets=B)
    assert w.count() <= B * cs.count()
    # raw counts reconcile: per-class weight sums equal stored totals
    tot = {r["label"]: r["tot_c"] for r in cs.collect()}
    agg = {
        r["label"]: r["s"]
        for r in w.groupBy("label").agg(F.sum("c").alias("s")).collect()
    }
    assert agg == tot


def test_quality_filter_keep_matches_sigmoid_draw(spark):
    """keep must equal u < sigmoid(logodds) with the md5 draw,
    recomputed independently row by row."""
    import hashlib

    rows = [
        (i, "hi" if i % 3 == 0 else "lo",
         ("alpha beta gamma" if i % 3 == 0 else "zeta eta theta") + f" w{i % 5}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "qlabel", "text"])
    w, cs = C.train_nb(docs, "qlabel", n_buckets=B)
    out = C.quality_filter(docs, w, cs, n_buckets=B).collect()
    assert len(out) == 60
    for r in out:
        u = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16) / 2**32
        p = 1.0 / (1.0 + math.exp(-r["logodds"]))
        assert r["keep"] == (u < p), r
    # the separating signal exists -> hi docs keep more often than lo
    kept_hi = sum(1 for r in out if r["id"] % 3 == 0 and r["keep"])
    kept_lo = sum(1 for r in out if r["id"] % 3 != 0 and r["keep"])
    assert kept_hi / 20 > kept_lo / 40


def test_append_folds_counts_exactly(separable_docs, tmp_path):
    """train(a+b) and train(a)+append(b) must produce IDENTICAL stored
    state — the raw-counts design's whole point — on both protocols,
    including a class absent from the initial snapshot."""
    a = separable_docs.filter(F.col("doc_id") < 50)
    b = separable_docs.filter(F.col("doc_id") >= 50).withColumn(
        "label", F.when(F.col("doc_id") >= 90, "Cnew").otherwise(F.col("label"))
    )
    both = a.unionByName(b)
    for protocol in ("append", "manifest"):
        full = str(tmp_path / f"full_{protocol}")
        inc = str(tmp_path / f"inc_{protocol}")
        C.write_nb_classifier(both, full, "label", n_buckets=B, protocol=protocol)
        C.write_nb_classifier(a, inc, "label", n_buckets=B, protocol=protocol)
        C.append_nb_classifier(b, inc, "label")
        for store_a, store_b in ((full, inc),):
            wa, ca, ba = C._read_nb_store(a.sparkSession, store_a)
            wb, cb, bb = C._read_nb_store(a.sparkSession, store_b)
            assert ba == bb == B
            assert sorted(map(tuple, wa.collect())) == sorted(map(tuple, wb.collect()))
            assert sorted(map(tuple, ca.collect())) == sorted(map(tuple, cb.collect()))
        # and therefore identical predictions
        held = separable_docs.filter(F.col("doc_id") >= 80)
        pf = sorted((r["id"], r["pred_label"], round(r["score"], 9))
                    for r in C.score_against_nb(held, full).collect())
        pi = sorted((r["id"], r["pred_label"], round(r["score"], 9))
                    for r in C.score_against_nb(held, inc).collect())
        assert pf == pi, protocol


def test_featureless_class_keeps_its_stats_row(spark):
    """A class whose every document is empty/whitespace must keep its
    class_stats row (tot_c = 0; the smoothing floor handles scoring) —
    an inner prior-totals join silently dropped it, skewing n_total and
    making quality_filter emit NULL logodds/keep for every doc."""
    docs = spark.createDataFrame(
        [(0, "hi", "alpha beta gamma"), (1, "hi", "beta gamma delta"),
         (2, "lo", "   "), (3, "lo", "")],
        ["doc_id", "qlabel", "text"],
    )
    w, cs = C.train_nb(docs, "qlabel", n_buckets=B)
    stats = {r["label"]: (r["n_docs"], r["tot_c"]) for r in cs.collect()}
    assert stats["lo"] == (2, 0)  # present, zero feature mass
    assert stats["hi"][0] == 2
    out = C.quality_filter(docs, w, cs, n_buckets=B).collect()
    scored = [r for r in out if r["logodds"] is not None]
    # docs with tokens get real logodds and a boolean keep
    assert {r["id"] for r in scored} == {0, 1}
    assert all(isinstance(r["keep"], bool) for r in scored)
    # and the hi class (the only one with feature mass) wins them
    pred = C.nb_predict(docs.filter("doc_id < 2"), w, cs, n_buckets=B)
    assert {r["pred_label"] for r in pred.collect()} == {"hi"}
