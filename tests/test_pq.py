"""Product quantization + ADC (operators/similarity.py — Jégou et al.
TPAMI 2011): portable sampled codebooks, per-subspace assignment, and
asymmetric-distance top-k, value-pinned on hand-computable vectors;
the full-corpus chain is oracle-checked via the pq_codes /
pq_adc_topk registry entries."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import similarity as sim

DIM = 16  # m=8 subspaces of 2 dims


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codebook_sampling_is_md5_bottom_k(spark):
    rows = [(i, [float(i)] * DIM) for i in range(40)]
    cb = sim.pq_sample_codebooks(_vecs(spark, rows), "vec_id", "embedding")
    want_order = sorted(
        range(40), key=lambda i: hashlib.md5(f"pq|{i}".encode()).hexdigest()
    )[:16]
    assert [v[0] for v in cb] == [float(i) for i in want_order]
    with pytest.raises(ValueError, match="n_codes"):
        sim.pq_sample_codebooks(
            _vecs(spark, rows[:5]), "vec_id", "embedding"
        )


def test_encode_assigns_sampled_vectors_to_their_own_codeword(spark):
    """A vector that IS a codeword has subspace distance 0 to itself in
    every subspace, so it must encode to its own codeword index
    everywhere (ties broken by smallest index — distinct vectors here,
    so no ties)."""
    rows = [(i, [float(i * 7 + j) for j in range(DIM)]) for i in range(20)]
    df = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(df, "vec_id", "embedding")
    codes = {r["id"]: list(r["code"]) for r in
             sim.pq_encode(df, "vec_id", "embedding", cb).collect()}
    for c, vec in enumerate(cb):
        vid = int(vec[0] // 7)
        assert codes[vid] == [c] * 8, f"codeword {c} (vec {vid})"


def test_adc_matches_hand_computation(spark):
    """Tiny corpus where the ADC arithmetic is checkable by hand: the
    approximate distance must equal the exact squared L2 between the
    query and each vector's RECONSTRUCTION (its codewords), and the
    ranking must follow it."""
    rows = [(i, [float(i)] * DIM) for i in range(16)]  # 16 rows = the codebook
    df = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(df, "vec_id", "embedding")
    codes = sim.pq_encode(df, "vec_id", "embedding", cb)
    q = _vecs(spark, [(100, [2.5] * DIM)])
    top = sim.pq_adc_topk(codes, q, "vec_id", "embedding", cb, k=3).collect()
    # every vector reconstructs exactly (it is its own codeword), so
    # ad2 = 16 * (i - 2.5)^2; nearest are i=2 and i=3 (tie on distance
    # 0.25*16=4.0, cid ascending), then i=1/i=4 tie -> cid 1
    got = [(r["cid"], r["ad2"], r["rn"]) for r in top]
    assert got == [(2, 4.0, 1), (3, 4.0, 2), (1, 36.0, 3)]


def test_adc_recall_beats_random_on_real_embeddings(spark):
    """Sanity on the real table: ADC top-5 must overlap exact
    squared-L2 top-5 well above chance. The synthetic embeddings are
    near-iid uniform — PQ's adversarial case (no manifold structure
    for 16 sample codewords to exploit; measured recall ~0.06 vs
    chance 0.01) — so this pins a 3x-over-chance floor, not the high
    recall real embedding manifolds give; the VALUES of the chain are
    pinned exactly by the pq_codes/pq_adc_topk oracles regardless."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = sim.pq_sample_codebooks(e, "vec_id", "embedding")
    codes = sim.pq_encode(e, "vec_id", "embedding", cb)
    q = e.filter(F.col("vec_id") < 10)
    adc = sim.pq_adc_topk(codes, q, "vec_id", "embedding", cb, k=5)
    got = {}
    for r in adc.collect():
        got.setdefault(r["qid"], set()).add(r["cid"])
    # exact squared-L2 top-5 via the generic machinery
    c = e.selectExpr("vec_id AS cid", "embedding AS c_vec")
    qq = q.selectExpr("vec_id AS qid", "embedding AS q_vec")
    d2 = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda a, b: (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    from pyspark.sql.window import Window

    pairs = qq.crossJoin(c).filter(F.col("qid") != F.col("cid")).select(
        "qid", "cid", d2.alias("d2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("cid").asc())
    exact = {}
    for r in pairs.withColumn("rn", F.row_number().over(w)).filter("rn <= 5").collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    n = len(e.collect())
    recall = sum(len(got[q0] & exact[q0]) for q0 in exact) / (5.0 * len(exact))
    assert recall >= 3 * (5.0 / n), f"recall@5 {recall} (chance ~ {5.0 / n:.3f})"


def test_ivfpq_index_roundtrip_append_and_pruned_probe(spark, tmp_path):
    """IVF-PQ composition: codes + codebooks + centroids commit in one
    manifest; appends encode with the same frozen codebooks; a pruned
    probe's candidate read projects (cid, list_id, code) — the float
    vector column never reaches the scan; full probe equals the
    corpus-wide pq_adc_topk exactly."""
    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(60)]
    corpus = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    cents = sim.train_ivf_centroids(corpus, "vec_id", "embedding", n_centroids=4)
    path = str(tmp_path / "ivfpq")
    sim.write_ivf_index(
        corpus, path, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb,
    )
    q = _vecs(spark, [(200, [3.0] * DIM), (201, [55.0] * DIM)])
    # full probe == corpus-wide ADC (the oracle-pin equivalence)
    codes = sim.pq_encode(corpus, "vec_id", "embedding", cb)
    want = sorted(
        (r["qid"], r["cid"], r["rn"]) for r in
        sim.pq_adc_topk(codes, q, "vec_id", "embedding", cb, k=3).collect()
    )
    got = sorted(
        (r["qid"], r["cid"], r["rn"]) for r in
        sim.ivf_adc_topk_over_index(
            spark, path, q, "vec_id", "embedding", k=3, nprobe=4
        ).collect()
    )
    assert got == want
    # append: new rows carry codes from the SAME codebooks
    sim.append_to_ivf_index(
        _vecs(spark, [(300, [2.9] * DIM)]), path, "vec_id", "embedding"
    )
    from traceframe_spark.streaming.embeddings import read_indexed_vectors

    row300 = [r for r in read_indexed_vectors(spark, path).collect() if r["cid"] == 300]
    want_code = sim.pq_encode(
        _vecs(spark, [(300, [2.9] * DIM)]), "vec_id", "embedding", cb
    ).collect()[0]["code"]
    assert list(row300[0]["code"]) == list(want_code)
    # the appended near-duplicate of q=[3.0]*16 now tops its probe
    top = sim.ivf_adc_topk_over_index(
        spark, path, q.filter("vec_id = 200"), "vec_id", "embedding", k=1, nprobe=4
    ).collect()
    assert top[0]["cid"] == 300
    # pruned probe never reads the float vector column
    plan = sim.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=3, nprobe=1
    )._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "c_vec" in ln]
    assert not scans, f"candidate scan reads the vector column:\n{plan[:2000]}"
    # pq on a sidecar store is refused
    with pytest.raises(ValueError, match="manifest"):
        sim.write_ivf_index(
            corpus, str(tmp_path / "side"), "vec_id", "embedding",
            centroids=cents, pq_samples=cb,
        )
    # ADC probe on a PQ-less index is refused loudly
    plain = str(tmp_path / "plain")
    sim.write_ivf_index(
        corpus, plain, "vec_id", "embedding", centroids=cents, protocol="manifest"
    )
    with pytest.raises(ValueError, match="no PQ codebooks"):
        sim.ivf_adc_topk_over_index(spark, plain, q, "vec_id", "embedding")


def test_stream_ingest_into_ivfpq_matches_batch_build(spark, tmp_path):
    """Streaming fold into an IVF-PQ index: every streamed vector gets
    its code from the SAME frozen codebooks as the bootstrap build (the
    append path reads pq_samples out of the resolved manifest meta), so
    an ADC probe over the streamed index must EQUAL the probe over a
    one-shot batch build of the identical corpus — the compressed
    domain cannot tell how rows arrived."""
    import json

    from traceframe_spark.streaming.embeddings import stream_embed_ingest

    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    cents = sim.train_ivf_centroids(corpus, "vec_id", "embedding", n_centroids=4)
    streamed = str(tmp_path / "ivfpq_streamed")
    sim.write_ivf_index(
        corpus, streamed, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb,
    )
    new_rows = [(100 + i, [float((i * 31 + j * 3) % 90) for j in range(DIM)])
                for i in range(6)]
    feed = tmp_path / "pq_feed"
    feed.mkdir()
    for b in range(2):
        with open(feed / f"b{b}.jsonl", "w") as f:
            for vid, v in new_rows[b * 3:(b + 1) * 3]:
                f.write(json.dumps({"vec_id": vid, "embedding": v}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = stream_embed_ingest(
        stream, streamed, str(tmp_path / "pq_ckpt"), trigger_available_now=True
    )
    q.awaitTermination()
    batch = str(tmp_path / "ivfpq_batch")
    sim.write_ivf_index(
        corpus.unionByName(_vecs(spark, new_rows)), batch, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=cb,
    )
    queries = _vecs(spark, [(500, [2.0] * DIM), (501, [77.0] * DIM)])

    def probe(path):
        return sorted(
            (r["qid"], r["cid"], r["ad2"], r["rn"]) for r in
            sim.ivf_adc_topk_over_index(
                spark, path, queries, "vec_id", "embedding", k=4, nprobe=4
            ).collect()
        )

    got, want = probe(streamed), probe(batch)
    assert got == want
    assert any(cid >= 100 for _, cid, _, _ in got)  # streamed rows rank


def test_residual_ivfpq_build_probe_append_parity(spark, tmp_path):
    """Residual coding (Jégou et al. §IV): codebooks are sample
    residuals to their nearest centroid; the meta flag rides the
    manifest; an appended row encodes exactly as the same row built-in
    (probe results identical index-wide); an exact clone of a stored
    vector ranks first; pq_residual without pq_samples is refused."""
    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    cents = [rows[i][1] for i in range(4)]
    cb = sim.pq_residual_codebooks(corpus, "vec_id", "embedding", cents)
    # codebook = sample residual to its nearest centroid, sequential f64
    samples = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    for v, r in zip(samples, cb):
        d2s = [sum((x - y) ** 2 for x, y in zip(v, c)) for c in cents]
        near = cents[d2s.index(min(d2s))]
        assert r == [x - y for x, y in zip(v, near)]
    import pytest as _pt

    with _pt.raises(ValueError, match="pq_samples"):
        sim.write_ivf_index(
            corpus, str(tmp_path / "nope"), "vec_id", "embedding",
            centroids=cents, protocol="manifest", pq_residual=True,
        )
    built = str(tmp_path / "res_built")
    sim.write_ivf_index(
        corpus, built, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb, pq_residual=True,
    )
    q = _vecs(spark, [(500, rows[25][1]), (501, [3.0] * DIM)])

    def probe(path, k=3):
        return sorted(
            (r["qid"], r["cid"], r["ad2"], r["rn"]) for r in
            sim.ivf_adc_topk_over_index(
                spark, path, q, "vec_id", "embedding", k=k, nprobe=4
            ).collect()
        )

    full = probe(built, k=40)
    # q500 is an exact clone of stored row 25: its residual equals row
    # 25's, so row 25's ADC distance is its own quantization error —
    # minimal (other rows sharing the same code tie and the min id
    # wins the rank; 25 itself must score the same minimal ad2)
    q500 = [r for r in full if r[0] == 500]
    top_ad2 = next(r[2] for r in q500 if r[3] == 1)
    assert {r[2] for r in q500 if r[1] == 25} == {top_ad2}
    # append-vs-built parity: index over rows[:35] + appended rows[35:]
    # must probe identically to the all-at-once build
    grown = str(tmp_path / "res_grown")
    sim.write_ivf_index(
        _vecs(spark, rows[:35]), grown, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=cb, pq_residual=True,
    )
    sim.append_to_ivf_index(_vecs(spark, rows[35:]), grown, "vec_id", "embedding")
    assert probe(grown, k=40) == full


def test_adc_rerank_refinement_tier(spark, tmp_path):
    """rerank_k: the ADC shortlist re-scores with exact quantized
    cosine and returns ivf_topk_over_index's (qid, cid, cos, rn) shape;
    with a shortlist covering the corpus the result equals the exact
    cosine_topk baseline (refinement recovers exactness when the
    shortlist doesn't truncate); the empty-probe path returns the
    re-rank shape."""
    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    cents = sim.train_ivf_centroids(corpus, "vec_id", "embedding", n_centroids=4)
    path = str(tmp_path / "rr")
    sim.write_ivf_index(
        corpus, path, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb,
    )
    q = _vecs(spark, [(500, [2.0] * DIM), (501, [77.0] * DIM)])
    got = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.ivf_adc_topk_over_index(
            spark, path, q, "vec_id", "embedding", k=40, nprobe=4, rerank_k=3
        ).collect()
    )
    want = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.cosine_topk(corpus, q, "vec_id", "embedding", k=3).collect()
    )
    assert got == want and len(got) == 6
    # empty store -> empty frame in the re-rank shape
    empty = str(tmp_path / "rr_empty")
    sim.write_ivf_index(
        corpus.filter("vec_id < 0"), empty, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=cb,
    )
    out = sim.ivf_adc_topk_over_index(
        spark, empty, q, "vec_id", "embedding", k=5, rerank_k=3
    )
    assert out.columns == ["qid", "cid", "cos", "rn"] and out.count() == 0


def test_adc_rerank_k_must_fit_shortlist(spark, tmp_path):
    """rerank_k > k would silently cap the output at k rows per query
    (the shortlist is the universe the re-rank scores) — the r12
    advisory finding; now a loud ValueError before any plan builds."""
    import pytest

    rows = [(i, [float((i * 3 + j) % 50) for j in range(DIM)]) for i in range(20)]
    corpus = _vecs(spark, rows)
    cb = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    path = str(tmp_path / "rrv")
    sim.write_ivf_index(
        corpus, path, "vec_id", "embedding", n_centroids=4,
        protocol="manifest", pq_samples=cb,
    )
    q = _vecs(spark, [(500, [2.0] * DIM)])
    with pytest.raises(ValueError, match="rerank_k=7 > k=5"):
        sim.ivf_adc_topk_over_index(
            spark, path, q, "vec_id", "embedding", k=5, rerank_k=7
        )


def test_trained_codebooks_beat_sampled_on_clustered_data(spark):
    """pq_train_codebooks (per-subspace Lloyd — Jégou et al. §II): on a
    corpus of tight clusters the trained books' quantization error must
    be strictly below the sampled books' (the sampled 16 codewords are
    arbitrary corpus rows; Lloyd means converge to cluster structure).
    Measured as mean ADC distance of each vector to its own
    reconstruction via the agreement instrument's recall@1 AND raw
    quantization MSE driver-side."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.uniform(-50, 50, size=(10, DIM))
    rows = []
    for i in range(300):
        c = centers[i % 10]
        rows.append((i, [float(x) for x in c + rng.uniform(-1, 1, DIM)]))
    corpus = _vecs(spark, rows)
    sampled = sim.pq_sample_codebooks(corpus, "vec_id", "embedding")
    trained = sim.pq_train_codebooks(corpus, "vec_id", "embedding")
    x = np.array([v for _, v in rows], dtype=np.float64)

    def mse(cb):
        cbm = np.array(cb, dtype=np.float64)
        tot = 0.0
        d = DIM // 8
        for s in range(8):
            sub = x[:, s * d:(s + 1) * d]
            sc = cbm[:, s * d:(s + 1) * d]
            d2 = ((sub[:, None, :] - sc[None, :, :]) ** 2).sum(axis=2)
            tot += d2.min(axis=1).sum()
        return tot / len(x)

    assert mse(trained) < 0.5 * mse(sampled)
    # recall@1 of the ADC tier, via the registered instrument: trained
    # books must not be worse on the same query set
    q = corpus.filter(F.col("vec_id") < 20)
    rec_s = sim.ann_adc_agreement(
        corpus, q, "vec_id", "embedding", sampled
    ).agg(F.avg("agree")).first()[0]
    rec_t = sim.ann_adc_agreement(
        corpus, q, "vec_id", "embedding", trained
    ).agg(F.avg("agree")).first()[0]
    assert rec_t >= rec_s


def test_trained_codebooks_plug_into_every_pq_consumer(spark, tmp_path):
    """write_ivf_index(pq_samples=<int>) trains books and the whole
    chain — encode at build, streamed appends encoding against
    manifest meta, ADC probe, re-rank — runs unchanged: a grown index
    (build 30 + append 10) answers identically to a one-shot build of
    all 40 (the r12 streamed==batch parity pin, now on TRAINED books),
    and the re-rank with a non-truncating shortlist equals exact
    cosine_topk."""
    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    cents = sim.train_ivf_centroids(corpus, "vec_id", "embedding", n_centroids=4)
    q = _vecs(spark, [(500, [2.0] * DIM), (501, [77.0] * DIM)])

    full_path = str(tmp_path / "tr_full")
    sim.write_ivf_index(
        corpus, full_path, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=16,
    )
    grown_path = str(tmp_path / "tr_grown")
    sim.write_ivf_index(
        _vecs(spark, rows[:30]), grown_path, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=16,
    )
    # NOTE: training saw only the first 30 rows on the grown path — for
    # parity the append must encode against the FROZEN books in the
    # manifest, so rebuild full's books from the same 30-row corpus
    cb30 = sim.pq_train_codebooks(
        _vecs(spark, rows[:30]), "vec_id", "embedding"
    )
    full_path = str(tmp_path / "tr_full30")
    sim.write_ivf_index(
        corpus, full_path, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb30,
    )
    grown_path = str(tmp_path / "tr_grown30")
    sim.write_ivf_index(
        _vecs(spark, rows[:30]), grown_path, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=cb30,
    )
    sim.append_to_ivf_index(
        _vecs(spark, rows[30:]), grown_path, "vec_id", "embedding"
    )

    def probe(path):
        return sorted(
            (r["qid"], r["cid"], r["rn"]) for r in sim.ivf_adc_topk_over_index(
                spark, path, q, "vec_id", "embedding", k=5, nprobe=4
            ).collect()
        )

    assert probe(grown_path) == probe(full_path)
    # re-rank over trained books with a full shortlist == exact answer
    got = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.ivf_adc_topk_over_index(
            spark, full_path, q, "vec_id", "embedding",
            k=40, nprobe=4, rerank_k=3,
        ).collect()
    )
    want = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.cosine_topk(corpus, q, "vec_id", "embedding", k=3).collect()
    )
    assert got == want


def test_trained_residual_codebooks_roundtrip(spark, tmp_path):
    """pq_samples=<int> with pq_residual=True trains RESIDUAL-space
    books (centroid subtraction before Lloyd); full-probe ADC over the
    trained residual index ranks sanely (self-reconstruction nearest:
    querying an indexed vector's exact value returns it at rn=1 via
    re-rank)."""
    rows = [(i, [float((i * 11 + j * 3) % 60) for j in range(DIM)]) for i in range(30)]
    corpus = _vecs(spark, rows)
    path = str(tmp_path / "tr_res")
    sim.write_ivf_index(
        corpus, path, "vec_id", "embedding", n_centroids=4,
        protocol="manifest", pq_samples=16, pq_residual=True,
    )
    q = _vecs(spark, [(900, rows[7][1])])  # exact clone of vec 7
    got = sim.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=8, nprobe=4, rerank_k=1
    ).collect()
    assert got and got[0]["cid"] == 7 and got[0]["cos"] == 10000


def test_opq_rotation_orthogonal_and_balanced(spark):
    """opq_train_rotation: dim x dim, orthogonal (R Rᵀ = I within
    float tolerance), rows are permuted eigenvectors (unit norm), and
    the derivation is deterministic (same corpus -> same matrix)."""
    import numpy as np

    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    r1 = np.array(sim.opq_train_rotation(corpus, "vec_id", "embedding"))
    r2 = np.array(sim.opq_train_rotation(corpus, "vec_id", "embedding"))
    assert r1.shape == (DIM, DIM)
    assert np.allclose(r1 @ r1.T, np.eye(DIM), atol=1e-9)
    assert np.array_equal(r1, r2)
    # dim not divisible by m is refused
    with pytest.raises(ValueError, match="divisible"):
        sim.opq_train_rotation(corpus, "vec_id", "embedding", m=5)


def test_opq_rotation_improves_quantization_on_skewed_data(spark):
    """The OPQ point: when the data's principal directions cluster
    inside a few subspaces (here: all signal variance in dims 0-7,
    subspaces 4-7 pure noise), eigenvalue allocation spreads one
    strong direction per subspace — same code budget (16 codewords,
    m=8), quantization MSE in rotated space drops by an order of
    magnitude, and ADC recall@1 (the registered instrument, rotated
    LUT/codes vs raw exact cosine) does not get worse."""
    import numpy as np

    rng = np.random.default_rng(11)
    sig = np.array([32.0, 16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25])
    rows = []
    for i in range(200):
        v = np.concatenate([rng.normal(size=8) * sig, rng.normal(size=8) * 0.05])
        rows.append((i, [float(x) for x in v]))
    corpus = _vecs(spark, rows)
    q = corpus.filter(F.col("vec_id") < 20)
    rot = sim.opq_train_rotation(corpus, "vec_id", "embedding")
    plain = sim.pq_train_codebooks(corpus, "vec_id", "embedding")
    rotated = sim.pq_train_codebooks(
        corpus, "vec_id", "embedding", rotation=rot
    )
    x = np.array([v for _, v in rows], dtype=np.float64)
    rmat = np.array(rot, dtype=np.float64)

    def mse(xa, cb, m=8):
        cbm = np.array(cb, dtype=np.float64)
        d = xa.shape[1] // m
        tot = 0.0
        for s in range(m):
            sub = xa[:, s * d : (s + 1) * d]
            sc = cbm[:, s * d : (s + 1) * d]
            d2 = ((sub[:, None, :] - sc[None, :, :]) ** 2).sum(axis=2)
            tot += d2.min(axis=1).sum()
        return tot / len(xa)

    assert mse(x @ rmat.T, rotated) < 0.5 * mse(x, plain)
    rec_p = sim.ann_adc_agreement(
        corpus, q, "vec_id", "embedding", plain
    ).agg(F.avg("agree")).first()[0]
    rec_r = sim.ann_adc_agreement(
        corpus, q, "vec_id", "embedding", rotated, rotation=rot
    ).agg(F.avg("agree")).first()[0]
    assert rec_r >= rec_p


def test_opq_index_stream_batch_parity_and_guards(spark, tmp_path):
    """OPQ end to end on the persisted tier: the rotation commits in
    the manifest next to the codebooks; appends encode against the
    STORED matrix, so a grown index (30 built + 10 appended) answers
    identically to a one-shot build of all 40 under the same frozen
    quantizer — the streamed==batch pin on rotated indexes. Guards:
    opq_rotate=True with explicit codewords is refused; the re-rank
    tier over a rotated index still equals exact cosine (rotation
    never leaks into the exact head)."""
    rows = [(i, [float((i * 13 + j * 7) % 100) for j in range(DIM)]) for i in range(40)]
    corpus = _vecs(spark, rows)
    cents = sim.train_ivf_centroids(corpus, "vec_id", "embedding", n_centroids=4)
    grown = str(tmp_path / "opq_grown")
    sim.write_ivf_index(
        _vecs(spark, rows[:30]), grown, "vec_id", "embedding",
        centroids=cents, protocol="manifest", pq_samples=16, opq_rotate=True,
    )
    sim.append_to_ivf_index(
        _vecs(spark, rows[30:]), grown, "vec_id", "embedding"
    )
    # one-shot build of all 40 under the grown index's frozen quantizer
    _, man = sim._ivf_resolve(spark, grown)
    full = str(tmp_path / "opq_full")
    sim.write_ivf_index(
        corpus, full, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=man["meta"]["pq_samples"],
        opq_rotate=man["meta"]["opq_rotation"],
    )
    q = _vecs(spark, [(500, [2.0] * DIM), (501, [77.0] * DIM)])

    def probe(path):
        return sorted(
            (r["qid"], r["cid"], r["ad2"], r["rn"]) for r in
            sim.ivf_adc_topk_over_index(
                spark, path, q, "vec_id", "embedding", k=5, nprobe=4
            ).collect()
        )

    assert probe(grown) == probe(full)
    # the re-rank head is exact cosine, rotation-free
    got = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.ivf_adc_topk_over_index(
            spark, full, q, "vec_id", "embedding", k=40, nprobe=4, rerank_k=3
        ).collect()
    )
    want = sorted(
        (r["qid"], r["cid"], r["cos"], r["rn"]) for r in
        sim.cosine_topk(corpus, q, "vec_id", "embedding", k=3).collect()
    )
    assert got == want
    with pytest.raises(ValueError, match="opq_rotate"):
        sim.write_ivf_index(
            corpus, str(tmp_path / "opq_bad"), "vec_id", "embedding",
            centroids=cents, protocol="manifest",
            pq_samples=sim.pq_sample_codebooks(corpus, "vec_id", "embedding"),
            opq_rotate=True,
        )


def test_opq_residual_composition(spark, tmp_path):
    """OPQ over RESIDUAL coding (the full IVFADC+OPQ stack): rotation
    trains on residual space, books on rotated residuals, probe LUTs
    on rotated (q - c(list)); an exact clone of a stored vector still
    returns at rn=1 through the re-rank head."""
    rows = [(i, [float((i * 11 + j * 3) % 60) for j in range(DIM)]) for i in range(30)]
    corpus = _vecs(spark, rows)
    path = str(tmp_path / "opq_res")
    sim.write_ivf_index(
        corpus, path, "vec_id", "embedding", n_centroids=4,
        protocol="manifest", pq_samples=16, pq_residual=True, opq_rotate=True,
    )
    q = _vecs(spark, [(900, rows[7][1])])
    got = sim.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=8, nprobe=4, rerank_k=1
    ).collect()
    assert got and got[0]["cid"] == 7 and got[0]["cos"] == 10000
