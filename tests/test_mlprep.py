"""Unit pins for the ML-data-prep operators (`operators/vectorprep.py`,
`plans/mlprep.py`): crafted-vector value checks the oracle gate can't
express (hand-computable expected outputs), plus positive plan-shape
pins for the scale claims in the docstrings."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from traceframe_spark.operators import vectorprep  # noqa: E402

SF = "/root/testdata/sf0.001"


def _vec_df(spark, rows, dim=None):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, (v) in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_quantize_int8_hand_values(spark):
    # v0: maxabs=2.0 -> scale=63.5; codes floor(x*63.5+0.5)
    #   [2.0, -1.0, 0.5] -> [127, floor(-63.0)= -63, floor(32.25)=32]
    # v1: all zeros -> scale 0, all codes 0
    df = _vec_df(spark, [[2.0, -1.0, 0.5], [0.0, 0.0, 0.0]])
    out = {
        r["vec_id"]: r
        for r in vectorprep.quantization_stats(df, "vec_id", "embedding").collect()
    }
    assert out[0]["q_sum"] == 127 - 63 + 32
    assert out[0]["q_abs_sum"] == 127 + 63 + 32
    assert out[0]["n_sat"] == 1
    assert out[0]["scale_q"] == int(63.5 * 1e6 + 0.5)
    assert out[1]["q_sum"] == 0 and out[1]["q_abs_sum"] == 0 and out[1]["n_sat"] == 0
    assert out[1]["scale_q"] == 0


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized values are within half a step of the original —
    the defining property of round-half-up symmetric quantization."""
    import random

    rng = random.Random(7)
    vals = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(20)]
    df = _vec_df(spark, vals)
    deq = df.select(
        "vec_id",
        F.col("embedding").alias("orig"),
        vectorprep.quantize_int8(
            F.col("embedding"), vectorprep.int8_scale(F.col("embedding"))
        ).alias("q"),
    ).collect()
    for r in deq:
        maxabs = max(abs(x) for x in r["orig"])
        scale = 127.0 / maxabs
        for x, q in zip(r["orig"], r["q"]):
            assert abs(q / scale - x) <= (0.5 / scale) + 1e-9


def test_sign_words_and_hamming(spark):
    # 64-dim vectors differing in exactly 3 sign positions -> hamming 3
    base = [1.0] * 64
    flipped = list(base)
    for i in (0, 33, 63):  # one in the low word, two in the high word
        flipped[i] = -1.0
    df = _vec_df(spark, [base, flipped])
    out = vectorprep.hamming_topk(df, df, "vec_id", "embedding", k=2).collect()
    by_pair = {(r["qid"], r["cid"]): r["hamming"] for r in out}
    assert by_pair[(0, 0)] == 0 and by_pair[(1, 1)] == 0
    assert by_pair[(0, 1)] == 3 and by_pair[(1, 0)] == 3


def test_assign_centroids_picks_nearest_with_tiebreak(spark):
    # centroids along axes; v=[1,1,0...] ties between c0 and c1 -> lowest id
    dim = 4
    c0 = [1.0, 0.0, 0.0, 0.0]
    c1 = [0.0, 1.0, 0.0, 0.0]
    cents = spark.createDataFrame(
        [(0, c0), (1, c1)], "centroid_id long, embedding array<float>"
    )
    vecs = _vec_df(spark, [[1.0, 1.0, 0.0, 0.0], [0.1, 0.9, 0.0, 0.0]], dim)
    out = {
        r["vec_id"]: r["centroid_id"]
        for r in vectorprep.assign_centroids(
            vecs, cents, "vec_id", "embedding"
        ).collect()
    }
    assert out[0] == 0  # exact cosine tie -> lowest centroid id
    assert out[1] == 1


def test_label_outliers_flags_the_odd_one(spark):
    # 4 aligned vectors + 1 anti-aligned under one label: the outlier
    # must rank first (lowest cosine to the label centroid)
    rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [(9, [-1.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = vectorprep.label_outlier_scores(
        df, "vec_id", "embedding", "label", dim=2, bottom_k=1
    ).collect()
    assert len(out) == 1 and out[0]["vec_id"] == 9 and out[0]["rn"] == 1
    # centroid = [0.6, 0]; cos(outlier, centroid) = -1
    assert out[0]["cos_q"] == -10000


def test_inflight_concurrency_hand_case(spark, tmp_path):
    """Three overlapping intervals for one supplier peak at 3; verified
    against the registered plan by writing a minimal lineitem table."""
    import datetime as dt

    rows = [
        # suppkey 1: qty%7+1 = 3 days each, staggered by 1 day -> peak 3
        (1, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2020, 1, 1)),
        (2, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2020, 1, 2)),
        (3, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2020, 1, 3)),
        # suppkey 2: disjoint 1-day intervals -> peak 1
        (4, 1, 2, 1, 0.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2020, 1, 1)),
        (5, 1, 2, 1, 0.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2020, 2, 1)),
    ]
    cols = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    spark.createDataFrame(rows, cols).write.parquet(f"{tmp_path}/lineitem.parquet")
    from traceframe_spark.plans.mlprep import q_inflight_concurrency

    out = {r["suppkey"]: r["peak"] for r in q_inflight_concurrency(spark, str(tmp_path)).collect()}
    assert out == {1: 3, 2: 1}


def test_mlprep_plan_shapes(spark):
    """Positive plan pins for the scale claims: quantization is a
    zero-exchange scan; hamming ranks via one broadcast join + one
    shuffle (the per-query window); the concurrency sweep's final
    per-supplier max reuses the window's partitioning (2 exchanges)."""
    from tools.plan_audit import n_shuffles, plan_of

    import __spark_entry__ as entry

    qs = entry.queries()

    plan = plan_of(qs["embed_quantize"](spark, SF))
    assert "Exchange" not in plan

    plan = plan_of(qs["ann_hamming_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # broadcast cross join, query side
    assert n_shuffles(plan) == 1  # the qid window only

    plan = plan_of(qs["inflight_concurrency"](spark, SF))
    assert n_shuffles(plan) == 2  # (suppkey, day) agg + suppkey window; max reuses


def test_cosine_topk_blas_matches_expression_form(spark):
    """The BLAS kernel must reproduce cosine_topk byte-for-byte: same
    quantized scores, same neighbor sets, same tie-breaks — on the real
    sf0.001 embeddings table, not crafted vectors."""
    from traceframe_spark.operators.similarity import cosine_topk, cosine_topk_blas

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    want = sorted(
        (r["qid"], r["cid"], int(r["cos"]), r["rn"])
        for r in cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    )
    got = sorted(
        (r["qid"], r["cid"], int(r["cos"]), r["rn"])
        for r in cosine_topk_blas(e, q, "vec_id", "embedding", k=5).collect()
    )
    assert got == want and len(got) == 50


def test_cosine_topk_blas_partial_topk_bounds_window_input(spark):
    """Scale pin: with many partitions, the kernel's map-side combine
    emits at most k rows per query per batch — verified by running on a
    deliberately over-partitioned corpus and checking the exact top-k
    still comes out (the union-of-local-top-k property)."""
    from traceframe_spark.operators.similarity import cosine_topk, cosine_topk_blas

    e = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(16)
    q = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 3)
    want = sorted(
        (r["qid"], r["cid"], r["rn"])
        for r in cosine_topk(e, q, "vec_id", "embedding", k=7).collect()
    )
    got = sorted(
        (r["qid"], r["cid"], r["rn"])
        for r in cosine_topk_blas(e, q, "vec_id", "embedding", k=7).collect()
    )
    assert got == want


def test_cosine_topk_blas_empty_queries(spark):
    from traceframe_spark.operators.similarity import cosine_topk_blas

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cosine_topk_blas(
        e, e.filter(F.col("vec_id") < 0), "vec_id", "embedding", k=5
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["qid", "cid", "cos", "rn"]


def test_semdedup_pairs_hand_values(spark):
    """Crafted clusters: two centroids at right angles; members near
    each centroid; one near-identical pair per cluster. Hand-checkable
    assignment, triangle convention, and threshold behavior."""
    from traceframe_spark.operators.similarity import semdedup_pairs

    rows = [
        # centroid 0 direction ~ x-axis, centroid 1 ~ y-axis
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.9, 0.1, 0.0]),   # cluster 0
        (11, [0.9, 0.1001, 0.0]),  # ~identical to 10 -> dup pair
        (20, [0.1, 0.9, 0.0]),   # cluster 1
        (21, [-0.05, 0.8, 0.0]),  # cluster 1, far from 20 in angle? cos high actually
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cent = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    got = {
        (r["centroid_id"], r["id_a"], r["id_b"]): r["cos_q"]
        for r in semdedup_pairs(
            df, cent, "vec_id", "embedding", min_cos_q=9990
        ).collect()
    }
    # only the near-identical pair clears 0.999; centroids themselves
    # join their own cluster and pair at cos 1.0 with... no partner that close
    assert (0, 10, 11) in got
    assert got[(0, 10, 11)] >= 9990
    assert all(k == (0, 10, 11) for k in got)


def test_knn_predict_majority_and_tiebreak(spark):
    """Planted neighborhoods: majority label wins; an exact vote tie
    elects the SMALLEST label; best_cos is the winning label's best
    neighbor cosine."""
    from traceframe_spark.operators.similarity import knn_predict

    rows = [
        # five vectors near the x-axis: labels 7,7,7,2,2
        (1, [1.0, 0.00, 0.0], 7),
        (2, [1.0, 0.01, 0.0], 7),
        (3, [1.0, 0.02, 0.0], 7),
        (4, [1.0, 0.03, 0.0], 2),
        (5, [1.0, 0.04, 0.0], 2),
        # four vectors near the y-axis: labels 9,9,4,4 (tie at k=4)
        (6, [0.0, 1.0, 0.00], 9),
        (7, [0.0, 1.0, 0.01], 9),
        (8, [0.0, 1.0, 0.02], 4),
        (9, [0.0, 1.0, 0.03], 4),
        # the probes themselves (far labels, excluded by qid != cid)
        (100, [1.0, 0.015, 0.0], 0),
        (101, [0.0, 1.0, 0.015], 0),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    q = df.filter(F.col("vec_id") >= 100)
    got = {
        r["qid"]: (r["pred_label"], r["votes"])
        for r in knn_predict(df, q, "vec_id", "embedding", "label", k=4).collect()
    }
    # probe 100's top-4 by cosine: among rows 1-5 (and probe 101 far
    # away) -> 3x label 7 beats 2x label 2 regardless of which four win
    assert got[100][0] == 7
    # probe 101's top-4 = rows 6-9 exactly: 2x9 vs 2x4 -> smallest label
    assert got[101] == (4, 2)


def test_semdedup_keep_election_rules(spark):
    """semdedup_keep on a hand-built duplicate chain: A~B~C transitively
    grouped even though A,C never pair directly; keep='far' elects the
    member with the LOWEST centroid cosine (the SemDeDup rule),
    keep='near' the highest; singletons and the untouched cluster pass
    through; bad keep is refused."""
    import pytest

    from traceframe_spark.operators.similarity import semdedup_keep

    rows = [
        (0, [1.0, 0.0, 0.0]),      # centroid 0
        (1, [0.0, 1.0, 0.0]),      # centroid 1
        # chain in cluster 0: 10~11 and 11~12 clear 0.999, 10~12 does not
        (10, [1.0, 0.000, 0.0]),
        (11, [1.0, 0.045, 0.0]),
        (12, [1.0, 0.090, 0.0]),
        (20, [0.1, 0.9, 0.0]),     # cluster-1 singleton
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cent = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )

    def kept_ids(keep):
        return sorted(
            r["vec_id"]
            for r in semdedup_keep(
                df, cent, "vec_id", "embedding", min_cos_q=9990, keep=keep
            ).collect()
        )

    # corpus row 0 IS centroid 0's vector, so it pairs with 10 at cos
    # 1.0 and the chain is {0,10,11,12}; id 12 sits farthest from the
    # centroid (largest angle) -> keep='far' retains it alone, dropping
    # 0/10/11 despite 0 being the min id
    assert kept_ids("far") == [1, 12, 20]
    # keep='near': 0 and 10 tie at cos 1.0 -> lowest id (0) retained
    assert kept_ids("near") == [0, 1, 20]
    with pytest.raises(ValueError, match="keep"):
        semdedup_keep(df, cent, "vec_id", "embedding", keep="median")
    # kept rows carry their assigned centroid
    lab = {
        r["vec_id"]: r["centroid_id"]
        for r in semdedup_keep(
            df, cent, "vec_id", "embedding", min_cos_q=9990
        ).collect()
    }
    assert lab[20] == 1 and lab[12] == 0


def test_semdedup_blocked_stripes_match_unblocked(spark):
    """The block-striped Gram sweep must be invisible: block=2 (many
    stripes per cluster) and block=10^6 (one stripe) emit identical
    pair sets on the real sf0.001 embeddings."""
    from traceframe_spark.operators.similarity import semdedup_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    def run(block):
        return sorted(
            (r["centroid_id"], r["id_a"], r["id_b"], r["cos_q"])
            for r in semdedup_pairs(
                e, cent, "vec_id", "embedding", min_cos_q=3000, block=block
            ).collect()
        )
    small, big = run(2), run(1_000_000)
    assert small == big and len(big) > 0
    assert all(a < b for _, a, b, _ in big)


def test_kmeans_fit_hand_lloyd_step(spark):
    """One Lloyd step on a hand-checkable configuration: two init
    centroids on the axes, members hugging a diagonal near each; after
    the mean update, each trained centroid moves to its members' mean
    and the re-assignment keeps the clusters (quantized cosine mass
    must strictly improve vs the init assignment)."""
    from traceframe_spark.operators import vectorprep

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.9, 0.3, 0.0]),
        (11, [0.8, 0.2, 0.0]),
        (20, [0.3, 0.9, 0.0]),
        (21, [0.2, 0.8, 0.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    init = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned, cents = vectorprep.kmeans_fit(
        df, init, "vec_id", "embedding", dim=3, n_iter=1
    )
    got = {r["vec_id"]: r for r in assigned.collect()}
    assert {i for i, r in got.items() if r["centroid_id"] == 0} == {0, 10, 11}
    assert {i for i, r in got.items() if r["centroid_id"] == 1} == {1, 20, 21}
    cent0 = dict(cents)[0]
    # mean of [1,.9,.8], [0,.3,.2], zeros — on the 1e-6 grid
    assert abs(cent0[0] - 0.9) < 1e-6 and abs(cent0[1] - 1 / 6) < 1e-6
    # trained centroids sit closer to their members than the init axes
    init_assigned = vectorprep.assign_centroids(
        df, init, "vec_id", "embedding", quantize=4
    )
    before = sum(r["cos_q"] for r in init_assigned.collect())
    after = sum(r["cos_q"] for r in got.values())
    assert after > before


def test_kmeans_fit_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts no members must survive the update
    unchanged (deterministic carry-over, not a crash or a drop)."""
    from traceframe_spark.operators import vectorprep

    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.001]),  # nothing will assign here
        (10, [1.0, 0.1]),
        (11, [1.0, -0.1]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    init = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    corpus = df.filter(F.col("vec_id") >= 10).union(
        df.filter(F.col("vec_id") == 0)
    )
    assigned, cents = vectorprep.kmeans_fit(
        corpus, init, "vec_id", "embedding", dim=2, n_iter=2
    )
    trained = dict(cents)
    import numpy as np

    # carried over bit-identical (as the float32->double cast of the init)
    assert trained[1] == [-1.0, float(np.float32(0.001))]
    assert all(r["centroid_id"] == 0 for r in assigned.collect())


def test_cluster_cap_sample_modes(spark):
    """cluster_cap_sample: per-cluster cap holds, 'far' keeps the
    lowest-cosine members, 'near' the highest, 'hash' is deterministic
    across calls; a cluster smaller than the cap contributes everything
    (downsampling only); bad args refused."""
    import pytest

    from traceframe_spark.operators.sampling import cluster_cap_sample

    dim = 8

    def v(axis, mag, wobble):
        out = [0.0] * dim
        out[axis] = mag
        out[(axis + 1) % dim] = wobble
        return out

    # cluster 0: 10 members of varying wobble; cluster 1: 3 members
    rows = [(i, v(0, 100.0, float(i))) for i in range(10)]
    rows += [(100 + i, v(1, 100.0, float(i))) for i in range(3)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, v(0, 1.0, 0.0)), (1, v(1, 1.0, 0.0))],
        "centroid_id long, embedding array<double>",
    )
    far = cluster_cap_sample(
        corpus, cents, "vec_id", "embedding", cap=4, keep="far"
    )
    got = {r["centroid_id"]: set() for r in far.collect()}
    for r in far.collect():
        got[r["centroid_id"]].add(r["vec_id"])
    # far = largest wobble = lowest cosine to the axis centroid
    assert got[0] == {6, 7, 8, 9}
    assert got[1] == {100, 101, 102}  # undersized cluster: everything
    near = cluster_cap_sample(
        corpus, cents, "vec_id", "embedding", cap=4, keep="near"
    )
    near0 = {r["vec_id"] for r in near.collect() if r["centroid_id"] == 0}
    assert near0 == {0, 1, 2, 3}
    h1 = sorted(r["vec_id"] for r in cluster_cap_sample(
        corpus, cents, "vec_id", "embedding", cap=4
    ).collect())
    h2 = sorted(r["vec_id"] for r in cluster_cap_sample(
        corpus, cents, "vec_id", "embedding", cap=4
    ).collect())
    assert h1 == h2 and len(h1) == 7  # 4 + 3, deterministic
    # original columns survive the join
    assert set(far.columns) >= {"vec_id", "embedding", "centroid_id", "cos_q"}
    with pytest.raises(ValueError, match="keep must be"):
        cluster_cap_sample(corpus, cents, "vec_id", "embedding", 4, keep="best")
    with pytest.raises(ValueError, match="cap must be"):
        cluster_cap_sample(corpus, cents, "vec_id", "embedding", 0)
