"""Embedding *preparation* operators for training-data pipelines:
int8 scalar quantization, sign-bit binarization with Hamming-distance
top-k, deterministic nearest-centroid assignment, and within-label
outlier scoring.

These complement `operators/similarity` (which answers *retrieval*
questions): a 100 TB embedding corpus is rarely served as float32 —
it is quantized (4x smaller), binarized (32x smaller, Hamming-rankable
with two ALU ops per comparison), clustered, and cleaned of
label-inconsistent outliers before training. No reference analogue
(the reference has no vector ops, `/root/reference/traceframe/
traceframe.py` is trace-only); this extends the pipeline surface the
engine adds (BASELINE.json north_star).

Scale notes
-----------
- Every op here is a single corpus scan of pure JVM expressions —
  no Python, no explode, no shuffle before the terminal aggregation.
- :func:`hamming_topk` ranks on the *binarized* form: the per-pair cost
  is ``XOR + POPCNT`` on two longs instead of a 64-float dot product,
  and the scan reads 16 bytes/vector instead of 256. The query side
  broadcasts (bounded query sets), so corpus cost is one codegen pass.
- :func:`assign_centroids` broadcasts the centroid set (k rows) and
  keeps assignment as an array expression — the same shape the IVF
  router uses (`similarity.py`), exposed standalone for k-means-style
  partitioning of a corpus.
- :func:`label_centroids` computes per-dimension means as ``dim``
  stacked ``avg`` aggregates in ONE shuffle (no posexplode of the
  vector, which would multiply the shuffle volume by ``dim``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.operators.similarity import dot_f64, l2_norm


def _bq(name: str) -> str:
    """Backtick-quote a column name for interpolation into generated SQL
    (``F.expr``): a name with hyphens/spaces/keywords would otherwise
    fail to parse — or silently parse as arithmetic (``a-b``)."""
    return "`" + name.replace("`", "``") + "`"

INT8_MAX = 127.0


def int8_scale(vec: Column) -> Column:
    """Symmetric per-vector int8 scale: ``127 / max(|x|)`` (0.0 for an
    all-zero vector so quantization maps it to all zeros instead of
    dividing by zero)."""
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(maxabs == 0.0, F.lit(0.0)).otherwise(F.lit(INT8_MAX) / maxabs)


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Quantized int8 codes ``floor(x*scale + 0.5)`` (round-half-up on
    the binary double — the same grid `plans/catalog.qint` uses, so
    DuckDB reproduces every code bit-for-bit). With the symmetric scale
    the codes are exactly in [-127, 127]; no clamp is needed."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int")
    )


def quantization_stats(
    df: DataFrame, id_col: str, vec_col: str, scale_q: int = 6
) -> DataFrame:
    """Per-vector quantization summary with integer-only payload:
    (id, scale_q, q_sum, q_abs_sum, n_sat). ``q_sum``/``q_abs_sum`` pin
    every code's value and sign; ``n_sat`` counts saturated (|q|=127)
    codes — the metric that decides whether a corpus needs per-channel
    instead of per-vector scales. Zero-shuffle scan."""
    vec = F.col(vec_col)
    scale = int8_scale(vec)
    q = quantize_int8(vec, scale)
    zero = F.lit(0).cast("long")
    # ONE fold with a struct accumulator instead of three folds over the
    # same (re-derived) quantized array: the single-fold tree is ~3x
    # smaller, which matters because this cost is per-row expression
    # evaluation — measured 2.3s -> sub-second on the sf0.1 bench entry.
    stats = F.aggregate(
        q,
        F.struct(zero.alias("s"), zero.alias("a"), zero.alias("n")),
        lambda acc, x: F.struct(
            (acc["s"] + x.cast("long")).alias("s"),
            (acc["a"] + F.abs(x.cast("long"))).alias("a"),
            (
                acc["n"]
                + F.when(F.abs(x) == int(INT8_MAX), F.lit(1).cast("long")).otherwise(
                    zero
                )
            ).alias("n"),
        ),
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.floor(scale * (10**scale_q) + F.lit(0.5)).cast("long").alias("scale_q"),
        stats.alias("_st"),
    ).select(
        "vec_id",
        "scale_q",
        F.col("_st.s").alias("q_sum"),
        F.col("_st.a").alias("q_abs_sum"),
        F.col("_st.n").alias("n_sat"),
    )


def sign_word(vec: Column, lo_bit: int, n_bits: int = 32) -> Column:
    """Pack sign bits ``vec[lo_bit .. lo_bit+n_bits)`` (``x >= 0`` → 1)
    into a long. Two 32-bit words cover dim=64 without touching the
    sign bit of a 64-bit long (DuckDB's ``2**63`` overflows BIGINT, so
    the two-word split keeps the oracle exactly expressible).

    Implementation renders the slice as a base-2 digit string and lets
    ``conv`` parse it: element ``lo_bit`` is the LEAST significant bit
    (value ``2^(i-lo_bit)``), so the digit string is built reversed.
    A 3-node tree versus 32 chained when/OR nodes — the per-row
    evaluation cost of the chain dominated the whole hamming bench
    entry at small data sizes."""
    digits = F.transform(
        F.slice(vec, lo_bit + 1, n_bits),
        lambda x: F.when(x.cast("double") >= 0.0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.conv(F.concat_ws("", F.reverse(digits)), 2, 10).cast("long")


def binarize(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    """(id, w_lo, w_hi): 64-dim vector → two 32-bit sign words."""
    vec = F.col(vec_col)
    return df.select(
        F.col(id_col).alias(out_id),
        sign_word(vec, 0).alias("w_lo"),
        sign_word(vec, 32).alias("w_hi"),
    )


def hamming_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Top-k nearest corpus vectors per query under Hamming distance of
    the sign-bit binarization. Output (qid, cid, hamming, rn); the query
    itself ranks first at distance 0 when present in the corpus —
    deterministic, so it stays (self-hits are trivially filterable).

    Ranking on the binary sketch is the classic cheap tier above exact
    cosine: ``XOR + POPCNT`` per pair. Ties break on ``cid``."""
    c = binarize(corpus, id_col, vec_col, "cid")
    q = binarize(queries, id_col, vec_col, "qid").withColumnsRenamed(
        {"w_lo": "q_lo", "w_hi": "q_hi"}
    )
    ham = (
        F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("long")
    pairs = c.crossJoin(F.broadcast(q)).select("qid", "cid", ham.alias("hamming"))
    w = Window.partitionBy("qid").orderBy(F.col("hamming").asc(), F.col("cid").asc())
    return pairs.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def assign_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_id_col: str = "centroid_id",
    quantize: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine similarity
    (quantized at 10^-q, ties → lowest centroid id — both rules make the
    argmax identical across engines). ``centroids`` must be small (it
    broadcasts: k rows). Output (id, centroid_id, cos_q).

    The standalone form of the IVF router (`similarity.ivf_topk`):
    corpus-side cost is one codegen scan over k broadcast vectors."""
    c = centroids.select(
        F.col(centroid_id_col).alias("_ctr_id"),
        F.col(vec_col).alias("_ctr_vec"),
        l2_norm(F.col(vec_col)).alias("_ctr_nrm"),
    )
    vec = F.col(vec_col)
    scored = df.select(
        F.col(id_col).alias("vec_id"), vec.alias("_vec"), l2_norm(vec).alias("_nrm")
    ).crossJoin(F.broadcast(c))
    cos_q = F.floor(
        dot_f64(F.col("_vec"), F.col("_ctr_vec"))
        / (F.col("_nrm") * F.col("_ctr_nrm"))
        * (10**quantize)
        + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_q").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.select("vec_id", F.col("_ctr_id").alias("centroid_id"), cos_q.alias("cos_q"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def kmeans_fit(
    df: DataFrame,
    init_centroids: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_iter: int = 1,
    quantize: int = 4,
    centroid_quantize: int = 6,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Distributed Lloyd iterations (spherical k-means): repeat
    {assign to nearest centroid by cosine, recompute centroids as
    per-component means}, then return the assignment against the final
    trained centroids plus the centroids themselves.

    Deterministic by construction, so the WHOLE training loop verifies
    against a SQL oracle: the caller fixes ``init_centroids``,
    assignment uses the engine's shared argmax rule (cosine floored at
    10^-quantize, ties → lowest centroid id), and each updated centroid
    lands on the 10^-centroid_quantize grid (a raw double mean depends
    on summation order; the grid makes Spark and any other engine agree
    component-for-component). An empty cluster keeps its previous
    centroid — never dropped, never re-seeded from data order.

    Scale shape, per iteration: ONE ``mapInPandas`` assignment scan
    (centroid matrix in the task closure — no shuffle, see
    :func:`similarity.nearest_centroid_scan`) + one partial-aggregated
    groupBy whose reduce side is k rows of ``dim`` stacked means.
    Centroids (k × dim doubles) round-trip through the driver between
    iterations, exactly like Spark MLlib's KMeans — that is the
    O(k·dim) part, not a data-sized collect. The input is scanned
    ``n_iter + 1`` times; persist it first when iterating deeply.

    Returns ``(assignment, centroids)``: assignment is (centroid_id,
    vec_id, cos_q) vs the trained centroids; centroids is the sorted
    [(centroid_id, [component, ...]), ...] list.
    """
    from traceframe_spark.operators.similarity import (
        collect_centroids,
        nearest_centroid_scan,
    )

    cids, cmat = collect_centroids(init_centroids, "centroid_id", vec_col)
    cgrid = 10**centroid_quantize
    for _ in range(n_iter):
        assigned = nearest_centroid_scan(
            df, cids, cmat, id_col, vec_col, quantize=quantize, keep_vec=True
        )
        # dim parsed-SQL aggregates instead of dim Column trees: the
        # Column form costs O(dim) py4j round-trips PER ITERATION (the
        # _pq_lut_expr lesson); identical expressions, identical means
        comps = [
            F.expr(
                f"CAST(floor(avg(get(vec, {i})) * {cgrid} + CAST(0.5 AS DOUBLE)) "
                f"AS DOUBLE) / {cgrid}"
            ).alias(f"c{i}")
            for i in range(dim)
        ]
        means = {
            int(r["centroid_id"]): [r[f"c{i}"] for i in range(dim)]
            for r in assigned.groupBy("centroid_id").agg(*comps).collect()
        }  # bounded: k rows
        import numpy as np

        cmat = np.array(
            [means.get(int(c), cmat[j].tolist()) for j, c in enumerate(cids)],
            dtype=np.float64,
        )
    final = nearest_centroid_scan(
        df, cids, cmat, id_col, vec_col, quantize=quantize, keep_vec=False
    )
    return final, [(int(c), cmat[j].tolist()) for j, c in enumerate(cids)]


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, dim: int, quantize: int = 6
) -> DataFrame:
    """Per-label mean vector as ``dim`` stacked ``avg`` aggregates in one
    shuffle; components quantized at 10^-q so the centroid is integer-
    exact across engines (a raw double mean depends on summation order).
    Output (label, centroid array<double> on the quantized grid)."""
    comps = [
        F.expr(
            f"CAST(floor(avg(CAST(element_at({_bq(vec_col)}, {i + 1}) AS DOUBLE)) "
            f"* {10**quantize} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )
        for i in range(dim)
    ]
    agg = df.groupBy(F.col(label_col).alias("label")).agg(
        F.array(*comps).alias("_centroid_q")
    )
    return agg.select(
        "label",
        F.transform(
            F.col("_centroid_q"), lambda x: x.cast("double") / (10**quantize)
        ).alias("centroid"),
    )


def embedding_drift(
    a: DataFrame,
    b: DataFrame,
    label_col: str,
    vec_col: str,
    dim: int,
    quantize: int = 6,
) -> DataFrame:
    """Embedding-space drift between two snapshots (old vs new encoder
    run, last week's corpus vs this week's): per label, the cosine
    between the label's mean vector in A and in B, plus both member
    counts. Cosine ≈ 1 means the region is stable; a dropping cosine
    flags encoder drift or a population shift in exactly that label —
    the signal that decides when ANN indexes and k-means partitions
    (whose geometry assumes a stable space) need rebuilding, the vector
    twin of :func:`text.token_kl_drift`.

    Centroids come from :func:`label_centroids`, so the per-dimension
    means live on the integer 10^-q grid and are engine-exact; the
    final cosine is one double expression of those identical inputs
    (IEEE-deterministic). Cost: one scan + one ``dim``-wide aggregate
    per snapshot and a labels-sized join — corpus size enters only
    through the scans. Output (label, n_a, n_b, cos_q) with cos_q on
    the suite's 1e-4 cosine grid (same as similarity's re-rank).
    """
    # ONE aggregation per snapshot: the member count rides in the same
    # groupBy as the centroid components (identical values — avg/count
    # are unchanged by sharing the aggregate), so the plan carries two
    # aggregation subtrees and one join instead of four subtrees and
    # three joins — each dropped subtree was a separate broadcast-build
    # job paying its own whole-stage-codegen compile of the dim-wide
    # aggregate (measured: two ~1.4 s single-task builds on this row).
    def _cent_n(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        comps = [
            F.expr(
                f"CAST(floor(avg(CAST(element_at({_bq(vec_col)}, {i + 1}) AS DOUBLE)) "
                f"* {10**quantize} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            )
            for i in range(dim)
        ]
        return df.groupBy(F.col(label_col).alias("label")).agg(
            F.count("*").alias(n_name), F.array(*comps).alias("_cq")
        ).select(
            "label",
            n_name,
            F.transform(
                F.col("_cq"), lambda x: x.cast("double") / (10**quantize)
            ).alias(c_name),
        )

    j = _cent_n(a, "n_a", "c_a").join(_cent_n(b, "n_b", "c_b"), "label")
    cos = dot_f64(F.col("c_a"), F.col("c_b")) / (
        l2_norm(F.col("c_a")) * l2_norm(F.col("c_b"))
    )
    cos_q = F.floor(cos * 10000 + F.lit(0.5)).cast("long")
    return j.select("label", "n_a", "n_b", cos_q.alias("cos_q"))


def label_outlier_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    bottom_k: int = 3,
    quantize: int = 4,
) -> DataFrame:
    """Rank each label's least-typical members: cosine of every vector to
    its OWN label centroid, bottom-k per label (lowest cosine = most
    likely mislabeled / noisy — the standard curation signal for
    classifier training sets). Output (label, vec_id, cos_q, rn).

    Two scans of the corpus (centroid pass + scoring pass) joined by a
    broadcast of the tiny per-label centroid table."""
    cent = label_centroids(df, label_col, vec_col, dim)
    vec = F.col(vec_col)
    scored = (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            vec.alias("_vec"),
            l2_norm(vec).alias("_nrm"),
        )
        .join(F.broadcast(cent), "label")
        .select(
            "label",
            "vec_id",
            F.floor(
                dot_f64(F.col("_vec"), F.col("centroid"))
                / (F.col("_nrm") * l2_norm(F.col("centroid")))
                * (10**quantize)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cos_q"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("cos_q").asc(), F.col("vec_id").asc())
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= bottom_k
    )
