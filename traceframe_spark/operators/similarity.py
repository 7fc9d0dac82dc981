"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`cosine_topk` — exact brute force. The query side broadcasts;
  dot products are JVM array lambdas in float64. Right answer, O(n·q)
  — the baseline and the verifier for the approximate path.
- :func:`hyperplane_lsh_topk` — approximate: random-hyperplane
  signatures put candidates into buckets; exact cosine re-ranks within
  buckets. Banded multi-probe trades recall for bucket size. At 100 TB
  the bucket join replaces the full cross product — cost follows bucket
  occupancy, not corpus size.

No reference analogue (the reference has no vector ops); this is part of
the training-data-pipeline surface the engine adds (BASELINE.json
north_star).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_f64(a: Column, b: Column) -> Column:
    """Float64 dot product of two array<float> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    quantize: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` must be small (it broadcasts). Output: (qid, cid, cos, rn).
    ``quantize`` floors the cosine at 10^-q before ranking for
    reproducible cross-engine ordering; pass None for raw doubles.
    """
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_nrm"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_nrm"),
    )
    cos = dot_f64(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))
    if quantize is not None:
        cos = F.floor(cos * (10**quantize) + F.lit(0.5)).cast("long")
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed random hyperplanes,
    packed into a long. Pure JVM expression."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket join
    for candidates, exact float64 cosine filter at ``threshold``.

    The dedup counterpart of :func:`hyperplane_lsh_topk`: symmetric
    self-join (id_a < id_b) instead of query/corpus ranking. Candidate
    cost follows bucket occupancy, never O(n²).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    per_band = n_planes // bands
    mask = (1 << per_band) - 1
    sig = hyperplane_signature(F.col(vec_col), planes)
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sig, b * per_band).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ]
    )
    keyed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        F.explode(blocks).alias("e"),
    ).select("id", "vec", "nrm", "e.band", "e.key")
    a, b = keyed.alias("a"), keyed.alias("b")
    cos = dot_f64(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine: candidates share ≥1 of ``bands`` blocks
    of the hyperplane signature; exact cosine re-ranks the candidates.

    Recall rises with bands (more probes) and falls with n_planes/bands
    (stricter blocks). Defaults: 4 blocks of 4 bits — cheap and ~high
    recall on clustered data.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    per_band = n_planes // bands
    mask = (1 << per_band) - 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        sig = hyperplane_signature(F.col(vec_col), planes)
        blocks = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(sig, b * per_band).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{side}id"),
            F.col(vec_col).alias(f"{side}_vec"),
            l2_norm(F.col(vec_col)).alias(f"{side}_nrm"),
            F.explode(blocks).alias("e"),
        ).select(f"{side}id", f"{side}_vec", f"{side}_nrm", "e.band", "e.key")

    cq = banded(queries, "q")
    cc = banded(corpus, "c")
    cands = (
        cq.join(cc, ["band", "key"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", "q_vec", "q_nrm", "c_vec", "c_nrm")
        .dropDuplicates(["qid", "cid"])
    )
    cos = F.floor(
        dot_f64(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")) * 10000
        + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        cands.select("qid", "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
