"""ML-data-prep query suite: embedding compaction (int8 quantization,
sign-bit Hamming ranking), deterministic clustering (nearest-centroid
assignment, within-label outliers), corpus statistics (TF-IDF top
terms, PMI collocations), and an interval-sweep concurrency analysis.

Every query has a DuckDB oracle. Determinism rules shared with the rest
of the catalog: quantize doubles onto the `qint` grid before any
ranking, break ties on ids, and keep aggregation payloads integer
(sums of quantized values commute; raw double sums do not).

No reference analogue — this widens the training-data-pipeline surface
(`/root/reference/traceframe/traceframe.py` has no vector/text-corpus
ops); plan shapes follow the scale notes in `operators/vectorprep.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.operators import vectorprep
from traceframe_spark.operators.sampling import md5_uniform
from traceframe_spark.plans.catalog import SQL_ANN_COSINE_TOPK, load_table, qint
from traceframe_spark.plans.lexical import _tokens

EMBED_DIM = 64


# ---------------------------------------------------------------------------
# embedding compaction
# ---------------------------------------------------------------------------


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization summary for every embedding: the
    integer q_sum/q_abs_sum/n_sat triple pins each code's exact value,
    so the oracle verifies the full quantizer, not a sketch of it."""
    e = load_table(spark, sf_dir, "embeddings")
    return vectorprep.quantization_stats(e, "vec_id", "embedding")


SQL_EMBED_QUANTIZE = """
WITH scaled AS (
    SELECT vec_id,
           CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
                THEN 0.0
                ELSE 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           END AS scale,
           embedding
    FROM embeddings
),
coded AS (
    SELECT vec_id, scale,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS q
    FROM scaled
)
SELECT vec_id,
       CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_q,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_abs_sum,
       CAST(list_sum(list_transform(q, v -> CASE WHEN abs(v) = 127 THEN 1 ELSE 0 END)) AS BIGINT) AS n_sat
FROM coded
"""


def q_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming top-5 over the sign-bit binarized corpus for 10 query
    vectors. Unlike the hyperplane-LSH tier there is no randomness —
    the bits are the data's own signs — so the DuckDB oracle reproduces
    distances exactly (two 32-bit words keep 2^i inside BIGINT)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return vectorprep.hamming_topk(e, q, "vec_id", "embedding", k=5)


SQL_ANN_HAMMING_TOPK = """
WITH words AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(generate_series(0, 31),
                i -> CASE WHEN CAST(embedding[i + 1] AS DOUBLE) >= 0 THEN CAST(2 ** i AS BIGINT) ELSE 0 END)) AS BIGINT) AS w_lo,
           CAST(list_sum(list_transform(generate_series(32, 63),
                i -> CASE WHEN CAST(embedding[i + 1] AS DOUBLE) >= 0 THEN CAST(2 ** (i - 32) AS BIGINT) ELSE 0 END)) AS BIGINT) AS w_hi
    FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS qid, c.vec_id AS cid,
           CAST(bit_count(xor(c.w_lo, q.w_lo)) + bit_count(xor(c.w_hi, q.w_hi)) AS BIGINT) AS hamming
    FROM words c CROSS JOIN words q
    WHERE q.vec_id < 10
),
ranked AS (
    SELECT qid, cid, hamming,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY hamming ASC, cid ASC) AS BIGINT) AS rn
    FROM pairs
)
SELECT qid, cid, hamming, rn FROM ranked WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# deterministic clustering / curation
# ---------------------------------------------------------------------------


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment of the whole corpus to a fixed,
    deterministic centroid set (the 8 lowest vec_ids — a seed choice
    both engines share), reduced to per-centroid population and an
    integer cosine mass. Pins the assignment argmax rule the IVF router
    relies on, end-to-end against SQL."""
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = vectorprep.assign_centroids(e, centroids, "vec_id", "embedding", quantize=4)
    return assigned.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum("cos_q").cast("long").alias("sum_cos_q"),
    )


SQL_KMEANS_ASSIGN = """
WITH cent AS (
    SELECT vec_id AS centroid_id, embedding AS cvec,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cnrm
    FROM embeddings WHERE vec_id < 8
),
scored AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c.cnrm)
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent c
),
best AS (
    SELECT vec_id, centroid_id, cos_q,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
    FROM scored
)
SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_assigned, CAST(sum(cos_q) AS BIGINT) AS sum_cos_q
FROM best WHERE rn = 1 GROUP BY centroid_id
"""


def q_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-3 least-typical members of every label class by cosine to
    the label's own centroid (mean embedding on a quantized grid so both
    engines see the identical centroid)."""
    e = load_table(spark, sf_dir, "embeddings")
    return vectorprep.label_outlier_scores(
        e, "vec_id", "embedding", "label", dim=EMBED_DIM, bottom_k=3
    )


SQL_LABEL_OUTLIERS = """
WITH percomp AS (
    SELECT label, i,
           CAST(floor(avg(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS c
    FROM (SELECT label, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
          FROM embeddings)
    GROUP BY label, i
),
cent AS (
    SELECT label, list(c ORDER BY i) AS centroid FROM percomp GROUP BY label
),
scored AS (
    SELECT e.label, e.vec_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.centroid, x -> x * x))))
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e JOIN cent c USING (label)
),
ranked AS (
    SELECT label, vec_id, cos_q,
           CAST(row_number() OVER (PARTITION BY label ORDER BY cos_q ASC, vec_id ASC) AS BIGINT) AS rn
    FROM scored
)
SELECT label, vec_id, cos_q, rn FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (corpus stats
    over ALL docs, output bounded to doc_id < 50). The per-term scan is
    one explode + two keyed aggregations; the doc-frequency table is
    vocabulary-sized, so the tf⋈df join stays an equi-join AQE can
    broadcast when the vocabulary is small."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            qint(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_q").desc(), F.col("term").asc())
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= 3
    )


SQL_TFIDF_TOPK = """
WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           CAST(floor(tf.tf * ln(n.n_docs / dfreq.df) * 10000 + 0.5) AS BIGINT) AS tfidf_q
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    WHERE tf.doc_id < 50
),
ranked AS (
    SELECT doc_id, term, tfidf_q,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_q DESC, term ASC) AS BIGINT) AS rn
    FROM scored
)
SELECT doc_id, term, tfidf_q, rn FROM ranked WHERE rn <= 3
"""


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations: adjacent-token bigrams with count >= 5,
    ranked by pointwise mutual information. Bigram generation is a pure
    array expression (slice+zip) — no Python and no shuffle before the
    count aggregations; the unigram⋈bigram joins are vocabulary-sized."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(_tokens(F.col("text")).alias("w"))
    n = F.size("w")
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                F.slice("w", 2, F.greatest(n - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    big = pairs.groupBy("a", "b").agg(F.count("*").cast("double").alias("c_ab"))
    uni = (
        toks.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("c_t"))
    )
    totals = big.agg(F.sum("c_ab").alias("n_big")).crossJoin(
        uni.agg(F.sum("c_t").alias("n_tok"))
    )
    scored = (
        big.filter(F.col("c_ab") >= 5)
        .join(uni.withColumnsRenamed({"term": "a", "c_t": "c_a"}), "a")
        .join(uni.withColumnsRenamed({"term": "b", "c_t": "c_b"}), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("long").alias("n_pair"),
            qint(
                F.log(
                    (F.col("c_ab") / F.col("n_big"))
                    / ((F.col("c_a") / F.col("n_tok")) * (F.col("c_b") / F.col("n_tok")))
                ),
                4,
            ).alias("pmi_q"),
        )
    )
    return scored.orderBy(
        F.col("pmi_q").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(20)


SQL_PMI_BIGRAMS = """
WITH toks AS (
    SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
    FROM documents
),
pairs AS (
    SELECT w[i] AS a, w[i + 1] AS b
    FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
big AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS c_ab FROM pairs GROUP BY a, b),
uni AS (
    SELECT term, CAST(count(*) AS DOUBLE) AS c_t
    FROM (SELECT unnest(w) AS term FROM toks) GROUP BY term
),
tot AS (
    SELECT (SELECT sum(c_ab) FROM big) AS n_big, (SELECT sum(c_t) FROM uni) AS n_tok
),
scored AS (
    SELECT big.a, big.b, CAST(big.c_ab AS BIGINT) AS n_pair,
           CAST(floor(ln((big.c_ab / tot.n_big) / ((ua.c_t / tot.n_tok) * (ub.c_t / tot.n_tok))) * 10000 + 0.5) AS BIGINT) AS pmi_q
    FROM big
    JOIN uni ua ON ua.term = big.a
    JOIN uni ub ON ub.term = big.b
    CROSS JOIN tot
    WHERE big.c_ab >= 5
)
SELECT a, b, n_pair, pmi_q FROM scored ORDER BY pmi_q DESC, a ASC, b ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# interval sweep
# ---------------------------------------------------------------------------


def q_inflight_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent in-transit shipments per supplier: each lineitem
    occupies [shipdate, shipdate + (qty % 7 + 1) days); the sweep is the
    classic +1/-1 endpoint encoding with a running sum. Endpoint deltas
    pre-aggregate per (supplier, day) BEFORE the window — the running
    max is unchanged (the merged delta equals the post-arrivals value,
    and the departures-first intermediate value is never larger), and
    the window then shuffles per-day rows, not per-shipment rows. The
    final per-supplier max reuses the window's hash partitioning: the
    plan carries exactly two exchanges at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    days = (F.col("l_quantity").cast("int") % 7 + 1).cast("int")
    # ONE scan: each shipment emits its two endpoints via a 2-element
    # explode (map-side Generate), instead of a union of two scans that
    # reads the fact table twice
    endpoints = F.array(
        F.struct(F.to_date("l_shipdate").alias("day"), F.lit(1).alias("delta")),
        F.struct(
            F.date_add(F.to_date("l_shipdate"), days).alias("day"),
            F.lit(-1).alias("delta"),
        ),
    )
    net = (
        li.select(F.col("l_suppkey").alias("suppkey"), F.explode(endpoints).alias("e"))
        .groupBy("suppkey", F.col("e.day").alias("day"))
        .agg(F.sum("e.delta").alias("net"))
    )
    w = Window.partitionBy("suppkey").orderBy("day")
    running = net.withColumn("open", F.sum("net").over(w))
    peaks = running.groupBy("suppkey").agg(F.max("open").cast("long").alias("peak"))
    return peaks.orderBy(F.col("peak").desc(), F.col("suppkey").asc()).limit(25)


SQL_INFLIGHT_CONCURRENCY = """
WITH ev AS (
    SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day, 1 AS delta FROM lineitem
    UNION ALL
    SELECT l_suppkey, CAST(l_shipdate AS DATE) + (CAST(l_quantity AS INTEGER) % 7 + 1), -1 FROM lineitem
),
net AS (SELECT suppkey, day, sum(delta) AS net FROM ev GROUP BY suppkey, day),
run AS (
    SELECT suppkey, sum(net) OVER (PARTITION BY suppkey ORDER BY day) AS open
    FROM net
)
SELECT suppkey, CAST(max(open) AS BIGINT) AS peak
FROM run GROUP BY suppkey
ORDER BY peak DESC, suppkey ASC LIMIT 25
"""


def q_ann_cosine_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS-kernel form of ``ann_cosine_topk`` — the SAME brute-force
    answer (same oracle SQL), produced by the 100 TB-shaped plan: one
    float64 matrix multiply per Arrow batch plus a map-side top-k
    combine, so the final per-query window ranks ~batches×k rows
    instead of shuffling the full n×q pair set into q partitions. See
    :func:`traceframe_spark.operators.similarity.cosine_topk_blas`."""
    from traceframe_spark.operators.similarity import cosine_topk_blas

    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_blas(
        e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


def q_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full distributed Lloyd iteration, value-verified end-to-end:
    assign to the 8 shared init centroids, recompute per-component mean
    centroids on the 10^-6 grid, re-assign against the TRAINED
    centroids, and reduce to per-centroid population + cosine mass. The
    oracle replays the identical training step in SQL — assignment
    argmax, grid-quantized means, empty-cluster carry-over — so this
    pins the iterative algorithm itself, not just one assignment."""
    e = load_table(spark, sf_dir, "embeddings")
    init = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned, _ = vectorprep.kmeans_fit(
        e, init, "vec_id", "embedding", dim=EMBED_DIM, n_iter=1
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.sum("cos_q").cast("long").alias("sum_cos_q"),
        )
        .orderBy("centroid_id")
    )


SQL_KMEANS_FIT = """
WITH cent0 AS (
    SELECT vec_id AS centroid_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
    FROM embeddings WHERE vec_id < 8
),
s0 AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.cvec, x -> x * x))))
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent0 c
),
a0 AS (
    SELECT vec_id, centroid_id
    FROM (SELECT vec_id, centroid_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
          FROM s0)
    WHERE rn = 1
),
m AS (
    SELECT centroid_id, i,
           CAST(floor(avg(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS c
    FROM (SELECT a0.centroid_id, unnest(e.embedding) AS x,
                 unnest(generate_series(1, 64)) AS i
          FROM a0 JOIN embeddings e ON e.vec_id = a0.vec_id)
    GROUP BY centroid_id, i
),
cent1 AS (
    SELECT c0.centroid_id, COALESCE(mm.centroid, c0.cvec) AS cvec
    FROM cent0 c0
    LEFT JOIN (SELECT centroid_id, list(c ORDER BY i) AS centroid
               FROM m GROUP BY centroid_id) mm USING (centroid_id)
),
s1 AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.cvec, x -> x * x))))
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent1 c
),
a1 AS (
    SELECT vec_id, centroid_id, cos_q
    FROM (SELECT vec_id, centroid_id, cos_q,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
          FROM s1)
    WHERE rn = 1
)
SELECT centroid_id,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(sum(cos_q) AS BIGINT) AS sum_cos_q
FROM a1 GROUP BY centroid_id ORDER BY centroid_id
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup summary: cluster to the 8 shared
    deterministic centroids, score pairwise cosine WITHIN clusters only
    (the SemDeDup cost bound: occupancy², never n²), and reduce the
    qualifying pairs (cos >= 0.30) to per-cluster pair/duplicate counts.
    The oracle recomputes assignment + within-cluster pairs in SQL, so
    the whole route — argmax rule, triangle convention, quantized
    scores — is value-verified, not just row-counted."""
    from traceframe_spark.operators.similarity import semdedup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    pairs = semdedup_pairs(e, centroids, "vec_id", "embedding", min_cos_q=3000)
    return (
        pairs.groupBy("centroid_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("id_b").cast("long").alias("n_dups"),
            F.sum("cos_q").cast("long").alias("sum_cos_q"),
        )
        .orderBy("centroid_id")
    )


SQL_SEMANTIC_DEDUP = """
WITH cent AS (
    SELECT vec_id AS centroid_id, embedding AS cvec,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cnrm
    FROM embeddings WHERE vec_id < 8
),
scored AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c.cnrm)
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent c
),
assigned AS (
    SELECT vec_id, centroid_id
    FROM (SELECT vec_id, centroid_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
          FROM scored)
    WHERE rn = 1
),
pairs AS (
    SELECT a.centroid_id, a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM assigned a
    JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
)
SELECT centroid_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT id_b) AS BIGINT) AS n_dups,
       CAST(sum(cos_q) AS BIGINT) AS sum_cos_q
FROM pairs WHERE cos_q >= 3000
GROUP BY centroid_id ORDER BY centroid_id
"""


def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SemDeDup keep DECISION (similarity.semdedup_keep —
    Abbas et al. 2303.09540): cluster, pair within clusters at
    cos >= 0.30, group transitively, keep ONE survivor per duplicate
    group — the member FARTHEST from its centroid (the paper's
    keep-low-similarity election), ties to lowest id. Output is the
    kept corpus itself, every row labeled with its assigned centroid;
    the oracle replays argmax assignment, the pair threshold, a
    recursive transitive closure, and the election — the entire
    decision by value, not a pair-count summary."""
    from traceframe_spark.operators.similarity import semdedup_keep

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    kept = semdedup_keep(e, centroids, "vec_id", "embedding", min_cos_q=3000)
    return kept.select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
    )


def q_cluster_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced resampling (sampling.cluster_cap_sample,
    keep='far' — Sorscher et al. 2206.14486's keep-hard-examples rule):
    assign every vector to its nearest of the 8 deterministic
    centroids, keep the 25 LOWEST-cosine members per cluster (ties to
    lowest id). The oracle replays assignment, the distance ordering,
    and the cap — the whole selection by value."""
    from traceframe_spark.operators.sampling import cluster_cap_sample

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    kept = cluster_cap_sample(
        e, centroids, "vec_id", "embedding", cap=25, keep="far"
    )
    return kept.select(
        "vec_id",
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.col("cos_q").cast("long").alias("cos_q"),
    )


SQL_CLUSTER_CAP = """
WITH cent AS (
    SELECT vec_id AS centroid_id, embedding AS cvec,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cnrm
    FROM embeddings WHERE vec_id < 8
),
scored AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c.cnrm)
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent c
),
best AS (
    SELECT vec_id, centroid_id, cos_q,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
    FROM scored
),
capped AS (
    SELECT vec_id, centroid_id, cos_q,
           row_number() OVER (PARTITION BY centroid_id ORDER BY cos_q ASC, vec_id ASC) AS krn
    FROM best WHERE rn = 1
)
SELECT vec_id, centroid_id, cos_q FROM capped WHERE krn <= 25
"""


def q_semdedup_index_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup keep decision against a PERSISTED quantizer
    (similarity.semdedup_keep_over_index): the centroids come from a
    manifest IVF index's own meta — the 100 TB shape, where batch
    sweeps and the streaming ingest loop must judge sameness against
    ONE frozen quantizer. Built here with the replayable first-8
    corpus vectors as centroids (the q_semdedup_keep convention), so
    the SAME DuckDB oracle replays the whole decision — which is
    exactly the point: the store roundtrip must not change a single
    keep verdict."""
    from traceframe_spark.operators import similarity
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    path = tmp_store("semdedup_idx_") + "/ivf"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding", centroids=cents, protocol="manifest"
    )
    kept = similarity.semdedup_keep_over_index(
        spark, path, e, "vec_id", "embedding", min_cos_q=3000
    )
    return kept.select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
    )


_SQL_COS_PAIR = """CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000 + 0.5) AS BIGINT)"""


SQL_SEMDEDUP_KEEP = f"""
WITH RECURSIVE
cent AS (
    SELECT vec_id AS centroid_id, embedding AS cvec,
           sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cnrm
    FROM embeddings WHERE vec_id < 8
),
scored AS (
    SELECT e.vec_id, c.centroid_id,
           CAST(floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * c.cnrm)
               * 10000 + 0.5) AS BIGINT) AS cos_q
    FROM embeddings e CROSS JOIN cent c
),
assigned AS (
    SELECT vec_id, centroid_id, cos_q AS ac
    FROM (SELECT vec_id, centroid_id, cos_q,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, centroid_id ASC) AS rn
          FROM scored)
    WHERE rn = 1
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM assigned a
    JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    WHERE {_SQL_COS_PAIR} >= 3000
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
reach AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v WHERE e.v <> r.u
),
comp AS (
    SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
),
dropped AS (
    SELECT id FROM (
        SELECT c.id,
               row_number() OVER (
                   PARTITION BY c.component ORDER BY a.ac ASC, c.id ASC
               ) AS rn
        FROM comp c JOIN assigned a ON a.vec_id = c.id
    ) WHERE rn > 1
)
SELECT a.vec_id, CAST(a.centroid_id AS BIGINT) AS centroid_id
FROM assigned a
WHERE a.vec_id NOT IN (SELECT id FROM dropped)
"""




def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN weak labeling (similarity.knn_predict): each probe takes
    the majority label of its exact top-5 cosine neighbors, ties by
    vote count desc then smallest label — the label-propagation /
    label-audit step, with the winning label's best neighbor cosine as
    the confidence signal. The oracle replays the top-k, the vote, and
    the election."""
    from traceframe_spark.operators.similarity import knn_predict

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return knn_predict(e, q, "vec_id", "embedding", "label", k=5)


SQL_KNN_LABEL = """
WITH norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY vec_id
),
dots AS (
    SELECT qid, cid, sum(qv * cv) AS dot
    FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               CAST(unnest(q.embedding) AS DOUBLE) AS qv,
               CAST(unnest(c.embedding) AS DOUBLE) AS cv
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    )
    GROUP BY qid, cid
),
scored AS (
    SELECT d.qid, d.cid,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
),
topk AS (
    SELECT qid, cid, cos FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
        FROM scored
    ) WHERE rn <= 5
),
votes AS (
    SELECT t.qid, e.label AS lbl,
           CAST(count(*) AS BIGINT) AS votes,
           max(t.cos) AS best_cos
    FROM topk t JOIN embeddings e ON e.vec_id = t.cid
    GROUP BY t.qid, e.label
)
SELECT qid, CAST(lbl AS BIGINT) AS pred_label, votes, best_cos
FROM (
    SELECT qid, lbl, votes, best_cos,
           row_number() OVER (PARTITION BY qid ORDER BY votes DESC, lbl ASC) AS rn
    FROM votes
) WHERE rn = 1
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector, the 3 nearest neighbors whose LABEL DIFFERS — the pairs a
    metric-learning loss needs most. Same plan shape as the brute
    cosine baseline (broadcast probe side, per-probe top-k window) with
    the label inequality pushed into the pair filter, so mined
    candidates never include same-class rows. At scale the candidate
    side streams once; the IVF/LSH variants apply unchanged when the
    corpus outgrows brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    base = e.select("vec_id", "label", "embedding", norm.alias("nrm"))
    q = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q_emb"), F.col("c_emb"), lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_label") != F.col("q_label"))
        .select(
            "qid",
            "cid",
            F.col("c_label").cast("long").alias("neg_label"),
            qint(dot / (F.col("q_nrm") * F.col("c_nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("qid", "cid", "neg_label", "cos", "rn")
    )


SQL_HARD_NEGATIVES = """
WITH norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY vec_id
),
dots AS (
    SELECT qid, cid, neg_label, sum(qv * cv) AS dot
    FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cid, CAST(c.label AS BIGINT) AS neg_label,
               CAST(unnest(q.embedding) AS DOUBLE) AS qv,
               CAST(unnest(c.embedding) AS DOUBLE) AS cv
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 8 AND c.label <> q.label
    )
    GROUP BY qid, cid, neg_label
),
scored AS (
    SELECT d.qid, d.cid, d.neg_label,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
)
SELECT qid, cid, neg_label, cos, rn
FROM (
    SELECT qid, cid, neg_label, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
    FROM scored
) WHERE rn <= 3
"""


def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift (operators/vectorprep.embedding_drift):
    even vec_ids play the old snapshot, odd the new; per label, the
    cosine between the two snapshots' mean vectors plus both member
    counts — the geometry-stability signal that schedules ANN-index /
    k-means rebuilds, the vector twin of token_drift. Centroids live on
    the 1e-6 quantized grid (label_centroids), so both engines compute
    the final cosine from identical inputs."""
    e = load_table(spark, sf_dir, "embeddings")
    return vectorprep.embedding_drift(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
        "label",
        "embedding",
        dim=EMBED_DIM,
    )


SQL_EMBED_DRIFT = """
WITH pa AS (
    SELECT label, i,
           CAST(floor(avg(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS c
    FROM (SELECT label, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
          FROM embeddings WHERE vec_id % 2 = 0)
    GROUP BY label, i
),
pb AS (
    SELECT label, i,
           CAST(floor(avg(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS c
    FROM (SELECT label, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
          FROM embeddings WHERE vec_id % 2 = 1)
    GROUP BY label, i
),
ca AS (SELECT label, list(c ORDER BY i) AS c_a FROM pa GROUP BY label),
cb AS (SELECT label, list(c ORDER BY i) AS c_b FROM pb GROUP BY label),
na AS (SELECT label, count(*) AS n_a FROM embeddings WHERE vec_id % 2 = 0 GROUP BY label),
nb AS (SELECT label, count(*) AS n_b FROM embeddings WHERE vec_id % 2 = 1 GROUP BY label)
SELECT ca.label, n_a, n_b,
       CAST(floor(
           list_sum(list_transform(generate_series(1, 64), i -> c_a[i] * c_b[i]))
           / (sqrt(list_sum(list_transform(c_a, x -> x * x)))
              * sqrt(list_sum(list_transform(c_b, x -> x * x))))
           * 10000 + 0.5) AS BIGINT) AS cos_q
FROM ca
JOIN cb USING (label)
JOIN na USING (label)
JOIN nb USING (label)
"""


# ---------------------------------------------------------------------------
# hashed n-gram Naive Bayes classifier (operators/classifier.py)
# ---------------------------------------------------------------------------

_NB_BUCKETS = 4096


def q_nb_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram multinomial Naive Bayes (operators/classifier):
    train on the even-doc_id half with the ``lang`` label, predict the
    odd half — the fastText/CCNet trained-filter shape as pure
    relational dataflow (one groupBy trains; broadcast join + one
    per-doc aggregation scores). The oracle replays the ENTIRE chain —
    md5 feature hashing, add-one smoothing, unseen-bucket floors, log-
    posterior sums, argmax with deterministic tie-breaks, top1−top2
    margin — so the answer is value-verified end to end."""
    from traceframe_spark.operators import classifier as C

    d = load_table(spark, sf_dir, "documents")
    w, cs = C.train_nb(d.filter(F.col("doc_id") % 2 == 0), "lang", n_buckets=_NB_BUCKETS)
    pred = C.nb_predict(d.filter(F.col("doc_id") % 2 == 1), w, cs, n_buckets=_NB_BUCKETS)
    return pred.select(
        F.col("id").alias("doc_id"),
        "pred_label",
        qint(F.col("score"), 4).alias("score_q"),
        qint(F.col("margin"), 4).alias("margin_q"),
    )


SQL_NB_PREDICT = r"""
WITH toksf AS (
    SELECT doc_id, lang,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       w -> w <> '') AS t
    FROM documents
),
uni AS (
    SELECT doc_id, lang, 'u:' || t[CAST(u.i AS INT)] AS f
    FROM toksf, unnest(range(1, len(t) + 1)) AS u(i)
),
bi AS (
    SELECT doc_id, lang,
           'b:' || t[CAST(u.i AS INT)] || ' ' || t[CAST(u.i AS INT) + 1] AS f
    FROM toksf, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
feats AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
w AS (
    SELECT lang AS label, bucket, count(*) AS c
    FROM feats WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
tot AS (SELECT label, sum(c) AS tot_c FROM w GROUP BY 1),
pri AS (
    SELECT lang AS label, count(*) AS n_docs
    FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
n AS (SELECT sum(n_docs) AS n_total FROM pri),
sfeats AS (
    SELECT doc_id, bucket, count(*) AS cnt
    FROM feats WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
scored AS (
    SELECT s.doc_id, p.label,
           any_value(ln(p.n_docs * 1.0 / n.n_total))
           + sum(s.cnt * ln((coalesce(w.c, 0) + 1.0)
                            / (coalesce(t.tot_c, 0) + 4096.0))) AS score
    FROM sfeats s
    CROSS JOIN pri p
    CROSS JOIN n
    LEFT JOIN tot t ON t.label = p.label
    LEFT JOIN w ON w.label = p.label AND w.bucket = s.bucket
    GROUP BY s.doc_id, p.label
),
ranked AS (
    SELECT doc_id, label, score,
           score - lead(score) OVER
               (PARTITION BY doc_id ORDER BY score DESC, label) AS margin,
           row_number() OVER
               (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
    FROM scored
)
SELECT doc_id, label AS pred_label,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q,
       CAST(floor(margin * 10000 + 0.5) AS BIGINT) AS margin_q
FROM ranked WHERE rn = 1
"""


def q_nb_store_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nb_predict`` against a PERSISTED classifier
    (operators/classifier.write_nb_classifier / score_against_nb — the
    CCNet shape: train the filter once on a frozen labeled set, score
    snapshots against the stored counts without re-reading labeled
    text). The store roundtrip is the point; the stored model equals
    the in-memory one, so the oracle is ``SQL_NB_PREDICT`` verbatim —
    the stored-state-equals-batch-operator pattern of
    ``lm_store_score``."""
    from traceframe_spark.operators import classifier as C
    from traceframe_spark.plans.catalog import tmp_store

    d = load_table(spark, sf_dir, "documents")
    path = tmp_store("nb_clf_") + "/nb"
    C.write_nb_classifier(
        d.filter(F.col("doc_id") % 2 == 0), path, "lang", n_buckets=_NB_BUCKETS
    )
    pred = C.score_against_nb(d.filter(F.col("doc_id") % 2 == 1), path)
    return pred.select(
        F.col("id").alias("doc_id"),
        "pred_label",
        qint(F.col("score"), 4).alias("score_q"),
        qint(F.col("margin"), 4).alias("margin_q"),
    )


def q_nb_manifest_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nb_store_predict`` against a MANIFEST-protocol classifier
    store (both count layers + n_buckets published in ONE atomic
    commit). The protocol must not change a single stored count, so the
    oracle is ``SQL_NB_PREDICT`` verbatim — the protocol-preserves-
    values pin, for the fourth curation store the manifest commit
    covers (dedup index, gram layer, bigram LM, NB classifier)."""
    from traceframe_spark.operators import classifier as C
    from traceframe_spark.plans.catalog import tmp_store

    d = load_table(spark, sf_dir, "documents")
    path = tmp_store("nb_clf_man_") + "/nb"
    C.write_nb_classifier(
        d.filter(F.col("doc_id") % 2 == 0), path, "lang",
        n_buckets=_NB_BUCKETS, protocol="manifest",
    )
    pred = C.score_against_nb(d.filter(F.col("doc_id") % 2 == 1), path)
    return pred.select(
        F.col("id").alias("doc_id"),
        "pred_label",
        qint(F.col("score"), 4).alias("score_q"),
        qint(F.col("margin"), 4).alias("margin_q"),
    )


def q_nb_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3 quality-filter composition (arXiv:2005.14165 App. A):
    a binary classifier trained to separate a 'curated' source set from
    the rest (labels derived from the ``source`` column), every
    document scored with hi−lo log-odds, and kept by a stochastic
    score-based acceptance — a deterministic md5 uniform draw against
    sigmoid(logodds), so low-scoring docs survive with proportionally
    small probability (tail diversity) instead of a hard cut. The
    sigmoid runs on the 1e-4-QUANTIZED logodds so both engines compare
    the draw against a bit-identical probability."""
    from traceframe_spark.operators import classifier as C

    d = load_table(spark, sf_dir, "documents")
    hi = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    labeled = d.withColumn("qlabel", F.when(hi, "hi").otherwise("lo"))
    w, cs = C.train_nb(
        labeled.filter(F.col("doc_id") % 2 == 0), "qlabel", n_buckets=_NB_BUCKETS
    )
    scored = C.nb_scores(
        labeled.filter(F.col("doc_id") % 2 == 1), w, cs, n_buckets=_NB_BUCKETS
    )
    lo = scored.groupBy("id").agg(
        (
            F.max(F.when(F.col("label") == "hi", F.col("score")))
            - F.max(F.when(F.col("label") == "lo", F.col("score")))
        ).alias("logodds")
    )
    lo = lo.select("id", qint(F.col("logodds"), 4).alias("logodds_q"))
    u = md5_uniform(F.col("id")) / F.lit(float(1 << 32))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logodds_q") / F.lit(10000.0)))
    return lo.select(
        F.col("id").alias("doc_id"), "logodds_q", (u < p).alias("keep")
    )


SQL_NB_QUALITY_FILTER = r"""
WITH labeled AS (
    SELECT doc_id,
           CASE WHEN source IN ('src0','src1','src2','src3','src4')
                THEN 'hi' ELSE 'lo' END AS qlabel,
           text
    FROM documents
),
toksf AS (
    SELECT doc_id, qlabel,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       w -> w <> '') AS t
    FROM labeled
),
uni AS (
    SELECT doc_id, qlabel, 'u:' || t[CAST(u.i AS INT)] AS f
    FROM toksf, unnest(range(1, len(t) + 1)) AS u(i)
),
bi AS (
    SELECT doc_id, qlabel,
           'b:' || t[CAST(u.i AS INT)] || ' ' || t[CAST(u.i AS INT) + 1] AS f
    FROM toksf, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
feats AS (
    SELECT doc_id, qlabel,
           ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS bucket
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
w AS (
    SELECT qlabel AS label, bucket, count(*) AS c
    FROM feats WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
tot AS (SELECT label, sum(c) AS tot_c FROM w GROUP BY 1),
pri AS (
    SELECT qlabel AS label, count(*) AS n_docs
    FROM labeled WHERE doc_id % 2 = 0 GROUP BY 1
),
n AS (SELECT sum(n_docs) AS n_total FROM pri),
sfeats AS (
    SELECT doc_id, bucket, count(*) AS cnt
    FROM feats WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
scored AS (
    SELECT s.doc_id, p.label,
           any_value(ln(p.n_docs * 1.0 / n.n_total))
           + sum(s.cnt * ln((coalesce(w.c, 0) + 1.0)
                            / (coalesce(t.tot_c, 0) + 4096.0))) AS score
    FROM sfeats s
    CROSS JOIN pri p
    CROSS JOIN n
    LEFT JOIN tot t ON t.label = p.label
    LEFT JOIN w ON w.label = p.label AND w.bucket = s.bucket
    GROUP BY s.doc_id, p.label
),
odds AS (
    SELECT doc_id,
           CAST(floor(
               (max(CASE WHEN label = 'hi' THEN score END)
                - max(CASE WHEN label = 'lo' THEN score END)) * 10000 + 0.5
           ) AS BIGINT) AS logodds_q
    FROM scored GROUP BY doc_id
)
SELECT doc_id, logodds_q,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0)
       < (1.0 / (1.0 + exp(-(logodds_q / 10000.0)))) AS keep
FROM odds
"""


MLPREP_QUERIES = {
    "nb_predict": q_nb_predict,
    "nb_store_predict": q_nb_store_predict,
    "nb_manifest_predict": q_nb_manifest_predict,
    "nb_quality_filter": q_nb_quality_filter,
    "hard_negatives": q_hard_negatives,
    "embed_quantize": q_embed_quantize,
    "ann_cosine_blas": q_ann_cosine_blas,
    "ann_hamming_topk": q_ann_hamming_topk,
    "kmeans_assign": q_kmeans_assign,
    "kmeans_fit": q_kmeans_fit,
    "semantic_dedup": q_semantic_dedup,
    "semdedup_keep": q_semdedup_keep,
    "semdedup_index_keep": q_semdedup_index_keep,
    "cluster_cap": q_cluster_cap,
    "knn_label": q_knn_label,
    "label_outliers": q_label_outliers,
    "tfidf_topk": q_tfidf_topk,
    "pmi_bigrams": q_pmi_bigrams,
    "inflight_concurrency": q_inflight_concurrency,
    "embed_drift": q_embed_drift,
}

MLPREP_ORACLE_SQL = {
    "nb_predict": SQL_NB_PREDICT,
    "nb_store_predict": SQL_NB_PREDICT,
    "nb_manifest_predict": SQL_NB_PREDICT,
    "nb_quality_filter": SQL_NB_QUALITY_FILTER,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "embed_quantize": SQL_EMBED_QUANTIZE,
    "ann_cosine_blas": SQL_ANN_COSINE_TOPK,
    "ann_hamming_topk": SQL_ANN_HAMMING_TOPK,
    "kmeans_assign": SQL_KMEANS_ASSIGN,
    "kmeans_fit": SQL_KMEANS_FIT,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "semdedup_keep": SQL_SEMDEDUP_KEEP,
    "semdedup_index_keep": SQL_SEMDEDUP_KEEP,
    "cluster_cap": SQL_CLUSTER_CAP,
    "knn_label": SQL_KNN_LABEL,
    "label_outliers": SQL_LABEL_OUTLIERS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "inflight_concurrency": SQL_INFLIGHT_CONCURRENCY,
    "embed_drift": SQL_EMBED_DRIFT,
}
