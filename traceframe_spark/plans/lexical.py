"""Lexical (keyword) search over documents: BM25 top-k.

Complements the embedding-side similarity tier (`operators/similarity`):
a training-data pipeline needs both lexical and vector retrieval —
e.g. targeted corpus probes ("find docs about X") and lexical
decontamination sweeps.

Plan shape (the 100 TB story): for a *bounded query term list* BM25
needs no inverted index and no explode — per-term term frequencies are
array expressions over the tokenized text (``size(filter(tokens, =t))``),
so the corpus pass is a zero-shuffle scan. Corpus statistics (N, avgdl,
per-term document frequencies) reduce to ONE scalar row, broadcast back
via ``crossJoin(broadcast(...))``; the only wide operation is the final
``orderBy().limit()`` = TakeOrderedAndProject (per-partition heap top-k,
driver merges k rows per partition — no global sort). Two scans total;
with the tokenized corpus persisted (a span-store-style materialization)
it is one.

Scores are quantized (``qint`` at 1e-4) before ranking so both engines
rank identical integers; ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traceframe_spark.plans.catalog import load_table, qint

BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ("hash", "join", "vector")
TOP_K = 20


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval of ``k`` docs for a fixed term list; returns
    (doc_id, score_q, rank) with the quantized score."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tokens")
    ).withColumn("dl", F.size("tokens").cast("double"))
    # NB: the lambda must take exactly ONE parameter — F.filter treats a
    # two-parameter function as the (element, index) form, so the usual
    # `lambda x, t=t:` closure trick silently binds t to the array index.
    def _eq(term):
        return lambda x: x == F.lit(term)

    for i, t in enumerate(terms):
        d = d.withColumn(f"tf{i}", F.size(F.filter("tokens", _eq(t))).cast("double"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("double")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    # idf = ln(1 + (N - df + 0.5) / (df + 0.5)); standard Robertson form.
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        contrib = idf * (
            F.col(f"tf{i}")
            * F.lit(BM25_K1 + 1.0)
            / (
                F.col(f"tf{i}")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = contrib if score is None else score + contrib
    ranked = (
        scored.withColumn("score_q", qint(score, 4))
        .filter(F.col("score_q") > 0)
        .select("doc_id", "score_q")
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    return ranked


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def vocab_topk(
    docs: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary: top-``k`` terms by total occurrences with
    document frequency — the first pass of tokenizer training / corpus
    probing.

    Scale shape: tokenize in the scan, pre-aggregate per (doc, term)
    (map-side partials collapse within-doc repeats before the wide
    term-keyed exchange), then one term-keyed aggregation; the top-k is
    TakeOrderedAndProject with a term tie-break so the cut is total.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("tokens")
    )
    per_doc = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("tf").cast("long").alias("n_occurrences"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(k)
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents"))


SQL_VOCAB_TOPK = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS tokens
    FROM documents
),
exploded AS (
    SELECT doc_id, unnest(tokens) AS term FROM toks
),
per_doc AS (
    SELECT doc_id, term, count(*) AS tf FROM exploded GROUP BY doc_id, term
)
SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences, count(*) AS n_docs
FROM per_doc
GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT 100
"""


SQL_BM25_TOPK = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS tokens
    FROM documents
),
d AS (
    SELECT doc_id,
           CAST(len(tokens) AS DOUBLE) AS dl,
           CAST(len(list_filter(tokens, x -> x = 'hash')) AS DOUBLE) AS tf0,
           CAST(len(list_filter(tokens, x -> x = 'join')) AS DOUBLE) AS tf1,
           CAST(len(list_filter(tokens, x -> x = 'vector')) AS DOUBLE) AS tf2
    FROM toks
),
stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
           sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
           sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
           sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
    FROM d
),
scored AS (
    SELECT d.doc_id,
           CAST(floor((
             ln(1.0 + (s.n_docs - s.df0 + 0.5) / (s.df0 + 0.5))
               * (d.tf0 * {BM25_K1 + 1.0} / (d.tf0 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * d.dl / s.avgdl)))
           + ln(1.0 + (s.n_docs - s.df1 + 0.5) / (s.df1 + 0.5))
               * (d.tf1 * {BM25_K1 + 1.0} / (d.tf1 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * d.dl / s.avgdl)))
           + ln(1.0 + (s.n_docs - s.df2 + 0.5) / (s.df2 + 0.5))
               * (d.tf2 * {BM25_K1 + 1.0} / (d.tf2 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * d.dl / s.avgdl)))
           ) * 10000 + 0.5) AS BIGINT) AS score_q
    FROM d CROSS JOIN stats s
)
SELECT doc_id, score_q FROM scored
WHERE score_q > 0
ORDER BY score_q DESC, doc_id ASC
LIMIT {TOP_K}
"""


LEXICAL_QUERIES = {
    "bm25_topk": q_bm25_topk,
    "vocab_topk": q_vocab_topk,
}

LEXICAL_ORACLE_SQL = {
    "bm25_topk": SQL_BM25_TOPK,
    "vocab_topk": SQL_VOCAB_TOPK,
}
