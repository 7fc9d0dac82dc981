"""Pipeline-operator queries: dedup / similarity / text-analysis entries
for the driver's correctness gate.

Oracle-backed where DuckDB can express the same computation (n-gram
Jaccard, quality signals, language ID); rows-only for operators whose
definition is engine-hash-dependent (MinHash/SimHash use xxhash64, the
hyperplane LSH uses a seeded numpy draw) — those are pinned by pytest
fixtures instead (tests/test_pipeline_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.functions import ranked_topk
from traceframe_spark.operators import dedup, graph, multimodal, similarity, text
from traceframe_spark.plans.catalog import SQL_ANN_COSINE_TOPK, load_table, qint, tmp_store


# --------------------------------------------------------- oracle-backed


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard pairs ≥ 0.85 on a bounded doc subset (the
    inverted-index join form of near-dup detection)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.85)
    return pairs.select("id_a", "id_b", qint(F.col("jaccard"), 4).alias("jaccard_q"))


def _sql_jaccard_pair_ctes(threshold: float, max_id: int) -> str:
    """CTE chain ending in ``pairs(id_a, id_b)`` — the exact-Jaccard pair
    set ≥ ``threshold``, shared by the closure-based cluster oracle."""
    return f"""
docs AS (
    SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id < {max_id}
),
shingled AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, substr(t, CAST(g AS INT), 5) AS sh
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS g
              FROM docs)
    )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
    FROM shingled a JOIN shingled b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT id_a, id_b
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
)"""


def _sql_exact_jaccard(threshold: float, max_id: int) -> str:
    """DuckDB form of the exact 5-gram Jaccard pair set >= ``threshold``
    over documents with doc_id < ``max_id`` — the shared oracle for the
    exact inverted-index query AND the verified layer of MinHash-LSH.
    Builds on the SAME CTE chain the cluster oracle uses
    (:func:`_sql_jaccard_pair_ctes`) so the shingling/Jaccard definition
    exists exactly once."""
    return f"""
WITH {_sql_jaccard_pair_ctes(threshold, max_id)}
SELECT c.id_a, c.id_b,
       CAST(floor(c.n_common::DOUBLE / (sa.n_sh + sb.n_sh - c.n_common) * 10000 + 0.5) AS BIGINT) AS jaccard_q
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE c.n_common::DOUBLE / (sa.n_sh + sb.n_sh - c.n_common) >= {threshold}
"""


SQL_NGRAM_JACCARD = _sql_exact_jaccard(0.85, 150)


def q_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al. 2107.06499):
    per-document count of non-canonical duplicated 8-token windows on a
    bounded subset. The operator keys windows by xxhash64; the oracle
    groups by the literal window string — identical answers unless a
    64-bit collision lands inside 300 docs (~1e-13)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    spans = dedup.duplicated_window_spans(d, "doc_id", "text", window_tokens=8)
    return spans.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_dup_windows")
    )


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring REMOVAL (Lee et al. 2107.06499 — the cut,
    not just the count): every token covered by a non-canonical
    duplicated 8-token window is dropped and the survivors rejoin with
    single spaces, original case preserved. The oracle replays the
    whole chain — windows, corpus-wide canonical election, per-token
    coverage, reassembly — keyed by literal window strings where the
    operator uses xxhash64 (identical answers modulo a ~1e-13 64-bit
    collision, same caveat as ``dup_windows``)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = dedup.remove_duplicated_substrings(d, "doc_id", "text", window_tokens=8)
    return out.select(
        "doc_id",
        F.col("text_dedup"),
        F.size(
            F.filter(F.split(F.trim("text_dedup"), r"\s+"), lambda t: t != F.lit(""))
        ).cast("long").alias("n_kept"),
    )


SQL_DUP_SPAN_REMOVAL = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       x -> x <> '') AS t,
           list_filter(regexp_split_to_array(trim(text), '\s+'),
                       x -> x <> '') AS t_raw
    FROM documents WHERE doc_id < 300
),
wins AS (
    SELECT doc_id, u.i AS pos,
           array_to_string(list_slice(t, u.i, u.i + 7), chr(31)) AS win
    FROM toks, unnest(range(1, greatest(len(t) - 6, 1))) AS u(i)
),
marked AS (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY win) AS n_occ,
           row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
    FROM wins
),
dupstarts AS (
    SELECT doc_id, pos FROM marked WHERE n_occ >= 2 AND rn > 1
),
postoks AS (
    SELECT doc_id, u.i AS pos, t_raw[CAST(u.i AS INT)] AS tok
    FROM toks, unnest(range(1, len(t_raw) + 1)) AS u(i)
),
kept AS (
    SELECT p.doc_id, p.pos, p.tok
    FROM postoks p
    WHERE NOT EXISTS (
        SELECT 1 FROM dupstarts s
        WHERE s.doc_id = p.doc_id
          AND p.pos BETWEEN s.pos AND s.pos + 7
    )
)
SELECT t.doc_id,
       coalesce(k.text_dedup, '') AS text_dedup,
       coalesce(k.n_kept, 0) AS n_kept
FROM toks t
LEFT JOIN (
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY pos) AS text_dedup,
           count(*) AS n_kept
    FROM kept GROUP BY doc_id
) k USING (doc_id)
"""


SQL_DUP_WINDOWS = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       x -> x <> '') AS t
    FROM documents WHERE doc_id < 300
),
wins AS (
    SELECT doc_id, u.i AS pos,
           array_to_string(list_slice(t, u.i, u.i + 7), chr(31)) AS win
    FROM toks, unnest(range(1, greatest(len(t) - 6, 1))) AS u(i)
),
marked AS (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY win) AS n_occ,
           row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
    FROM wins
)
SELECT doc_id, count(*) AS n_dup_windows
FROM marked
WHERE n_occ >= 2 AND rn > 1
GROUP BY doc_id
"""


def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring: mean add-one-smoothed bigram
    log-probability per document under the corpus's own bigram LM, on a
    bounded subset (quantized at 1e-4; ln() agrees across engines far
    below that)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    scores = text.bigram_logprob_scores(d, "doc_id", "text")
    return scores.select(
        F.col("id").alias("doc_id"), qint(F.col("avg_logprob"), 4).alias("logprob_q")
    )


SQL_DOC_BIGRAM_LOGPROB = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
    FROM documents WHERE doc_id < 300
),
pairs AS (
    SELECT doc_id, t[CAST(u.i AS INT)] AS w1, t[CAST(u.i AS INT) + 1] AS w2
    FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
voc AS (SELECT count(DISTINCT w2) AS v FROM pairs),
scored AS (
    SELECT p.doc_id, ln((c12 + 1.0) / (c1 + v)) AS lp
    FROM pairs p
    JOIN bi USING (w1, w2)
    JOIN uni USING (w1)
    CROSS JOIN voc
)
SELECT doc_id, CAST(floor(avg(lp) * 10000 + 0.5) AS BIGINT) AS logprob_q
FROM scored
GROUP BY doc_id
"""


def q_lm_store_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring against a PERSISTED bigram LM
    (operators/text.write_bigram_lm / score_against_lm — the CCNet
    shape: train the LM once on a frozen reference corpus, score every
    crawl snapshot against the stored counts without re-reading
    reference text). The store roundtrip is the point of the query;
    scoring the training corpus itself makes the answer equal the
    self-trained batch scorer, so the oracle is
    ``SQL_DOC_BIGRAM_LOGPROB`` verbatim — the same
    stored-state-equals-batch-operator pattern as ``index_novelty``.
    Unseen-delta smoothing (the branch this query can't exercise) is
    pinned in tests/test_pipeline_ops.py."""
    from traceframe_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = tmp_store("bigram_lm_") + "/lm"
    T.write_bigram_lm(d, path)
    out = T.score_against_lm(d, path)
    return out.select(
        F.col("id").alias("doc_id"), qint(F.col("avg_logprob"), 4).alias("logprob_q")
    )


def q_lm_manifest_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lm_store_score`` against a MANIFEST-protocol LM store
    (operators/text.write_bigram_lm(protocol="manifest"): both count
    layers and |V| published in ONE atomic commit). The protocol must
    not change a single stored count, so the oracle is
    ``SQL_DOC_BIGRAM_LOGPROB`` verbatim — the same
    protocol-preserves-values pin as ``dedup_index_manifest``, for the
    second curation store the manifest commit covers."""
    from traceframe_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = tmp_store("bigram_lm_man_") + "/lm"
    T.write_bigram_lm(d, path, protocol="manifest")
    out = T.score_against_lm(d, path)
    return out.select(
        F.col("id").alias("doc_id"), qint(F.col("avg_logprob"), 4).alias("logprob_q")
    )


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (text.perplexity_buckets —
    Wenzek et al. 1911.00359 §4.3): stored-LM perplexity terciles per
    language, bucket 1 = most reference-like. The oracle replays the
    ENTIRE chain — tokenization, the bigram LM, add-one scoring, the
    1e-4 quantization, and the per-language ntile with id tie-breaks —
    so the corpus split is value-verified, not a distribution
    summary."""
    from traceframe_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = tmp_store("ppl_lm_") + "/lm"
    T.write_bigram_lm(d, path)
    return T.perplexity_buckets(d, path, lang_col="lang", method="exact")


# Shared LM-scoring CTE chain for the perplexity-bucket family:
# tokenize doc_id < 300, train the add-one bigram LM on the same slice
# (store == training corpus, so stored-LM scoring equals the batch
# scorer), quantize avg logprob to the 1e-4 grid.
_SQL_PPL_LP_CTES = r"""toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
    FROM documents WHERE doc_id < 300
),
pairs AS (
    SELECT doc_id, t[CAST(u.i AS INT)] AS w1, t[CAST(u.i AS INT) + 1] AS w2
    FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
voc AS (SELECT count(DISTINCT w2) AS v FROM pairs),
ppl_scored AS (
    SELECT p.doc_id, ln((c12 + 1.0) / (c1 + v)) AS lp
    FROM pairs p
    JOIN bi USING (w1, w2)
    JOIN uni USING (w1)
    CROSS JOIN voc
),
lp AS (
    SELECT doc_id, CAST(floor(avg(lp) * 10000 + 0.5) AS BIGINT) AS logprob_q
    FROM ppl_scored GROUP BY doc_id
)"""

SQL_PERPLEXITY_BUCKETS = f"""
WITH {_SQL_PPL_LP_CTES}
SELECT l.doc_id, d.lang, l.logprob_q,
       CAST(ntile(3) OVER (
           PARTITION BY d.lang ORDER BY l.logprob_q DESC, l.doc_id ASC
       ) AS BIGINT) AS bucket
FROM lp l JOIN documents d USING (doc_id)
"""


def q_perplexity_buckets_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION perplexity cut (text.perplexity_buckets
    method='sampled', the operator's default): per-language cutoffs
    from a deterministic md5 bottom-k sample, buckets by comparison —
    no per-language corpus sort anywhere in the plan. The oracle
    replays the ENTIRE chain: LM scoring + quantization, the md5
    sample keys and bottom-k selection, the ceil(b*m/n) cutoff ranks,
    and the comparison bucketing (ties head-side), so the sampled
    split is value-verified end to end, not summarized. At sf0.01 the
    300-doc slice is smaller than sample_k, making the sample the full
    population — band boundaries then sit at exact sample ranks while
    still exercising every stage of the sampled plan; the
    ``ppl_bucket_agree`` row measures sampled-vs-exact fidelity."""
    from traceframe_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = tmp_store("ppl_lm_s_") + "/lm"
    T.write_bigram_lm(d, path)
    return T.perplexity_buckets(d, path, lang_col="lang", method="sampled")


# The sampled chain replayed verbatim: `ksamp` is the md5 bottom-k per
# language (the two-pass prefix refinement in the engine provably
# selects these same rows, so the oracle skips straight to the
# selection — the percentiles_sampled precedent); `cutr` keeps one row
# per b in 1..n-1 even when ranks coincide (duplicate cutoff values
# are real cutoffs, matching the engine's collect_list).
SQL_PERPLEXITY_BUCKETS_SAMPLED = f"""
WITH {_SQL_PPL_LP_CTES},
sl AS (
    SELECT l.doc_id, d.lang, l.logprob_q,
           md5('ppl|' || l.doc_id::VARCHAR) AS h
    FROM lp l JOIN documents d USING (doc_id)
),
ksamp AS (
    SELECT lang, doc_id, logprob_q
    FROM (
        SELECT lang, doc_id, logprob_q,
               row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM sl
    ) WHERE rn <= 4096
),
ranked AS (
    SELECT lang, doc_id, logprob_q,
           row_number() OVER (
               PARTITION BY lang ORDER BY logprob_q DESC, doc_id ASC
           ) AS r,
           count(*) OVER (PARTITION BY lang) AS m
    FROM ksamp
),
cutr AS (
    SELECT g.lang, b.b, CAST(ceil(b.b * g.m / 3.0) AS INT) AS r
    FROM (SELECT DISTINCT lang, m FROM ranked) g
    CROSS JOIN (SELECT unnest([1, 2]) AS b) b
),
cuts AS (
    SELECT cutr.lang, rk.logprob_q AS c
    FROM cutr JOIN ranked rk ON rk.lang = cutr.lang AND rk.r = cutr.r
)
SELECT s.doc_id, s.lang, s.logprob_q,
       CAST(1 + sum(CASE WHEN s.logprob_q < c.c THEN 1 ELSE 0 END)
            AS BIGINT) AS bucket
FROM sl s JOIN cuts c USING (lang)
GROUP BY s.doc_id, s.lang, s.logprob_q
"""


def q_ppl_bucket_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity band-agreement instrument, value-verified
    (text.perplexity_bucket_agreement — the ann_adc_agree precedent
    for the corpus-quality tier): per document, did the sampled
    comparison cut land in the same band as the exact ntile cut? Both
    buckets come off ONE scored frame (same stored LM, same quantized
    scores), so the agreement number in SCALING.md's skew table is a
    value-checked engine property. The oracle replays both cut
    strategies and the join."""
    from traceframe_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = tmp_store("ppl_agree_") + "/lm"
    T.write_bigram_lm(d, path)
    return T.perplexity_bucket_agreement(d, path, lang_col="lang")


SQL_PPL_BUCKET_AGREE = f"""
WITH {_SQL_PPL_LP_CTES},
sl AS (
    SELECT l.doc_id, d.lang, l.logprob_q,
           md5('ppl|' || l.doc_id::VARCHAR) AS h
    FROM lp l JOIN documents d USING (doc_id)
),
ksamp AS (
    SELECT lang, doc_id, logprob_q
    FROM (
        SELECT lang, doc_id, logprob_q,
               row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM sl
    ) WHERE rn <= 4096
),
ranked AS (
    SELECT lang, doc_id, logprob_q,
           row_number() OVER (
               PARTITION BY lang ORDER BY logprob_q DESC, doc_id ASC
           ) AS r,
           count(*) OVER (PARTITION BY lang) AS m
    FROM ksamp
),
cutr AS (
    SELECT g.lang, b.b, CAST(ceil(b.b * g.m / 3.0) AS INT) AS r
    FROM (SELECT DISTINCT lang, m FROM ranked) g
    CROSS JOIN (SELECT unnest([1, 2]) AS b) b
),
cuts AS (
    SELECT cutr.lang, rk.logprob_q AS c
    FROM cutr JOIN ranked rk ON rk.lang = cutr.lang AND rk.r = cutr.r
),
samp_b AS (
    SELECT s.doc_id, s.lang, s.logprob_q,
           CAST(1 + sum(CASE WHEN s.logprob_q < c.c THEN 1 ELSE 0 END)
                AS BIGINT) AS bucket_sampled
    FROM sl s JOIN cuts c USING (lang)
    GROUP BY s.doc_id, s.lang, s.logprob_q
),
exact_b AS (
    SELECT doc_id,
           CAST(ntile(3) OVER (
               PARTITION BY lang ORDER BY logprob_q DESC, doc_id ASC
           ) AS BIGINT) AS bucket_exact
    FROM sl
)
SELECT s.doc_id, s.lang, s.logprob_q, e.bucket_exact, s.bucket_sampled,
       CAST(CASE WHEN e.bucket_exact = s.bucket_sampled
                 THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM samp_b s JOIN exact_b e USING (doc_id)
"""


def q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified layer of MinHash-LSH dedup, oracle-checked: banded
    candidate generation is xxhash64-dependent, but the OUTPUT (exact
    Jaccard ≥ 0.9 on surviving candidates) equals the full exact pair
    set wherever LSH recall is 1 — and at 16 bands of 4 rows the band
    collision probability at j ≥ 0.85 is 1 - (1 - j^4)^16 > 0.9998, so
    on this bounded subset the equality is exact (false candidates are
    removed by the verify step, so precision is always 1). The DuckDB
    oracle is the same exact pair set the ngram_jaccard query uses."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.9, bands=16)
    return dedup.carry_cache(
        pairs.select("id_a", "id_b", qint(F.col("jaccard"), 4).alias("jaccard_q")), pairs
    )


SQL_MINHASH_VERIFIED = _sql_exact_jaccard(0.9, 250)


def q_minhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw MinHash-LSH pairs with the md5-affine PORTABLE families
    (operators/dedup.minhash_signatures(portable=True) + value-keyed
    band buckets): unlike ``minhash_verified`` — which asserts equality
    with the exact pair set only where LSH recall is 1 — this query's
    oracle replays the ACTUAL LSH candidate generation (signatures →
    band keys → bucket self-join), so the answer is the raw operator's
    answer INCLUDING any recall loss, value-verified. Verification stays
    exact shingle Jaccard, same as the production operator."""
    from traceframe_spark.operators.dedup_index import _band_entries

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sigs = dedup.minhash_signatures(d, "doc_id", "text", portable=True).persist()
    be = _band_entries(sigs.select("id", "sig"), 16, 4, portable=True)
    cand = (
        be.alias("a")
        .join(be.alias("b"), ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = dedup.jaccard_verify(cand, sigs, 0.9)
    out = pairs.select(
        "id_a", "id_b", qint(F.col("jaccard"), 4).alias("jaccard_q")
    )
    from traceframe_spark.operators.dedup import _unpersist_with

    return _unpersist_with(out, sigs)


SQL_MINHASH_PORTABLE_PAIRS = f"""
WITH {_sql_jaccard_pair_ctes(0.9, 250)},
fam AS (
    SELECT i,
           ((2 * i + 1) * 1103515245) % 2147483647 AS a,
           (i * 104729 + 12345) % 2147483647 AS b
    FROM range(0, 64) t(i)
),
hashed AS (
    SELECT doc_id,
           ('0x' || substr(md5(sh), 1, 8))::BIGINT % 2147483647 AS h
    FROM shingled
),
sig AS (
    SELECT s.doc_id, f.i, min((f.a * s.h + f.b) % 2147483647) AS v
    FROM hashed s CROSS JOIN fam f GROUP BY s.doc_id, f.i
),
band AS (
    SELECT doc_id, i // 4 AS band,
           string_agg(v::VARCHAR, '-' ORDER BY i) AS bh
    FROM sig GROUP BY doc_id, i // 4
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM band a JOIN band b USING (band, bh)
    WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(floor(cm.n_common::DOUBLE / (sa.n_sh + sb.n_sh - cm.n_common) * 10000 + 0.5) AS BIGINT) AS jaccard_q
FROM cand c
JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE cm.n_common::DOUBLE / (sa.n_sh + sb.n_sh - cm.n_common) >= 0.9
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → canonical clusters: distributed connected
    components (large-star/small-star, operators/graph.py) over the
    exact 5-gram-Jaccard ≥ 0.85 pair set on a bounded doc subset. Every
    clustered doc labeled with its component's min doc_id — the form a
    keep-one dedup decision consumes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.85)
    comp = graph.connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


# Connected components as a recursive transitive closure: tractable for
# the oracle's bounded pair set; the engine's star contraction is the
# form that scales.
SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
{_sql_jaccard_pair_ctes(0.85, 150)},
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
reach AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v WHERE e.v <> r.u
)
SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
FROM reach
GROUP BY u
"""


def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full keep-one dedup decision, end to end: near-dup pairs →
    connected components → drop every doc that is not its cluster's
    canonical (min-id) representative. Singletons pass through — the
    output is the deduplicated corpus subset itself."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.85)
    comp = graph.connected_components(pairs, "id_a", "id_b")
    return graph.keep_canonical(d, "doc_id", comp).select("doc_id", "source")


SQL_DEDUP_KEEP_CANONICAL = f"""
WITH RECURSIVE
{_sql_jaccard_pair_ctes(0.85, 150)},
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
dropped AS (
    SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) <> u
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id < 150 AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production dedup (operators/dedup.dedup_pipeline):
    exact md5 dedup → MinHash-LSH near-dup pairs on the residual →
    connected components → keep-one-per-cluster, end to end on a
    bounded subset. LSH is hash-dependent but the OUTPUT is the exact
    keep-set: at t=0.9 with 16 bands of 4 rows candidate recall is
    ≈1 - 4e-8 (see minhash_verified) and the verify step makes
    precision exactly 1, so the oracle replays the same decision with
    exact text grouping + exact Jaccard + a recursive closure."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = dedup.dedup_pipeline(d, "doc_id", "text", threshold=0.9, bands=16)
    return dedup.carry_cache(out.select("doc_id", "source"), out)


SQL_DEDUP_PIPELINE = """
WITH RECURSIVE
docs0 AS (
    SELECT doc_id, lower(trim(text)) AS t, source
    FROM documents WHERE doc_id < 300
),
keep AS (
    SELECT min(doc_id) AS doc_id FROM docs0 GROUP BY t
),
docs AS (
    SELECT d.doc_id, d.t FROM docs0 d JOIN keep USING (doc_id)
),
shingled AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, substr(t, CAST(g AS INT), 5) AS sh
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS g
              FROM docs)
    )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
    FROM shingled a JOIN shingled b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT id_a, id_b
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.9
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
dropped AS (
    SELECT u AS doc_id FROM reach GROUP BY u HAVING least(u, min(v)) <> u
)
SELECT d.doc_id, d.source
FROM documents d
JOIN keep USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric cross-corpus subtraction: corpus docs near-duplicating
    any reference-side doc (exact shingle-Jaccard ≥ 0.9, LSH-routed)
    are dropped; survivors returned. Bounded subset; at t=0.9 with
    16-band/64-hash LSH the candidate recall is ≈1, so the verified
    output equals the exact cross-pair answer the oracle computes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    ref = d.filter(F.col("doc_id") % 20 == 0)
    # bands=16 (4-row bands) pins LSH miss probability at ~4e-8 for
    # pairs just over 0.9 — the auto-tuned 8x8 banding misses ~1% of
    # them, enough to diverge from the exact-pair oracle
    out = dedup.cross_near_dup_subtract(
        corpus, ref, "doc_id", "text", threshold=0.9, bands=16
    )
    return dedup.carry_cache(out.select("doc_id", "source"), out)


SQL_CROSS_DEDUP = """
WITH docs AS (
    SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id < 300
),
shingled AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, substr(t, CAST(g AS INT), 5) AS sh
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS g
              FROM docs)
    )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
    SELECT c.doc_id AS id_c, r.doc_id AS id_r, count(*) AS n_common
    FROM shingled c JOIN shingled r ON c.sh = r.sh
    WHERE c.doc_id % 20 <> 0 AND r.doc_id % 20 = 0
    GROUP BY 1, 2
),
dropped AS (
    SELECT DISTINCT id_c
    FROM common
    JOIN sizes sc ON sc.doc_id = id_c
    JOIN sizes sr ON sr.doc_id = id_r
    WHERE n_common::DOUBLE / (sc.n_sh + sr.n_sh - n_common) >= 0.9
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id < 300 AND d.doc_id % 20 <> 0
  AND d.doc_id NOT IN (SELECT id_c FROM dropped)
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 20th doc plays the held-out
    benchmark; the rest of the corpus is scored for distinct word
    3-gram overlap against it (13-grams in production; 3 here so the
    synthetic word-salad corpus produces nonzero hits to pin)."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    out = text.contamination(corpus, bench, n=3)
    return out.select(
        "doc_id",
        "n_grams",
        "n_hit",
        qint(F.col("overlap"), 6).alias("overlap_q"),
    )


SQL_CONTAMINATION = r"""
WITH words AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(w[g:g+2], ' ') AS g
    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS g FROM words)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 20 <> 0),
per_doc AS (
    SELECT c.doc_id,
           count(*) AS n_grams,
           count(b.g) AS n_hit
    FROM corpus c LEFT JOIN bench b ON c.g = b.g
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(floor(coalesce(n_hit::DOUBLE / n_grams, 0.0) * 1000000 + 0.5) AS BIGINT) AS overlap_q
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
WHERE d.doc_id % 20 <> 0
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token chunks with 8-token overlap
    (production sizes are 10-100×; small here so the synthetic docs
    produce multi-chunk output to pin)."""
    d = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(d, chunk_tokens=32, overlap=8)


SQL_DOC_CHUNKS = r"""
WITH words AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
    FROM documents
),
idx AS (
    SELECT doc_id, w,
           unnest(range(0, greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1))) AS g
    FROM words
)
SELECT doc_id,
       g AS chunk_id,
       -- coalesce for NULL text: the engine's size()/concat_ws yield
       -- 0/'' where a NULL array would yield NULL/NULL here
       CAST(coalesce(len(w[g*24+1 : g*24+32]), 0) AS BIGINT) AS n_chunk_tokens,
       coalesce(array_to_string(w[g*24+1 : g*24+32], ' '), '') AS chunk_text
FROM idx
"""


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution entropy per document (gibberish/boilerplate
    signal), against DuckDB's native base-2 ``entropy()`` aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", qint(text.token_entropy(F.col("text")), 4).alias("entropy_q")
    )


SQL_DOC_ENTROPY = r"""
-- LEFT JOIN back to documents: a NULL-text doc unnests to zero rows and
-- would vanish, where the engine emits entropy 0 for it
SELECT d.doc_id,
       CAST(coalesce(e.entropy_q, 0) AS BIGINT) AS entropy_q
FROM documents d
LEFT JOIN (
    SELECT doc_id,
           CAST(floor(entropy(tok) * 10000 + 0.5) AS BIGINT) AS entropy_q
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents
    )
    GROUP BY doc_id
) e ON d.doc_id = e.doc_id
"""


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of ``documents``, restricted to its
    deterministic metrics (the HLL approx_distinct is engine-specific
    and stays test-pinned): null counts, numeric min/max/mean, string
    length stats, and the anchoring row count."""
    from traceframe_spark.operators.profile import column_profile

    d = load_table(spark, sf_dir, "documents")
    return (
        column_profile(d)
        .filter(F.col("metric") != "approx_distinct")
        .select("column", "metric", qint(F.col("value"), 4).alias("value_q"))
    )


def _sql_column_profile() -> str:
    """Oracle for q_column_profile: the same metrics as stacked
    aggregate selects over the documents columns."""
    numeric = ["doc_id", "n_chars"]
    strings = ["text", "lang", "source"]
    rows = ["SELECT '*' AS \"column\", 'n_rows' AS metric, count(*)::DOUBLE AS v FROM documents"]
    for c in numeric + strings:
        rows.append(
            f"SELECT '{c}', 'n_null', sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::DOUBLE FROM documents"
        )
    for c in numeric:
        for m, fn in [("min", "min"), ("max", "max"), ("mean", "avg")]:
            rows.append(f"SELECT '{c}', '{m}', {fn}({c})::DOUBLE FROM documents")
    for c in strings:
        for m, fn in [("min_len", "min"), ("max_len", "max"), ("mean_len", "avg")]:
            rows.append(f"SELECT '{c}', '{m}', {fn}(len({c}))::DOUBLE FROM documents")
    union = "\nUNION ALL\n".join(rows)
    return (
        "SELECT \"column\", metric, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS value_q\n"
        f"FROM ({union})"
    )


SQL_COLUMN_PROFILE = _sql_column_profile()


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals per document, quantized for the hash."""
    d = load_table(spark, sf_dir, "documents")
    s = text.quality_signals(F.col("text"))
    return d.select(
        "doc_id",
        s["n_tokens"].alias("n_tokens"),
        qint(s["mean_word_len"], 4).alias("mean_word_len_q"),
        qint(s["punct_ratio"], 4).alias("punct_ratio_q"),
        qint(text.quality_score(F.col("text")), 4).alias("quality_q"),
    )


SQL_DOC_QUALITY = r"""
WITH sig AS (
    SELECT doc_id,
           len(trim(text))::DOUBLE AS n_char,
           len(regexp_split_to_array(lower(trim(text)), '\s+'))::DOUBLE AS n_tok,
           (len(trim(text)) - len(regexp_replace(trim(text), '[[:punct:]]', '', 'g')))::DOUBLE AS n_punct,
           (len(trim(text)) - len(regexp_replace(trim(text), '[0-9]', '', 'g')))::DOUBLE AS n_digit
    FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(floor(n_char / greatest(n_tok, 1.0) * 10000 + 0.5) AS BIGINT) AS mean_word_len_q,
       CAST(floor(n_punct / greatest(n_char, 1.0) * 10000 + 0.5) AS BIGINT) AS punct_ratio_q,
       CAST(floor((
            least(n_tok / 20.0, 1.0) * 0.4
            + (CASE WHEN n_char / greatest(n_tok, 1.0) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2
            + (1.0 - least(n_punct / greatest(n_char, 1.0) * 4.0, 1.0)) * 0.2
            + (1.0 - least(n_digit / greatest(n_char, 1.0) * 4.0, 1.0)) * 0.2
       ) * 10000 + 0.5) AS BIGINT) AS quality_q
FROM sig
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language guess per document."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", text.lang_id(F.col("text")).alias("lang_guess"))


def _sql_stop_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
        f" x -> x IN ({words})))"
    )


SQL_DOC_LANG_ID = f"""
WITH scores AS (
    SELECT doc_id,
           {_sql_stop_count('en')} AS s_en,
           {_sql_stop_count('de')} AS s_de,
           {_sql_stop_count('fr')} AS s_fr,
           {_sql_stop_count('es')} AS s_es,
           {_sql_stop_count('it')} AS s_it
    FROM documents
)
SELECT doc_id,
       CASE
         -- NULL text: every score is NULL, every WHEN is NULL, and the
         -- bare ELSE would answer 'it' where the engine answers 'und'
         WHEN greatest(s_en, s_de, s_fr, s_es, s_it) IS NULL THEN 'und'
         WHEN greatest(s_en, s_de, s_fr, s_es, s_it) = 0 THEN 'und'
         WHEN s_en >= greatest(s_de, s_fr, s_es, s_it) THEN 'en'
         WHEN s_de >= greatest(s_fr, s_es, s_it) THEN 'de'
         WHEN s_fr >= greatest(s_es, s_it) THEN 'fr'
         WHEN s_es >= s_it THEN 'es'
         ELSE 'it'
       END AS lang_guess
FROM scores
"""


# ------------------------------------------------------------- rows-only
# (engine-hash-dependent; pinned by pytest fixtures, driver records rows)


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated word-bigram ratio per document — the boilerplate /
    degenerate-generation signal curation pipelines threshold on."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", qint(text.repetition_ratio(F.col("text"), 2), 4).alias("rep_q")
    )


SQL_DOC_REPETITION = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents
),
grams AS (
    SELECT doc_id,
           array_to_string(list_slice(t, CAST(g AS INT), CAST(g AS INT) + 1), ' ') AS gram
    FROM (SELECT doc_id, t,
                 unnest(range(1, greatest(len(t) - 1, 1) + 1)) AS g
          FROM toks)
)
SELECT doc_id,
       -- count(gram) skips the NULL gram a NULL-text doc produces; the
       -- nullif/coalesce pair makes its repetition 0 like the engine
       CAST(floor(coalesce(1.0 - count(DISTINCT gram)::DOUBLE
                           / nullif(count(gram), 0)::DOUBLE, 0.0) * 10000 + 0.5) AS BIGINT) AS rep_q
FROM grams GROUP BY doc_id
"""


def q_doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction, oracle-checked end to end. The corpus
    is synthetic and PII-free, so the query plants deterministic PII
    derived from doc_id (same expression in the DuckDB oracle) — the
    counts and the redacted string must then agree exactly, pinning
    both the patterns and the replace semantics across engines."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" tel +15550123456")).otherwise(F.lit("")),
    )
    c = text.pii_counts(planted)
    return d.select(
        "doc_id",
        c["email"].alias("n_email"),
        c["ipv4"].alias("n_ipv4"),
        c["phone"].alias("n_phone"),
        text.redact_pii(planted).alias("redacted"),
    )


SQL_DOC_PII = r"""
WITH planted AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.0.'
                || CAST(doc_id % 256 AS VARCHAR)
                || (CASE WHEN doc_id % 3 = 0 THEN ' tel +15550123456' ELSE '' END) AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '\+\d{7,15}\b')) AS BIGINT) AS n_phone,
       regexp_replace(
           regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g'),
           '\+\d{7,15}\b', '[PHONE]', 'g') AS redacted
FROM planted
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing for training dataloaders: docs in
    doc_id order fill 512-token sequences by prefix-sum assignment."""
    d = load_table(spark, sf_dir, "documents")
    return text.pack_sequences(d, "doc_id", "text", budget=512)


SQL_PACK_SEQUENCES = r"""
WITH t AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
    FROM documents
),
p AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prefix_tokens
    FROM t
)
SELECT doc_id, n_tokens, prefix_tokens,
       CAST(prefix_tokens // 512 AS BIGINT) AS seq_id,
       CAST(prefix_tokens % 512 AS BIGINT) AS offset_in_seq
FROM p
"""


def q_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with nprobe = n_centroids (probe every inverted list):
    candidate generation degenerates to the full corpus, so the result
    must EQUAL brute force — which pins the hash-free parts of the IVF
    machinery (centroid assignment, list routing, re-rank, tie-breaks)
    against the same DuckDB brute-force oracle ann_cosine_topk uses.
    The pruned variant (ann_ivf_topk) stays rows-only + recall-tested."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        e, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=8,
        centroids=_ivf_centroids(spark, sf_dir, 8),
    )


def q_ann_ivf_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_ivf_exhaustive`` through a PERSISTED MANIFEST-protocol IVF
    index (write_ivf_index(protocol="manifest"): inverted lists AND
    centroids in ONE atomic commit; probes resolve one manifest and
    read only the probed lists' directories). nprobe = n_centroids, so
    the answer must EQUAL brute force — the oracle is the same DuckDB
    brute-force SQL, which pins BOTH the protocol (store roundtrip
    preserves every vector) and the hash-free IVF machinery, for the
    fifth store the manifest commit covers (rollup/HLL, dedup index,
    gram layer, LM, IVF)."""
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    path = tmp_store("ivf_man_") + "/ivf"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding",
        centroids=_ivf_centroids(spark, sf_dir, 8), protocol="manifest",
    )
    return similarity.ivf_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=5, nprobe=8
    )


def q_ivf_id_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The id-level membership probe the embed stream's exactly-once
    guard runs per batch (similarity.ivf_id_hits): build a manifest
    IVF index over the corpus, probe a mixed id set — half stored,
    half never seen — and return the confirmed hits. The chain under
    test is Bloom sidecar (definitely-absent proof, xxhash — rows the
    oracle can't replay) THEN the cid-column confirm scan; the ANSWER
    is pure membership, so the oracle pins it exactly: a probed id is
    a hit iff the corpus holds it. A store that lost rows, a bloom
    with a false NEGATIVE, or a confirm join gone wrong all break the
    value match."""
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    path = tmp_store("ivf_ids_") + "/ivf"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding",
        centroids=_ivf_centroids(spark, sf_dir, 8), protocol="manifest",
    )
    probe = e.filter(F.col("vec_id") < 25).select("vec_id").unionByName(
        spark.range(900_000, 900_025).select(F.col("id").alias("vec_id"))
    )
    return similarity.ivf_id_hits(spark, path, probe, "vec_id")


SQL_IVF_ID_MEMBERSHIP = """
SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 25
"""


SQL_EMBED_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) AS BIGINT) AS cosine_q
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.9)
    return dedup.carry_cache(
        pairs.select("id_a", "id_b", qint(F.col("jaccard"), 4).alias("jaccard_q")), pairs
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=14)


def q_simhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SimHash near-dup pairs with the md5-derived PORTABLE bit
    families (operators/dedup.simhash_near_dup_pairs(portable=True)):
    the oracle replays the ACTUAL chain — per-shingle vote bits from
    md5 halves → 64 vote sums → sign fingerprint → 4×16-bit pigeonhole
    block keys → bucket self-join → exact hamming ≤ cutoff — so the
    answer is the raw operator's answer INCLUDING any recall loss,
    value-verified (closes the last rows-only dedup path; the xxhash64
    default stays the production fast path, recall-pinned in
    tests/test_dedup.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return dedup.simhash_near_dup_pairs(
        d, "doc_id", "text", max_hamming=14, portable=True
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# Bit 63's place value is MIN_LONG: DuckDB's `<<` raises on 1<<63, so
# the signed value is spelled literally; everything else is plain
# shift/mask arithmetic identical in both engines (h1/h2 < 2^32).
SQL_SIMHASH_PORTABLE_PAIRS = """
WITH docs AS (
    SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id < 250
),
shingled AS (
    SELECT DISTINCT doc_id, substr(t, CAST(g AS INT), 4) AS sh
    FROM (SELECT doc_id, t,
                 unnest(range(1, greatest(len(t) - 3, 1) + 1)) AS g
          FROM docs)
),
hashed AS (
    SELECT doc_id,
           ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h1,
           ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h2
    FROM shingled
),
votes AS (
    SELECT doc_id, i,
           sum(((CASE WHEN i < 32 THEN h1 >> i
                      ELSE h2 >> (i - 32) END) & 1) * 2 - 1) AS v
    FROM hashed CROSS JOIN range(0, 64) t(i)
    GROUP BY doc_id, i
),
fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v <= 0 THEN 0
                         WHEN i = 63 THEN -9223372036854775808
                         ELSE 1::BIGINT << CAST(i AS INT) END) AS BIGINT) AS fp
    FROM votes GROUP BY doc_id
),
keyed AS (
    SELECT doc_id, fp, b AS block,
           (fp >> (16 * CAST(b AS INT))) & 65535 AS key
    FROM fp CROSS JOIN range(0, 4) t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.fp AS fa, b.fp AS fb
    FROM keyed a JOIN keyed b USING (block, key)
    WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(fa, fb)) <= 14
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.hyperplane_lsh_topk(e, q, "vec_id", "embedding", k=5, dim=64)


def q_ann_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k with the md5-derived ±1 PORTABLE planes
    (operators/similarity.hyperplane_lsh_topk(portable=True)): the
    oracle replays the ACTUAL approximate chain — 10^-6 quantized
    embeddings → 16 integer sign dots → 4×4-bit band keys → bucket
    join → exact quantized-cosine re-rank with the cid tie-break — so
    the answer is the raw LSH operator's answer INCLUDING any recall
    loss, value-verified (the Gaussian-plane default ``ann_lsh_topk``
    stays rows-only + recall-tested, twinned by this query). Operating
    point: 6 bands of 4 bits — the same band width as the default's
    4×4, with two extra probes because a SINGLE ±1 family has higher
    recall variance than a resampleable Gaussian one (measured 0.32 at
    16 planes vs 0.52 at 24 on the weakly-clustered synthetic corpus;
    a production corpus with real cluster structure needs fewer)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.hyperplane_lsh_topk(
        e, q, "vec_id", "embedding", k=5, dim=64, n_planes=24, bands=6,
        portable=True,
    )


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane LSH (Lv et al. VLDB'07) on the portable
    planes: per band, the query also probes every bucket one sign-flip
    away — query-side-only expansion, measured recall 0.32 → 0.86 at
    16 planes/4 bands (operators/similarity.hyperplane_lsh_topk
    docstring). The oracle replays the probe expansion (exact band keys
    UNION their 1-bit xor perturbations) plus the whole portable chain,
    so the recall improvement itself is value-verified, not asserted."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.hyperplane_lsh_topk(
        e, q, "vec_id", "embedding", k=5, dim=64, n_planes=16, bands=4,
        portable=True, multiprobe=True,
    )


SQL_ANN_LSH_MULTIPROBE = """
WITH w AS (
    SELECT i, j,
           CASE WHEN ('0x' || substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 8))::BIGINT & 1 = 1
                THEN 1 ELSE -1 END AS wt
    FROM range(0, 16) a(i) CROSS JOIN range(0, 64) b(j)
),
q AS (
    SELECT vec_id, j,
           CAST(floor(CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
    FROM embeddings CROSS JOIN range(0, 64) t(j)
),
dots AS (
    SELECT q.vec_id, w.i, sum(q.qv * w.wt) AS dot
    FROM q JOIN w ON w.j = q.j
    GROUP BY 1, 2
),
sig AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS sig
    FROM dots GROUP BY vec_id
),
keyed AS (
    SELECT vec_id, b AS band, (sig >> (4 * CAST(b AS INT))) & 15 AS key
    FROM sig CROSS JOIN range(0, 4) t(b)
),
qkeys AS (
    SELECT vec_id, band, key FROM keyed WHERE vec_id < 10
    UNION
    SELECT vec_id, band, xor(key, 1::BIGINT << CAST(j AS INT)) AS key
    FROM keyed CROSS JOIN range(0, 4) r(j)
    WHERE vec_id < 10
),
cand AS (
    SELECT DISTINCT qk.vec_id AS qid, kc.vec_id AS cid
    FROM qkeys qk JOIN keyed kc USING (band, key)
    WHERE kc.vec_id <> qk.vec_id
),
norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY vec_id
),
pairdots AS (
    SELECT qid, cid, sum(qv * cv) AS dot
    FROM (
        SELECT cand.qid, cand.cid,
               CAST(unnest(eq.embedding) AS DOUBLE) AS qv,
               CAST(unnest(ec.embedding) AS DOUBLE) AS cv
        FROM cand
        JOIN embeddings eq ON eq.vec_id = cand.qid
        JOIN embeddings ec ON ec.vec_id = cand.cid
    )
    GROUP BY qid, cid
),
scored AS (
    SELECT d.qid, d.cid,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM pairdots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
)
SELECT qid, cid, cos, rn
FROM (
    SELECT qid, cid, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
    FROM scored
) WHERE rn <= 5
"""


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/similarity.bitext_mine_best,
    Artetxe & Schwenk arXiv:1811.01136 ratio margin) between two
    disjoint embedding slices standing in for two languages' sentence
    embeddings: per src vector, the argmax-margin tgt candidate. The
    oracle replays the whole chain — quantized cross cosines, both
    directions' top-k means (cosine symmetry lets one scored-pair table
    serve both), the margin ratio, and the deterministic argmax."""
    e = load_table(spark, sf_dir, "embeddings")
    src = e.filter(F.col("vec_id") < 25)
    tgt = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 125))
    return similarity.bitext_mine_best(src, tgt, "vec_id", "embedding", k=4)


SQL_BITEXT_MINE = """
WITH norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY vec_id
),
dots AS (
    SELECT qid, cid, sum(qv * cv) AS dot
    FROM (
        SELECT s.vec_id AS qid, t.vec_id AS cid,
               CAST(unnest(s.embedding) AS DOUBLE) AS qv,
               CAST(unnest(t.embedding) AS DOUBLE) AS cv
        FROM embeddings s, embeddings t
        WHERE s.vec_id < 25 AND t.vec_id >= 100 AND t.vec_id < 125
    )
    GROUP BY qid, cid
),
cosq AS (
    SELECT d.qid, d.cid,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
),
ftop AS (
    SELECT * FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
        FROM cosq
    ) WHERE rn <= 4
),
btop AS (
    SELECT * FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY cid ORDER BY cos DESC, qid ASC) AS rn
        FROM cosq
    ) WHERE rn <= 4
),
mf AS (SELECT qid, avg(cos) AS mf FROM ftop GROUP BY qid),
mb AS (SELECT cid, avg(cos) AS mb FROM btop GROUP BY cid),
scored AS (
    SELECT f.qid, f.cid, 2.0 * f.cos / (mf.mf + mb.mb) AS margin
    FROM ftop f JOIN mf ON mf.qid = f.qid JOIN mb ON mb.cid = f.cid
)
SELECT qid AS src_id, cid AS tgt_id,
       CAST(floor(margin * 10000 + 0.5) AS BIGINT) AS margin_q
FROM (
    SELECT qid, cid, margin,
           row_number() OVER (PARTITION BY qid ORDER BY margin DESC, cid ASC) AS rn
    FROM scored
) WHERE rn = 1
"""


def q_bitext_mine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus×corpus bitext mining over the ANN tier
    (operators/similarity.bitext_mine_ann): both directions' top-k come
    from portable multi-probe hyperplane LSH — bucket join + bounded
    re-rank per side, no broadcast cross scoring — and the margin
    algebra (bitext_margin_from_topk) is unchanged from the exact tier.
    This is the 100 TB mining composition (two languages' crawl
    snapshots, both sides large); ``bitext_mine`` stays the exact
    verification baseline. The oracle replays the ENTIRE approximate
    chain — md5 ±1 planes, integer sign dots, band keys, the 1-bit
    multiprobe expansion per direction, quantized-cosine re-rank, kNN
    means, margin argmax — so the mined pairs are value-verified
    INCLUDING every recall effect of the ANN tier."""
    e = load_table(spark, sf_dir, "embeddings")
    src = e.filter(F.col("vec_id") < 25)
    tgt = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 125))
    return similarity.bitext_mine_ann(
        src, tgt, "vec_id", "embedding", k=4, tier="lsh",
        n_planes=16, bands=4, portable=True, multiprobe=True,
    )


# Replays bitext_mine_ann's actual chain: the portable-LSH candidate
# generation PER DIRECTION (probe expansion is query-side only, so the
# fwd and bwd candidate sets are NOT transposes of each other), cosines
# computed once per unordered pair (cos symmetry), then the exact-tier
# margin algebra over the two approximate top-k frames.
SQL_BITEXT_MINE_ANN = """
WITH w AS (
    SELECT i, j,
           CASE WHEN ('0x' || substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 8))::BIGINT & 1 = 1
                THEN 1 ELSE -1 END AS wt
    FROM range(0, 16) a(i) CROSS JOIN range(0, 64) b(j)
),
vecs AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE vec_id < 25 OR (vec_id >= 100 AND vec_id < 125)
),
q AS (
    SELECT vec_id, j,
           CAST(floor(CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
    FROM vecs CROSS JOIN range(0, 64) t(j)
),
dots AS (
    SELECT q.vec_id, w.i, sum(q.qv * w.wt) AS dot
    FROM q JOIN w ON w.j = q.j
    GROUP BY 1, 2
),
sig AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS sig
    FROM dots GROUP BY vec_id
),
keyed AS (
    SELECT vec_id, b AS band, (sig >> (4 * CAST(b AS INT))) & 15 AS key
    FROM sig CROSS JOIN range(0, 4) t(b)
),
skeys AS (
    SELECT vec_id, band, key FROM keyed WHERE vec_id < 25
    UNION
    SELECT vec_id, band, xor(key, 1::BIGINT << CAST(j AS INT)) AS key
    FROM keyed CROSS JOIN range(0, 4) r(j)
    WHERE vec_id < 25
),
tkeys AS (
    SELECT vec_id, band, key FROM keyed WHERE vec_id >= 100
    UNION
    SELECT vec_id, band, xor(key, 1::BIGINT << CAST(j AS INT)) AS key
    FROM keyed CROSS JOIN range(0, 4) r(j)
    WHERE vec_id >= 100
),
cand_f AS (
    SELECT DISTINCT sk.vec_id AS sid, kc.vec_id AS tid
    FROM skeys sk JOIN keyed kc USING (band, key)
    WHERE kc.vec_id >= 100
),
cand_b AS (
    SELECT DISTINCT tk.vec_id AS tid, kc.vec_id AS sid
    FROM tkeys tk JOIN keyed kc USING (band, key)
    WHERE kc.vec_id < 25
),
pairs AS (
    SELECT sid, tid FROM cand_f UNION SELECT sid, tid FROM cand_b
),
norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM vecs)
    GROUP BY vec_id
),
pairdots AS (
    SELECT sid, tid, sum(sv * tv) AS dot
    FROM (
        SELECT pairs.sid, pairs.tid,
               CAST(unnest(es.embedding) AS DOUBLE) AS sv,
               CAST(unnest(et.embedding) AS DOUBLE) AS tv
        FROM pairs
        JOIN vecs es ON es.vec_id = pairs.sid
        JOIN vecs et ON et.vec_id = pairs.tid
    )
    GROUP BY sid, tid
),
cosq AS (
    SELECT d.sid, d.tid,
           CAST(floor(d.dot / (ns.nrm * nt.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM pairdots d
    JOIN norms ns ON ns.vec_id = d.sid
    JOIN norms nt ON nt.vec_id = d.tid
),
ftop AS (
    SELECT * FROM (
        SELECT c.sid, c.tid, cq.cos,
               row_number() OVER (PARTITION BY c.sid ORDER BY cq.cos DESC, c.tid ASC) AS rn
        FROM cand_f c JOIN cosq cq ON cq.sid = c.sid AND cq.tid = c.tid
    ) WHERE rn <= 4
),
btop AS (
    SELECT * FROM (
        SELECT c.tid, c.sid, cq.cos,
               row_number() OVER (PARTITION BY c.tid ORDER BY cq.cos DESC, c.sid ASC) AS rn
        FROM cand_b c JOIN cosq cq ON cq.sid = c.sid AND cq.tid = c.tid
    ) WHERE rn <= 4
),
mf AS (SELECT sid, avg(cos) AS mf FROM ftop GROUP BY sid),
mb AS (SELECT tid, avg(cos) AS mb FROM btop GROUP BY tid),
scored AS (
    SELECT f.sid, f.tid, 2.0 * f.cos / (mf.mf + mb.mb) AS margin
    FROM ftop f JOIN mf ON mf.sid = f.sid JOIN mb ON mb.tid = f.tid
)
SELECT sid AS src_id, tid AS tgt_id,
       CAST(floor(margin * 10000 + 0.5) AS BIGINT) AS margin_q
FROM (
    SELECT sid, tid, margin,
           row_number() OVER (PARTITION BY sid ORDER BY margin DESC, tid ASC) AS rn
    FROM scored
) WHERE rn = 1
"""


def q_bitext_ann_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitext recall instrument itself, value-verified
    (operators/similarity.bitext_ann_agreement): per src vector, did
    the ANN tier (portable multi-probe LSH) mine the SAME tgt as the
    exact tier? Output (src_id, tgt_exact, tgt_ann, agree). The oracle
    runs BOTH chains — the exact broadcast cross scoring and the full
    approximate LSH chain — off ONE shared scored-pair table (the ANN
    candidate pairs are a subset of the exact cross product, and both
    tiers re-rank on the same raw-embedding 1e-4 cosine grid), then
    left-joins the two argmaxes. So the agreement numbers in
    SCALING.md's lever table are a value-checked property, not a
    sampled estimate."""
    e = load_table(spark, sf_dir, "embeddings")
    src = e.filter(F.col("vec_id") < 25)
    tgt = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 125))
    return similarity.bitext_ann_agreement(
        src, tgt, "vec_id", "embedding", k=4, tier="lsh",
        n_planes=16, bands=4, portable=True, multiprobe=True,
    )


# Both tiers' argmaxes from ONE scored-pair table: the ANN candidates
# are a subset of the exact src x tgt cross product and both re-rank on
# the same quantized-cosine grid, so cosq is computed once and each
# chain's top-k just filters it (exact: no filter; ANN: its per-
# direction candidate sets, probe expansion included).
SQL_BITEXT_ANN_AGREE = """
WITH w AS (
    SELECT i, j,
           CASE WHEN ('0x' || substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 8))::BIGINT & 1 = 1
                THEN 1 ELSE -1 END AS wt
    FROM range(0, 16) a(i) CROSS JOIN range(0, 64) b(j)
),
vecs AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE vec_id < 25 OR (vec_id >= 100 AND vec_id < 125)
),
q AS (
    SELECT vec_id, j,
           CAST(floor(CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
    FROM vecs CROSS JOIN range(0, 64) t(j)
),
dots AS (
    SELECT q.vec_id, w.i, sum(q.qv * w.wt) AS dot
    FROM q JOIN w ON w.j = q.j
    GROUP BY 1, 2
),
sig AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS sig
    FROM dots GROUP BY vec_id
),
keyed AS (
    SELECT vec_id, b AS band, (sig >> (4 * CAST(b AS INT))) & 15 AS key
    FROM sig CROSS JOIN range(0, 4) t(b)
),
skeys AS (
    SELECT vec_id, band, key FROM keyed WHERE vec_id < 25
    UNION
    SELECT vec_id, band, xor(key, 1::BIGINT << CAST(j AS INT)) AS key
    FROM keyed CROSS JOIN range(0, 4) r(j)
    WHERE vec_id < 25
),
tkeys AS (
    SELECT vec_id, band, key FROM keyed WHERE vec_id >= 100
    UNION
    SELECT vec_id, band, xor(key, 1::BIGINT << CAST(j AS INT)) AS key
    FROM keyed CROSS JOIN range(0, 4) r(j)
    WHERE vec_id >= 100
),
cand_f AS (
    SELECT DISTINCT sk.vec_id AS sid, kc.vec_id AS tid
    FROM skeys sk JOIN keyed kc USING (band, key)
    WHERE kc.vec_id >= 100
),
cand_b AS (
    SELECT DISTINCT tk.vec_id AS tid, kc.vec_id AS sid
    FROM tkeys tk JOIN keyed kc USING (band, key)
    WHERE kc.vec_id < 25
),
e_pairs AS (
    SELECT s.vec_id AS sid, t.vec_id AS tid
    FROM vecs s, vecs t
    WHERE s.vec_id < 25 AND t.vec_id >= 100
),
norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM vecs)
    GROUP BY vec_id
),
pairdots AS (
    SELECT sid, tid, sum(sv * tv) AS dot
    FROM (
        SELECT e_pairs.sid, e_pairs.tid,
               CAST(unnest(es.embedding) AS DOUBLE) AS sv,
               CAST(unnest(et.embedding) AS DOUBLE) AS tv
        FROM e_pairs
        JOIN vecs es ON es.vec_id = e_pairs.sid
        JOIN vecs et ON et.vec_id = e_pairs.tid
    )
    GROUP BY sid, tid
),
cosq AS (
    SELECT d.sid, d.tid,
           CAST(floor(d.dot / (ns.nrm * nt.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM pairdots d
    JOIN norms ns ON ns.vec_id = d.sid
    JOIN norms nt ON nt.vec_id = d.tid
),
e_ftop AS (
    SELECT * FROM (
        SELECT sid, tid, cos,
               row_number() OVER (PARTITION BY sid ORDER BY cos DESC, tid ASC) AS rn
        FROM cosq
    ) WHERE rn <= 4
),
e_btop AS (
    SELECT * FROM (
        SELECT sid, tid, cos,
               row_number() OVER (PARTITION BY tid ORDER BY cos DESC, sid ASC) AS rn
        FROM cosq
    ) WHERE rn <= 4
),
e_mf AS (SELECT sid, avg(cos) AS mf FROM e_ftop GROUP BY sid),
e_mb AS (SELECT tid, avg(cos) AS mb FROM e_btop GROUP BY tid),
e_scored AS (
    SELECT f.sid, f.tid, 2.0 * f.cos / (mf.mf + mb.mb) AS margin
    FROM e_ftop f JOIN e_mf mf ON mf.sid = f.sid JOIN e_mb mb ON mb.tid = f.tid
),
e_best AS (
    SELECT sid AS src_id, tid AS tgt_exact
    FROM (
        SELECT sid, tid,
               row_number() OVER (PARTITION BY sid ORDER BY margin DESC, tid ASC) AS rn
        FROM e_scored
    ) WHERE rn = 1
),
a_ftop AS (
    SELECT * FROM (
        SELECT c.sid, c.tid, cq.cos,
               row_number() OVER (PARTITION BY c.sid ORDER BY cq.cos DESC, c.tid ASC) AS rn
        FROM cand_f c JOIN cosq cq ON cq.sid = c.sid AND cq.tid = c.tid
    ) WHERE rn <= 4
),
a_btop AS (
    SELECT * FROM (
        SELECT c.tid, c.sid, cq.cos,
               row_number() OVER (PARTITION BY c.tid ORDER BY cq.cos DESC, c.sid ASC) AS rn
        FROM cand_b c JOIN cosq cq ON cq.sid = c.sid AND cq.tid = c.tid
    ) WHERE rn <= 4
),
a_mf AS (SELECT sid, avg(cos) AS mf FROM a_ftop GROUP BY sid),
a_mb AS (SELECT tid, avg(cos) AS mb FROM a_btop GROUP BY tid),
a_scored AS (
    SELECT f.sid, f.tid, 2.0 * f.cos / (mf.mf + mb.mb) AS margin
    FROM a_ftop f JOIN a_mf mf ON mf.sid = f.sid JOIN a_mb mb ON mb.tid = f.tid
),
a_best AS (
    SELECT sid AS src_id, tid AS tgt_ann
    FROM (
        SELECT sid, tid,
               row_number() OVER (PARTITION BY sid ORDER BY margin DESC, tid ASC) AS rn
        FROM a_scored
    ) WHERE rn = 1
)
SELECT e.src_id, e.tgt_exact, a.tgt_ann,
       CAST(CASE WHEN a.tgt_ann = e.tgt_exact THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM e_best e LEFT JOIN a_best a USING (src_id)
"""


# The integer dot products make the sign decision exact in both engines;
# the re-rank reuses SQL_ANN_COSINE_TOPK's quantized-cosine shape
# restricted to the LSH candidate set.
SQL_ANN_LSH_PORTABLE = """
WITH w AS (
    SELECT i, j,
           CASE WHEN ('0x' || substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 8))::BIGINT & 1 = 1
                THEN 1 ELSE -1 END AS wt
    FROM range(0, 24) a(i) CROSS JOIN range(0, 64) b(j)
),
q AS (
    SELECT vec_id, j,
           CAST(floor(CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
    FROM embeddings CROSS JOIN range(0, 64) t(j)
),
dots AS (
    SELECT q.vec_id, w.i, sum(q.qv * w.wt) AS dot
    FROM q JOIN w ON w.j = q.j
    GROUP BY 1, 2
),
sig AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN dot > 0 THEN 1::BIGINT << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS sig
    FROM dots GROUP BY vec_id
),
keyed AS (
    SELECT vec_id, b AS band, (sig >> (4 * CAST(b AS INT))) & 15 AS key
    FROM sig CROSS JOIN range(0, 6) t(b)
),
cand AS (
    SELECT DISTINCT kq.vec_id AS qid, kc.vec_id AS cid
    FROM keyed kq JOIN keyed kc USING (band, key)
    WHERE kq.vec_id < 10 AND kc.vec_id <> kq.vec_id
),
norms AS (
    SELECT vec_id, sqrt(sum(v * v)) AS nrm
    FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
    GROUP BY vec_id
),
pairdots AS (
    SELECT qid, cid, sum(qv * cv) AS dot
    FROM (
        SELECT cand.qid, cand.cid,
               CAST(unnest(eq.embedding) AS DOUBLE) AS qv,
               CAST(unnest(ec.embedding) AS DOUBLE) AS cv
        FROM cand
        JOIN embeddings eq ON eq.vec_id = cand.qid
        JOIN embeddings ec ON ec.vec_id = cand.cid
    )
    GROUP BY qid, cid
),
scored AS (
    SELECT d.qid, d.cid,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos
    FROM pairdots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
)
SELECT qid, cid, cos, rn
FROM (
    SELECT qid, cid, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
    FROM scored
) WHERE rn <= 5
"""


# Training is deterministic per (table, params), so the IVF queries share
# one driver-side k-means run per process instead of re-training on
# every query build (the pruned and exhaustive variants use the same
# index; a real deployment persists the centroids next to the table).
_IVF_CENTROIDS: dict[tuple, list] = {}


def _ivf_centroids(spark: SparkSession, sf_dir: str, n_centroids: int) -> list:
    key = (sf_dir, n_centroids)
    if key not in _IVF_CENTROIDS:
        e = load_table(spark, sf_dir, "embeddings")
        _IVF_CENTROIDS[key] = similarity.train_ivf_centroids(
            e, "vec_id", "embedding", n_centroids=n_centroids
        )
    return _IVF_CENTROIDS[key]


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH buckets + exact cosine
    ≥ 0.95), oracle-backed against DuckDB's exact all-pairs cosine: on
    the synthetic corpus the correct answer is EMPTY (max off-diagonal
    cosine ≈ 0.51 at sf0.01), and the oracle independently proves that
    empty is CORRECT — if the corpus held a ≥0.95 pair the LSH buckets
    missed, the oracle would fail the query. Recall on data that does
    contain near-dups is pinned by the injected-duplicate test."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(
        e, "vec_id", "embedding", threshold=0.95, dim=64
    )
    return pairs.select("id_a", "id_b", qint(F.col("cosine"), 4).alias("cosine_q"))


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        e, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=4,
        centroids=_ivf_centroids(spark, sf_dir, 8),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode with a full value oracle: deterministic PNGs
    (closed-form pixels, see ``synthesize_png_media``) round-trip
    through the pure-stdlib PNG encoder+decoder as two Arrow-batched
    ``mapInPandas`` stages, and the decoded width/height/channels/
    pixel_sum are exactly computable by the DuckDB oracle — so the
    codec itself, not just the plumbing, is value-verified."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_png_media(d, "doc_id")
    return multimodal.decode_image_meta(media)


SQL_MEDIA_FEATURES = """
WITH d AS (
    SELECT doc_id, doc_id % 13 + 1 AS width, doc_id % 7 + 1 AS height
    FROM documents WHERE doc_id < 200
),
px AS (
    SELECT doc_id, width, height,
           unnest(generate_series(0, width * height * 3 - 1)) AS i
    FROM d
)
SELECT doc_id AS media_id, width, height,
       CAST(3 AS BIGINT) AS channels,
       CAST(SUM((doc_id * 31 + i) % 256) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id, width, height
"""


# Shared dHash CTE chain: closed-form synthesized pixels -> BT.601
# integer luma -> 8x9 block-mean grid (floor means; upsampling
# degenerates to nearest pixel via the max(..., lo+1) bound) -> 64
# horizontal-comparison bits -> signed BIGINT fingerprint (bit 63's
# place value spelled literally, the simhash_portable convention).
_SQL_DHASH_FP_CTES = """d AS (
    SELECT doc_id, doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
    FROM documents WHERE doc_id < 200
),
pix AS (
    SELECT doc_id, i // w AS y, i % w AS x,
           (299 * ((doc_id * 31 + i * 3) % 256)
          + 587 * ((doc_id * 31 + i * 3 + 1) % 256)
          + 114 * ((doc_id * 31 + i * 3 + 2) % 256)) // 1000 AS luma
    FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM d)
),
cells AS (
    SELECT doc_id, gy, gx,
           (gy * h) // 8 AS y0,
           greatest(((gy + 1) * h) // 8, (gy * h) // 8 + 1) AS y1,
           (gx * w) // 9 AS x0,
           greatest(((gx + 1) * w) // 9, (gx * w) // 9 + 1) AS x1
    FROM d CROSS JOIN range(0, 8) t(gy) CROSS JOIN range(0, 9) u(gx)
),
grid AS (
    SELECT c.doc_id, c.gy, c.gx, sum(p.luma) // count(*) AS gv
    FROM cells c JOIN pix p
      ON p.doc_id = c.doc_id
     AND p.y >= c.y0 AND p.y < c.y1 AND p.x >= c.x0 AND p.x < c.x1
    GROUP BY c.doc_id, c.gy, c.gx
),
bits AS (
    SELECT l.doc_id, l.gy * 8 + l.gx AS i,
           CASE WHEN l.gv < r.gv THEN 1 ELSE 0 END AS bit
    FROM grid l JOIN grid r
      ON r.doc_id = l.doc_id AND r.gy = l.gy AND r.gx = l.gx + 1
    WHERE l.gx < 8
),
dfp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN bit = 0 THEN 0
                         WHEN i = 63 THEN -9223372036854775808
                         ELSE 1::BIGINT << CAST(i AS INT) END) AS BIGINT) AS fp
    FROM bits GROUP BY doc_id
)"""


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing with a full value oracle
    (operators/multimodal.image_dhash): deterministic REAL PNGs decode
    through the stdlib codec, luma + 8×9 block-mean grid + dHash bits
    are all integer arithmetic, and the oracle recomputes every
    64-bit fingerprint from the closed-form pixels — the codec AND the
    perceptual hash are value-verified bit for bit."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_png_media(d, "doc_id")
    return multimodal.image_dhash(media)


SQL_IMAGE_DHASH = f"""
WITH {_SQL_DHASH_FP_CTES}
SELECT doc_id AS id, fp FROM dfp
"""


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-duplicate pairs (multimodal.image_near_dup_pairs):
    dHash fingerprints feed the SAME pigeonhole 16-bit-block join +
    exact hamming machinery as text SimHash (dedup.hamming_block_pairs)
    — the oracle replays fingerprints, block keys, bucket join, and the
    hamming cutoff, so candidate recall effects are value-verified, not
    assumed. The synthesized corpus makes this a REAL perceptual test:
    same-geometry images differ by a constant luma shift (doc_id*31 mod
    256), which dHash's neighbor comparisons cancel except at wrap
    pixels — byte-level hashes see 0 duplicates here, the perceptual
    tier finds every shifted copy."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_png_media(d, "doc_id")
    return multimodal.image_near_dup_pairs(media, max_hamming=8).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


SQL_IMAGE_NEAR_DUP = f"""
WITH {_SQL_DHASH_FP_CTES},
keyed AS (
    SELECT doc_id, fp, b AS block,
           (fp >> (16 * CAST(b AS INT))) & 65535 AS key
    FROM dfp CROSS JOIN range(0, 4) t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.fp AS fa, b.fp AS fb
    FROM keyed a JOIN keyed b USING (block, key)
    WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(fa, fb)) <= 8
"""


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode with a full value oracle: deterministic PCM
    WAVs (closed-form frames, see ``synthesize_wav_media``) round-trip
    through the stdlib RIFF/WAVE encoder+decoder, and the decoded
    frame count / sample sums / zero-crossing rate are recomputed
    exactly by the DuckDB oracle — the audio twin of
    ``media_features``."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_wav_media(d, "doc_id")
    return multimodal.decode_audio_meta(media)


SQL_AUDIO_FEATURES = """
WITH d AS (
    SELECT doc_id, doc_id % 50 + 10 AS n FROM documents WHERE doc_id < 200
),
v AS (
    SELECT doc_id, j, (doc_id * 37 + j * 11) % 4096 - 2048 AS val
    FROM (SELECT doc_id, unnest(generate_series(0, n - 1)) AS j FROM d)
),
agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(val) AS BIGINT) AS sample_sum,
           CAST(sum(abs(val)) AS BIGINT) AS abs_sum
    FROM v GROUP BY doc_id
),
zc AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN prev IS NOT NULL AND sgn * prev < 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
    FROM (
        SELECT doc_id,
               CASE WHEN val > 0 THEN 1 ELSE -1 END AS sgn,
               lag(CASE WHEN val > 0 THEN 1 ELSE -1 END)
                   OVER (PARTITION BY doc_id ORDER BY j) AS prev
        FROM v WHERE val <> 0
    )
    GROUP BY doc_id
)
SELECT a.doc_id AS media_id,
       CAST(8000 AS BIGINT) AS rate,
       CAST(1 AS BIGINT) AS channels,
       a.n_frames, a.sample_sum, a.abs_sum,
       CAST(COALESCE(z.z, 0) AS BIGINT) AS zero_crossings
FROM agg a LEFT JOIN zc z USING (doc_id)
"""


def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank quality prior over a deterministic document link graph
    (each doc links to 3 hash-derived neighbors — the traceops-style
    shared synthetic input), 3 full distributed iterations, top-20 by
    quantized rank. Verifies the iterative rank computation itself —
    teleport term, out-degree normalization, dangling-mass
    redistribution — against a fully unrolled SQL oracle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count("*").alias("n_docs"))  # one row, broadcasts
    edges = (
        d.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (F.col("doc_id") * 31 + j * 97) % F.col("n_docs")
                        for j in (1, 2, 3)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    ranks = graph.pagerank(edges, n_iter=3, damping=0.85)
    # top-k FIRST (TakeOrderedAndProject — never a global single-partition
    # sort of every node), then rank the 20 surviving rows
    order = [F.col("rank_q").desc(), F.col("doc_id").asc()]
    return ranked_topk(
        ranks.select(
            F.col("node").alias("doc_id"), qint(F.col("rank") * 1e9, 0).alias("rank_q")
        ),
        order,
        20,
        rank_col="rn",
    )


def _sql_pagerank_iter(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration as SQL CTEs (teleport +
    damped in-mass + uniform dangling redistribution), mirroring
    ``graph.pagerank`` exactly."""
    return f"""
dang_{cur} AS (
    SELECT COALESCE(sum(r.rank), 0) AS dang
    FROM {prev} r LEFT JOIN deg d ON d.src = r.node
    WHERE d.src IS NULL
),
{cur} AS (
    SELECT nodes.node,
           0.15 / (SELECT n FROM nn)
           + 0.85 * (COALESCE(m.mass, 0) + (SELECT dang FROM dang_{cur}) / (SELECT n FROM nn)) AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS mass
        FROM e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst) m USING (node)
)"""


SQL_DOC_PAGERANK = f"""
WITH e AS (
    SELECT src, dst FROM (
        SELECT d.doc_id AS src,
               (d.doc_id * 31 + j.j * 97) % (SELECT count(*) FROM documents) AS dst
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS j) j
    ) WHERE src <> dst
),
nodes AS (
    SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
    )
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{_sql_pagerank_iter("r0", "r1")},
{_sql_pagerank_iter("r1", "r2")},
{_sql_pagerank_iter("r2", "r3")}
SELECT doc_id, rank_q, rn FROM (
    SELECT node AS doc_id,
           CAST(floor(rank * 1000000000 + 0.5) AS BIGINT) AS rank_q,
           CAST(row_number() OVER (
               ORDER BY CAST(floor(rank * 1000000000 + 0.5) AS BIGINT) DESC, node ASC
           ) AS BIGINT) AS rn
    FROM r3
) WHERE rn <= 20
"""




def q_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli quality resampling: each document kept
    with probability 0.2 + 0.75 * unique-word-ratio (repetitive docs
    thinned hardest), decided by an md5-derived uniform draw — the
    zero-shuffle, per-row-independent sibling of q_domain_mix's
    rank-based rates. The whole plan is a single scan with the filter
    pushed down; NULL text yields a NULL probability and is dropped by
    both engines (C4-style: undecodable docs don't survive curation).
    At 100 TB this is the right default thinning shape: no window, no
    exchange, retry-safe (the draw is content-keyed, not RNG)."""
    from traceframe_spark.operators.sampling import bernoulli_quality_sample

    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    uniq_ratio = F.size(F.array_distinct(words)) / F.size(words)
    p = F.least(F.lit(1.0), F.lit(0.2) + F.lit(0.75) * uniq_ratio)
    return bernoulli_quality_sample(d, p, id_col="doc_id").select(
        "doc_id", "source", "p_q", "u32"
    )


SQL_QUALITY_RESAMPLE = """
SELECT doc_id, source, p_q, u32
FROM (
    SELECT doc_id, source,
           CAST(floor(least(1.0, 0.2 + 0.75 * (len(list_distinct(string_split(text, ' '))) /
                                               CAST(len(string_split(text, ' ')) AS DOUBLE)))
                      * 10000 + 0.5) AS BIGINT) AS p_q,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u32
    FROM documents
)
WHERE u32 * 10000 < p_q * 4294967296
"""




# ------------------------------------------------------ BPE tokenizer

_BPE_N_MERGES = 10

_SQL_BPE_BASE = """
wf AS MATERIALIZED (
    SELECT word, count(*) AS wcount FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    ) WHERE word <> '' GROUP BY word
),
w0 AS MATERIALIZED (
    SELECT word, wcount,
           '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') || '</w>  ' AS s
    FROM wf
)"""


def _sql_bpe_iter(prev: str, pair: str, nxt: str) -> str:
    """One BPE training round in SQL: argmax adjacent pair of the
    current symbol table, then the same boundary-preserving replace
    the Spark operator uses (operators/bpe.py merge_expr)."""
    return f"""
{pair} AS MATERIALIZED (
    SELECT l, r, cnt FROM (
        SELECT arr[j] AS l, arr[j + 1] AS r, CAST(sum(wcount) AS BIGINT) AS cnt
        FROM (SELECT wcount, list_filter(string_split(s, '  '), x -> x <> '') AS arr
              FROM {prev}),
             unnest(range(1, len(arr))) AS t(j)
        GROUP BY 1, 2
    ) ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
{nxt} AS MATERIALIZED (
    SELECT word, wcount,
           replace(s, ' ' || (SELECT l FROM {pair}) || '  ' || (SELECT r FROM {pair}) || ' ',
                      ' ' || (SELECT l FROM {pair}) || (SELECT r FROM {pair}) || ' ') AS s
    FROM {prev}
)"""


def _sql_bpe_chain(n: int) -> str:
    parts = [_SQL_BPE_BASE]
    for i in range(1, n + 1):
        parts.append(_sql_bpe_iter(f"w{i - 1}", f"p{i}", f"w{i}"))
    return "WITH " + ",".join(parts)


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 BPE statistics: the 50 most frequent adjacent symbol
    pairs (char level + </w> marker) over the corpus word-frequency
    table. Plan: one shuffle to the word table, map-side pair
    explosion, one 50-row TakeOrdered — the per-iteration cost profile
    of the trainer, benched in isolation."""
    from traceframe_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freq(d)
    syms = wf.select("wcount", bpe.initial_symbols(F.col("word")).alias("s"))
    pairs = bpe.pair_counts(syms)
    # top-k first (TakeOrdered over the distinct-pair set), then rank
    # the bounded 50 rows — never a global sort of every pair
    order = [F.col("pcount").desc(), F.col("left").asc(), F.col("right").asc()]
    return ranked_topk(pairs, order, 50).select(
        "rank", F.col("left").alias("left_sym"), F.col("right").alias("right_sym"), "pcount"
    )


SQL_BPE_PAIR_COUNTS = (
    "WITH " + _SQL_BPE_BASE + """
SELECT rank, l AS left_sym, r AS right_sym, cnt AS pcount FROM (
    SELECT l, r, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, l ASC, r ASC) AS BIGINT) AS rank
    FROM (
        SELECT arr[j] AS l, arr[j + 1] AS r, CAST(sum(wcount) AS BIGINT) AS cnt
        FROM (SELECT wcount, list_filter(string_split(s, '  '), x -> x <> '') AS arr
              FROM w0),
             unnest(range(1, len(arr))) AS t(j)
        GROUP BY 1, 2
    )
) WHERE rank <= 50
"""
)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned tokenizer itself: 10 rounds of distributed BPE
    training (operators/bpe.py) — each round one pair-count job over
    the persisted word-symbol table plus a single-row collect. The
    DuckDB oracle REPLAYS the full training loop as 10 chained CTEs,
    exact to the tie-break, because a merge is a plain boundary-
    preserving string replace in both engines — no engine-specific
    hashing anywhere in the algorithm."""
    from traceframe_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    merges, syms = bpe.learn_bpe(d, _BPE_N_MERGES)
    syms.unpersist()
    rows = [
        (i + 1, left, right, left + right, cnt)
        for i, (left, right, cnt) in enumerate(merges)
    ]
    from traceframe_spark.session import local_frame

    return local_frame(
        spark, rows,
        "rank long, left_sym string, right_sym string, merged string, pcount long",
    )


SQL_BPE_MERGES = _sql_bpe_chain(_BPE_N_MERGES) + "\n" + "\nUNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS pcount FROM p{i}"
    for i in range(1, _BPE_N_MERGES + 1)
)


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective vocabulary after the 10 learned merges: top-30 tokens
    by corpus-weighted frequency. Trains (10 tiny jobs on the word
    table), then one explode + aggregate + TakeOrdered."""
    from traceframe_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    merges, syms = bpe.learn_bpe(d, _BPE_N_MERGES)
    try:
        v = bpe.vocab(syms)
        order = [F.col("tcount").desc(), F.col("token").asc()]
        return (
            ranked_topk(v, order, 30)
            .select("rank", "token", "tcount")
            .localCheckpoint(eager=True)  # materialize before unpersisting the syms table
        )
    finally:
        syms.unpersist()


SQL_BPE_VOCAB = _sql_bpe_chain(_BPE_N_MERGES) + f"""
SELECT rank, token, tcount FROM (
    SELECT token, tcount,
           CAST(row_number() OVER (ORDER BY tcount DESC, token ASC) AS BIGINT) AS rank
    FROM (
        SELECT t AS token, CAST(sum(wcount) AS BIGINT) AS tcount
        FROM (SELECT wcount, unnest(list_filter(string_split(s, '  '), x -> x <> '')) AS t
              FROM w{_BPE_N_MERGES})
        GROUP BY 1
    )
) WHERE rank <= 30
"""




# ---------------------------------------------- URL/domain curation


def _synth_url() -> F.Column:
    """Deterministic messy URLs from (doc_id, source) — the
    ``synthesize_png_media`` convention for the URL family: closed
    form, so the oracle recomputes every input. Four shapes exercise
    every normalization rule (case folding, www strip, default vs
    real ports, trailing slashes, tracking-param drop + sort,
    fragments, non-http schemes) plus a non-URL row (% 13 == 9)."""
    did, src = F.col("doc_id"), F.col("source")
    ds = did.cast("string")
    c0 = F.concat(
        F.lit("HTTPS://WWW."), src, F.lit(".Example.COM:443/Docs/"), ds,
        F.lit("/?utm_source=feed&id="), (did % 7).cast("string"), F.lit("#top"),
    )
    c1 = F.concat(
        F.lit("http://"), src, F.lit(".example.org:8080/a/b/?ref=tw&q="),
        (did % 5).cast("string"), F.lit("&b=2"),
    )
    c2 = F.concat(F.lit("https://CDN."), src, F.lit(".net/static/"), ds, F.lit("///"))
    c3 = F.concat(F.lit("ftp://files."), src, F.lit(".io:21/pub"))
    return (
        F.when(did % 13 == 9, F.lit("relative/path/only"))
        .when(did % 4 == 0, c0)
        .when(did % 4 == 1, c1)
        .when(did % 4 == 2, c2)
        .otherwise(c3)
    )


_SQL_URL_CTES = r"""uurl AS (
    SELECT doc_id, source,
        CASE WHEN doc_id % 13 = 9 THEN 'relative/path/only'
             WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Docs/'
                  || doc_id::VARCHAR || '/?utm_source=feed&id=' || (doc_id % 7)::VARCHAR || '#top'
             WHEN doc_id % 4 = 1 THEN 'http://' || source || '.example.org:8080/a/b/?ref=tw&q='
                  || (doc_id % 5)::VARCHAR || '&b=2'
             WHEN doc_id % 4 = 2 THEN 'https://CDN.' || source || '.net/static/'
                  || doc_id::VARCHAR || '///'
             ELSE 'ftp://files.' || source || '.io:21/pub' END AS url
    FROM documents
),
uparts AS (
    SELECT doc_id,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        regexp_replace(lower(regexp_extract(
            regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1), '^([^:]*)', 1)),
            '^www\.', '') AS host2,
        regexp_extract(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                       ':(\d+)$', 1) AS port,
        regexp_replace(regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
                       '/+$', '') AS path2,
        list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
            p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)(=.*)?$')
        )) AS params
    FROM uurl
),
ufinal AS (
    SELECT doc_id,
        CASE WHEN scheme = '' THEN NULL ELSE
            scheme || '://' || host2 ||
            CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                      OR (scheme = 'http' AND port = '80')
                 THEN '' ELSE ':' || port END ||
            path2 ||
            CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
                 ELSE '' END
        END AS url_norm,
        CASE WHEN scheme = '' THEN NULL ELSE host2 END AS domain
    FROM uparts
)"""

_URL_BLOCKLIST = ["src3.example.com", "src7.example.org", "cdn.src2.net"]


def _synth_url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from traceframe_spark.operators import web

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _synth_url().alias("url")
    )
    return web.with_url_norm(d)


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/web.url_normalize — the
    RefinedWeb source-level pass): scheme/host folding, www strip,
    default-port strip, trailing-slash strip, fragment drop,
    tracking-param drop + lexicographic param sort, NULL for
    non-URLs. The oracle replays synthesis AND the whole regex/string
    chain, so every rule is value-verified per row."""
    return _synth_url_docs(spark, sf_dir).select("doc_id", "url_norm", "domain")


SQL_URL_NORMALIZE = f"""
WITH {_SQL_URL_CTES}
SELECT doc_id, url_norm, domain FROM ufinal
"""


def q_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist gating (web.domain_gate): one broadcast
    anti-join against a bounded curated list; NULL-domain (non-URL)
    rows drop by the gate's default contract. The oracle is the
    equivalent NOT IN over the replayed domains."""
    from traceframe_spark.operators import web

    return web.domain_gate(
        _synth_url_docs(spark, sf_dir), _URL_BLOCKLIST
    ).select("doc_id", "domain")


SQL_DOMAIN_GATE = f"""
WITH {_SQL_URL_CTES}
SELECT doc_id, domain FROM ufinal
WHERE domain IS NOT NULL
  AND domain NOT IN ('src3.example.com', 'src7.example.org', 'cdn.src2.net')
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (web.domain_cap — RefinedWeb's source cap as the
    cluster_cap capped-window shape with the domain key): at most 5
    rows per domain in the engine's deterministic md5(id) order. The
    oracle replays the window selection exactly."""
    from traceframe_spark.operators import web

    return web.domain_cap(
        _synth_url_docs(spark, sf_dir), cap=5
    ).select("doc_id", "domain")


SQL_DOMAIN_CAP = f"""
WITH {_SQL_URL_CTES}
SELECT doc_id, domain FROM (
    SELECT doc_id, domain,
           row_number() OVER (
               PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id
           ) AS rn
    FROM ufinal WHERE domain IS NOT NULL
) WHERE rn <= 5
"""


def q_web_curation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RefinedWeb-style source pass: normalize → blocklist
    gate → per-domain cap, value-verified end to end — the pipeline a
    100 TB crawl runs BEFORE any text is read (URL columns only; the
    text column never enters the plan)."""
    from traceframe_spark.operators import web

    gated = web.domain_gate(_synth_url_docs(spark, sf_dir), _URL_BLOCKLIST)
    return web.domain_cap(gated, cap=5).select("doc_id", "domain", "url_norm")


SQL_WEB_CURATION_FLOW = f"""
WITH {_SQL_URL_CTES}
SELECT doc_id, domain, url_norm FROM (
    SELECT doc_id, domain, url_norm,
           row_number() OVER (
               PARTITION BY domain ORDER BY md5(doc_id::VARCHAR), doc_id
           ) AS rn
    FROM ufinal
    WHERE domain IS NOT NULL
      AND domain NOT IN ('src3.example.com', 'src7.example.org', 'cdn.src2.net')
) WHERE rn <= 5
"""


# ------------------------------------------------- unigram tokenizer

_UNI_SEED = 30
_UNI_ROUNDS = 2
_UNI_MAXLEN = 10  # DP unroll depth; corpus words are <= 8 chars
_UNI_PLEN = 4

_SQL_UNI_BASE = r"""uwf AS MATERIALIZED (
    SELECT word, count(*) AS wcount FROM (
        SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
    ) WHERE word <> '' GROUP BY word
),
ucand AS MATERIALIZED (
    SELECT piece, CAST(sum(wcount) AS BIGINT) AS freq FROM (
        SELECT wcount, substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        FROM uwf,
             unnest(range(1, len(word) + 1)) AS t(i),
             unnest(range(1, least(%(plen)d, len(word) - i + 1) + 1)) AS u(l)
    ) GROUP BY piece
),
uc0 AS MATERIALIZED (
    SELECT piece, freq,
           CAST(floor(ln(t.total / CAST(freq AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) AS cost_q
    FROM (
        SELECT piece, freq FROM ucand WHERE len(piece) = 1
        UNION ALL
        SELECT piece, freq FROM (
            SELECT piece, freq,
                   row_number() OVER (ORDER BY freq DESC, piece ASC) AS rn
            FROM ucand WHERE len(piece) >= 2
        ) WHERE rn <= %(seed)d
    ) v,
    (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM (
        SELECT piece, freq FROM ucand WHERE len(piece) = 1
        UNION ALL
        SELECT piece, freq FROM (
            SELECT piece, freq,
                   row_number() OVER (ORDER BY freq DESC, piece ASC) AS rn
            FROM ucand WHERE len(piece) >= 2
        ) WHERE rn <= %(seed)d
    )) t
)""" % {"seed": _UNI_SEED, "plen": _UNI_PLEN}


def _sql_uni_dp(tag: str, words: str, cost: str, maxlen: int, plen: int) -> str:
    """Viterbi DP chain as unrolled CTEs: ``{tag}_k`` holds, per word
    of length >= k, the single minimal state (cost, n, seg) covering
    the first k characters — min taken under the shared tuple order
    via row_number. ``{tag}_best`` is each word's full-cover state.
    The unroll depth bounds replayable word length (engine kernel is
    unbounded); corpus max is asserted by the chain's final join."""
    parts = [
        f"""{tag}_0 AS (
    SELECT word, wcount, len(word) AS wl, 0 AS j,
           0 AS cost, 0 AS n, '' AS seg
    FROM {words}
)"""
    ]
    for k in range(1, maxlen + 1):
        preds = " UNION ALL ".join(
            f"SELECT * FROM {tag}_{i}" for i in range(max(0, k - plen), k)
        )
        parts.append(
            f"""{tag}_{k} AS MATERIALIZED (
    SELECT word, wcount, wl, j, cost, n, seg FROM (
        SELECT d.word, d.wcount, d.wl, {k} AS j,
               d.cost + v.cost_q AS cost, d.n + 1 AS n,
               CASE WHEN d.seg = '' THEN v.piece
                    ELSE d.seg || ' ' || v.piece END AS seg,
               row_number() OVER (
                   PARTITION BY d.word
                   ORDER BY d.cost + v.cost_q ASC, d.n + 1 ASC,
                            CASE WHEN d.seg = '' THEN v.piece
                                 ELSE d.seg || ' ' || v.piece END ASC
               ) AS rn
        FROM ({preds}) d
        JOIN {cost} v ON v.piece = substr(d.word, d.j + 1, {k} - d.j)
        WHERE d.wl >= {k}
    ) WHERE rn = 1
)"""
        )
    alls = " UNION ALL ".join(f"SELECT * FROM {tag}_{k}" for k in range(1, maxlen + 1))
    parts.append(
        f"""{tag}_best AS MATERIALIZED (
    SELECT word, wcount, n, cost, seg FROM ({alls}) WHERE j = wl
)"""
    )
    return ",\n".join(parts)


def _sql_uni_round(r: int, maxlen: int, plen: int) -> str:
    """One hard-EM round in SQL: Viterbi with ``uc{r-1}`` costs, then
    usage counts -> pruned re-priced ``uc{r}`` (singles floor at 1,
    zero-usage multi-char pieces dropped)."""
    dp = _sql_uni_dp(f"udp{r}", "uwf", f"uc{r - 1}", maxlen, plen)
    return f"""{dp},
uu{r} AS MATERIALIZED (
    SELECT piece, CAST(sum(wcount) AS BIGINT) AS u
    FROM (SELECT wcount, unnest(string_split(seg, ' ')) AS piece
          FROM udp{r}_best)
    GROUP BY piece
),
uv{r} AS MATERIALIZED (
    SELECT p.piece,
           CASE WHEN len(p.piece) = 1 THEN greatest(coalesce(u.u, 0), 1)
                ELSE coalesce(u.u, 0) END AS freq
    FROM uc{r - 1} p LEFT JOIN uu{r} u USING (piece)
    WHERE len(p.piece) = 1 OR coalesce(u.u, 0) > 0
),
uc{r} AS MATERIALIZED (
    SELECT piece, freq,
           CAST(floor(ln(t.total / CAST(freq AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) AS cost_q
    FROM uv{r},
         (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM uv{r}) t
)"""


def _sql_uni_chain(n_rounds: int, maxlen: int = _UNI_MAXLEN, plen: int = _UNI_PLEN) -> str:
    parts = [_SQL_UNI_BASE]
    for r in range(1, n_rounds + 1):
        parts.append(_sql_uni_round(r, maxlen, plen))
    return "WITH " + ",\n".join(parts)


def q_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram-LM tokenizer vocabulary
    (operators/unigram.learn_unigram — SentencePiece's unigram model,
    hard-EM form): seed substring statistics, two Viterbi-EM rounds
    with integer costs, usage-pruned re-priced pieces. The DuckDB
    oracle REPLAYS the full training loop — seeding top-K, every
    per-word DP election (tuple-ordered tie-breaks), both M-steps —
    as chained CTEs, the ``bpe_merges`` precedent for the second
    tokenizer family."""
    from traceframe_spark.operators import unigram

    d = load_table(spark, sf_dir, "documents")
    vocab = unigram.learn_unigram(
        d, seed_size=_UNI_SEED, max_piece_len=_UNI_PLEN, n_rounds=_UNI_ROUNDS
    )
    from traceframe_spark.session import local_frame

    return local_frame(
        spark, [(p, f, c) for p, f, c in vocab],
        "token string, freq long, cost_q long",
    )


SQL_UNIGRAM_VOCAB = _sql_uni_chain(_UNI_ROUNDS) + f"""
SELECT piece AS token, freq, cost_q FROM uc{_UNI_ROUNDS}
"""


def q_unigram_encode_lens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi tokenization against the trained unigram model: per-doc
    token counts and total quantized cost for doc_id < 200 — the
    oracle replays training AND a third DP chain (final costs) over
    the encode slice's words, then the per-doc aggregation, so the
    tokenizer's end-to-end answer is value-verified."""
    from traceframe_spark.operators import unigram

    d = load_table(spark, sf_dir, "documents")
    vocab = unigram.learn_unigram(
        d, seed_size=_UNI_SEED, max_piece_len=_UNI_PLEN, n_rounds=_UNI_ROUNDS
    )
    enc = unigram.encode_unigram(
        d.filter(F.col("doc_id") < 200), vocab, max_piece_len=_UNI_PLEN
    )
    return enc.select(F.col("id").alias("doc_id"), "n_tokens", "cost_q")


SQL_UNIGRAM_ENCODE_LENS = (
    _sql_uni_chain(_UNI_ROUNDS)
    + ",\n"
    + """ewords AS MATERIALIZED (
    SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
        FROM documents WHERE doc_id < 200
    ) WHERE word <> ''
),
edist AS MATERIALIZED (
    SELECT word, CAST(1 AS BIGINT) AS wcount FROM (SELECT DISTINCT word FROM ewords)
),
"""
    + _sql_uni_dp("edp", "edist", f"uc{_UNI_ROUNDS}", _UNI_MAXLEN, _UNI_PLEN)
    + """
SELECT w.doc_id,
       CAST(sum(b.n) AS BIGINT) AS n_tokens,
       CAST(sum(b.cost) AS BIGINT) AS cost_q
FROM ewords w JOIN edp_best b USING (word)
GROUP BY w.doc_id
"""
)


def q_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode with a full value oracle: deterministic mono
    Y4M streams (closed-form luma, see ``synthesize_y4m_media``)
    round-trip through the stdlib YUV4MPEG2 encoder+decoder, and the
    decoded geometry / luma sums / inter-frame motion are recomputed
    exactly by the DuckDB oracle — completing the PNG/WAV/Y4M real-
    codec triad. Map-side only: synthesize and decode are both
    ``mapInPandas`` over the same scan, zero shuffles."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    media = multimodal.synthesize_y4m_media(d, "doc_id")
    return multimodal.decode_video_meta(media)


SQL_VIDEO_FEATURES = """
WITH d AS (
    SELECT doc_id, doc_id % 8 + 2 AS n, doc_id % 6 + 4 AS w, doc_id % 4 + 3 AS h
    FROM documents WHERE doc_id < 150
),
px AS (
    SELECT doc_id, f,
           (doc_id * 31 + f * 17 + y * 7 + x * 3) % 256 AS v,
           CASE WHEN f > 0 THEN
               abs((doc_id * 31 + f * 17 + y * 7 + x * 3) % 256
                   - (doc_id * 31 + (f - 1) * 17 + y * 7 + x * 3) % 256)
           ELSE 0 END AS dv
    FROM (
        SELECT doc_id, f, y, x
        FROM d,
             unnest(generate_series(0, n - 1)) AS tf(f),
             unnest(generate_series(0, h - 1)) AS ty(y),
             unnest(generate_series(0, w - 1)) AS tx(x)
    )
)
SELECT d.doc_id AS media_id,
       CAST(d.w AS BIGINT) AS width,
       CAST(d.h AS BIGINT) AS height,
       CAST(d.n AS BIGINT) AS n_frames,
       CAST(25 AS BIGINT) AS fps_num,
       CAST(1 AS BIGINT) AS fps_den,
       CAST(sum(px.v) AS BIGINT) AS y_sum,
       CAST(sum(CASE WHEN px.f = 0 THEN px.v ELSE 0 END) AS BIGINT) AS frame0_sum,
       CAST(sum(px.dv) AS BIGINT) AS motion_sum
FROM d JOIN px USING (doc_id)
GROUP BY d.doc_id, d.w, d.h, d.n
"""




def q_bpe_encode_lens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer application: train the 10 merges, then
    ENCODE every document and report its token count — the number an
    LLM-pipeline budget (sequence packing, cost estimates) actually
    consumes. Encoding is a zero-shuffle projection (the merge chain is
    nested ``replace`` calls inside one ``transform`` lambda); the
    oracle reuses the replayed training CTEs and joins each document's
    word multiset to the final per-word symbol counts."""
    from traceframe_spark.operators import bpe

    from traceframe_spark.operators.dedup import spread

    d = load_table(spark, sf_dir, "documents")
    merges, syms = bpe.learn_bpe(d, _BPE_N_MERGES)
    try:
        # spread before the CPU-bound merge-chain projection: the small
        # corpus scans as one row group and the encode otherwise runs
        # single-task (the encode_against_bpe width rule)
        enc = bpe.encode(
            spread(d.filter(F.col("text").isNotNull()), "doc_id", cpu=True), merges
        )
        return (
            enc.select("doc_id", F.size("tokens").cast("long").alias("n_tokens"))
            .localCheckpoint(eager=True)
        )
    finally:
        syms.unpersist()


def q_bpe_store_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-tokenizer roundtrip (bpe.write_bpe_model /
    encode_against_bpe, manifest protocol): train the 10 merges,
    commit them atomically as the sixth artifact on the shared store
    protocol, then encode every document against the STORE — the
    steady-state contract (frozen merges, training corpus never
    re-read, token ids stable across snapshots). Same oracle as
    bpe_encode_lens: the store roundtrip must preserve the merge list
    exactly, or counts drift."""
    from traceframe_spark.operators import bpe
    from traceframe_spark.plans.catalog import tmp_store

    d = load_table(spark, sf_dir, "documents")
    merges, syms = bpe.learn_bpe(d, _BPE_N_MERGES)
    try:
        path = tmp_store("bpe_model_") + "/bpe"
        bpe.write_bpe_model(spark, merges, path, protocol="manifest")
        enc = bpe.encode_against_bpe(d.filter(F.col("text").isNotNull()), path)
        return (
            enc.select("doc_id", F.size("tokens").cast("long").alias("n_tokens"))
            .localCheckpoint(eager=True)
        )
    finally:
        syms.unpersist()


SQL_BPE_ENCODE_LENS = _sql_bpe_chain(_BPE_N_MERGES) + f"""
, wlen AS MATERIALIZED (
    SELECT word, CAST(len(list_filter(string_split(s, '  '), x -> x <> '')) AS BIGINT) AS n
    FROM w{_BPE_N_MERGES}
)
, dw AS (
    SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
        FROM documents WHERE text IS NOT NULL
    ) WHERE word <> ''
)
SELECT doc.doc_id, CAST(coalesce(sum(wlen.n), 0) AS BIGINT) AS n_tokens
FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) doc
LEFT JOIN dw USING (doc_id)
LEFT JOIN wlen USING (word)
GROUP BY doc.doc_id
"""




def q_doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the deterministic link
    graph (same synthetic edges as q_doc_pagerank), top-20. The engine
    runs degree-ORIENTED enumeration (operators/graph.py triangles —
    wedge fan-out bounded by O(sqrt m) per vertex, the shape that
    survives hub-skewed 100 TB graphs); the oracle counts the same
    triangles with the naive id-ordered 3-way self-join — the results
    are the same exact graph property, so the hash match proves the
    oriented algorithm enumerates precisely the triangle set."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count("*").alias("n_docs"))
    edges = (
        d.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (F.col("doc_id") * 31 + j * 97) % F.col("n_docs")
                        for j in (1, 2, 3)
                    ]
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    part = graph.triangle_participation(edges)
    order = [F.col("n_triangles").desc(), F.col("v").asc()]
    return ranked_topk(part, order, 20).select(
        "rank", F.col("v").alias("doc_id"), "n_triangles"
    )


SQL_DOC_TRIANGLES = """
WITH d AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*) AS n FROM d),
e0 AS (
    SELECT doc_id AS src, (doc_id * 31 + j * 97) % (SELECT n FROM nn) AS dst
    FROM d, unnest([1, 2, 3]) AS t(j)
    WHERE doc_id <> (doc_id * 31 + j * 97) % (SELECT n FROM nn)
),
ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM ue e1 JOIN ue e2 ON e1.b = e2.a JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
),
part AS (
    SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    ) GROUP BY v
)
SELECT rank, v AS doc_id, n_triangles FROM (
    SELECT v, n_triangles,
           CAST(row_number() OVER (ORDER BY n_triangles DESC, v ASC) AS BIGINT) AS rank
    FROM part
) WHERE rank <= 20
"""




def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters: build the fixed-memory 4×1024
    sketch over every word occurrence, point-estimate every distinct
    word through it, top-20 by estimate. The md5-derived bucket hashing
    makes the whole sketch — and therefore every estimate — exactly
    reproducible by the DuckDB oracle, which rebuilds the identical
    counter table in SQL. Estimates are upper bounds on true counts;
    pytest pins estimate ≥ exact and the sketch-additivity (merge)
    property. At 100 TB the sketch stays ~4·1024 longs regardless of
    corpus size — the structure a vocabulary that doesn't fit uses."""
    from traceframe_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    sk = sketch.cms_build(occ, "w", depth=4, width=1024)
    keys = occ.distinct()
    est = sketch.cms_estimate(sk, keys, "w", depth=4, width=1024)
    order = [F.col("est").desc(), F.col("w").asc()]
    return ranked_topk(est, order, 20).select(
        "rank", F.col("w").alias("word"), F.col("est").cast("long").alias("est")
    )


SQL_CMS_HEAVY_HITTERS = """
WITH occ AS (
    SELECT w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents
    ) WHERE w <> ''
),
sk AS MATERIALIZED (
    SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || w), 1, 8))::BIGINT % 1024 AS bucket,
           count(*) AS cnt
    FROM occ, unnest([0, 1, 2, 3]) AS t(r)
    GROUP BY 1, 2
),
keys AS (SELECT DISTINCT w FROM occ),
est AS (
    SELECT w, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
    FROM (
        SELECT k.w, t.r,
               ('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' || k.w), 1, 8))::BIGINT % 1024 AS bucket
        FROM keys k, unnest([0, 1, 2, 3]) AS t(r)
    ) q LEFT JOIN sk s ON s.r = q.r AND s.bucket = q.bucket
    GROUP BY w
)
SELECT rank, w AS word, est FROM (
    SELECT w, est, CAST(row_number() OVER (ORDER BY est DESC, w ASC) AS BIGINT) AS rank
    FROM est
) WHERE rank <= 20
"""




def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-pass for decontamination: build the
    8 KiB filter over the benchmark slice's words (docs < 50), probe
    every distinct word of the candidate corpus (docs >= 100), and
    account exactly for the outcome — probed / probable / true members
    / false positives. No false negatives is the structural guarantee
    (a missed benchmark word would leak contamination); the false-
    positive count only costs re-checking. The md5-derived bit
    positions make the filter bit-identical in DuckDB, so the oracle
    rebuilds it and must land on the same FP set. At 100 TB the filter
    is ~1k longs — broadcast once, probe map-side."""
    from traceframe_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents")
    words = lambda df: df.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    bench = words(d.filter(F.col("doc_id") < 50)).distinct()
    cand = words(d.filter(F.col("doc_id") >= 100)).distinct()
    bl = sketch.bloom_build(bench, "w")
    probed = sketch.bloom_probe(bl, cand, "w")
    truth = bench.withColumnRenamed("w", "w_t").withColumn("is_member", F.lit(True))
    joined = probed.join(truth, probed.w == truth.w_t, "left")
    return joined.agg(
        F.count("*").cast("long").alias("n_probed"),
        F.sum(F.col("probable_member").cast("long")).cast("long").alias("n_probable"),
        F.sum(F.coalesce(F.col("is_member"), F.lit(False)).cast("long"))
        .cast("long")
        .alias("n_true_members"),
        F.sum(
            (F.col("probable_member") & F.col("is_member").isNull()).cast("long")
        )
        .cast("long")
        .alias("n_false_pos"),
    )


SQL_BLOOM_PREFILTER = """
WITH bench AS (
    SELECT DISTINCT w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents WHERE doc_id < 50
    ) WHERE w <> ''
),
cand AS (
    SELECT DISTINCT w FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents WHERE doc_id >= 100
    ) WHERE w <> ''
),
bloom AS MATERIALIZED (
    SELECT CAST(p // 32 AS BIGINT) AS word_idx, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
    FROM (
        SELECT ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || w), 1, 8))::BIGINT % 65536 AS p
        FROM bench, unnest([0, 1, 2, 3, 4]) AS t(r)
    )
    GROUP BY 1
),
probe AS (
    SELECT c.w,
           bool_and(coalesce(b.bits, 0) & (1::BIGINT << CAST(q.p % 32 AS INT)) <> 0) AS probable_member
    FROM cand c,
         LATERAL (
             SELECT ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' || c.w), 1, 8))::BIGINT % 65536 AS p
             FROM unnest([0, 1, 2, 3, 4]) AS t(r)
         ) q
         LEFT JOIN bloom b ON b.word_idx = CAST(q.p // 32 AS BIGINT)
    GROUP BY c.w
)
SELECT CAST(count(*) AS BIGINT) AS n_probed,
       CAST(sum(CASE WHEN probable_member THEN 1 ELSE 0 END) AS BIGINT) AS n_probable,
       CAST(sum(CASE WHEN bench.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
       CAST(sum(CASE WHEN probable_member AND bench.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM probe LEFT JOIN bench ON probe.w = bench.w
"""




def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation gate (operators/text.py::quality_gate):
    per-rule flags + keep verdict in one zero-shuffle scan, with every
    rule's threshold comparison replayed on the 1e-4 grid by the
    oracle — including the stopword-argmax language guess."""
    from traceframe_spark.operators.dedup import spread

    # the gate is a CPU-bound per-doc kernel (~30x a shuffle per byte,
    # measured); spread to cluster width — a small corpus scans as one
    # row group and the whole projection otherwise runs single-task
    d = load_table(spark, sf_dir, "documents")
    return text.quality_gate(spread(d, "doc_id", cpu=True), "doc_id", "text")


SQL_QUALITY_GATE = f"""
-- NULL-text docs are excluded on BOTH sides (engine filters isNotNull;
-- here the WHERE below) — without it the rep CTE's unnest-over-NULL
-- silently drops them from the oracle while the engine would emit
-- NULL-flag rows, a latent row-count divergence.
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
    FROM documents
    WHERE text IS NOT NULL
),
rep AS (
    SELECT doc_id,
           CAST(floor(coalesce(1.0 - count(DISTINCT gram)::DOUBLE
                               / nullif(count(gram), 0)::DOUBLE, 0.0)
                      * 10000 + 0.5) AS BIGINT) AS rep_q
    FROM (
        SELECT doc_id,
               array_to_string(list_slice(t, CAST(g AS INT), CAST(g AS INT) + 1), ' ') AS gram
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 1, 1) + 1)) AS g
              FROM toks)
    ) GROUP BY doc_id
),
ent AS (
    SELECT doc_id,
           CAST(floor(entropy(tok) * 10000 + 0.5) AS BIGINT) AS ent_q
    FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
    GROUP BY doc_id
),
lng AS (
    SELECT doc_id,
           {_sql_stop_count('en')} AS s_en,
           {_sql_stop_count('de')} AS s_de,
           {_sql_stop_count('fr')} AS s_fr,
           {_sql_stop_count('es')} AS s_es,
           {_sql_stop_count('it')} AS s_it
    FROM documents
),
flags AS (
    SELECT t.doc_id,
           len(t.t) < 20 AS too_short,
           r.rep_q > 600 AS repetitive,
           coalesce(e.ent_q, 0) < 38000 AS low_entropy,
           (CASE
              WHEN greatest(l.s_en, l.s_de, l.s_fr, l.s_es, l.s_it) IS NULL THEN 'und'
              WHEN greatest(l.s_en, l.s_de, l.s_fr, l.s_es, l.s_it) = 0 THEN 'und'
              WHEN l.s_en >= greatest(l.s_de, l.s_fr, l.s_es, l.s_it) THEN 'en'
              WHEN l.s_de >= greatest(l.s_fr, l.s_es, l.s_it) THEN 'de'
              WHEN l.s_fr >= greatest(l.s_es, l.s_it) THEN 'fr'
              WHEN l.s_es >= l.s_it THEN 'es'
              ELSE 'it'
            END) <> 'en' AS non_en
    FROM toks t
    JOIN rep r ON r.doc_id = t.doc_id
    LEFT JOIN ent e ON e.doc_id = t.doc_id
    JOIN lng l ON l.doc_id = t.doc_id
)
SELECT doc_id, too_short, repetitive, low_entropy, non_en,
       CAST(too_short::INT + repetitive::INT + low_entropy::INT + non_en::INT AS BIGINT) AS n_fail,
       (too_short::INT + repetitive::INT + low_entropy::INT + non_en::INT) = 0 AS keep
FROM flags
"""



def q_curation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline end to end as ONE dataflow, per-document
    attributable: quality gate -> exact content dedup among survivors
    -> leakage-safe split, emitting each document's final disposition
    (``dropped_quality`` / ``dropped_dup`` / ``train|val|test``). This
    is the composed flow `examples/curation_demo.py` narrates, as an
    oracle-backed registry query: the DuckDB oracle replays all three
    stages (the near-dup LSH stage stays out of this query because its
    hash choices are engine-specific; `dedup_pipeline` covers it).

    Plan shape at scale: the gate is a pure projection carried on the
    scan, canonical selection is ``min(doc_id) over (partition by
    content_key)`` among gate survivors, and the split is a pure map of
    the same key — one scan, ONE hash shuffle (the window on the
    128-bit content key), zero self-joins of the corpus.
    """
    from traceframe_spark.operators.sampling import leakage_safe_split

    d = load_table(spark, sf_dir, "documents")
    gated = text.quality_gate(
        d.withColumn("_k", dedup.content_key("text")), "doc_id", "text",
        carry=("_k",),
    )
    scored = leakage_safe_split(
        gated, {"train": 0.9, "val": 0.05, "test": 0.05}, cluster_col="_k"
    )
    min_keep = F.min(F.when(F.col("keep"), F.col("doc_id"))).over(
        Window.partitionBy("_k")
    )
    status = (
        F.when(~F.col("keep"), F.lit("dropped_quality"))
        .when(F.col("doc_id") != min_keep, F.lit("dropped_dup"))
        .otherwise(F.col("split"))
    )
    return scored.select("doc_id", status.alias("status"))


SQL_CURATION_FLOW = f"""
WITH gate AS ({SQL_QUALITY_GATE}),
keyed AS (
    SELECT d.doc_id, g.keep, md5(lower(trim(d.text))) AS k
    FROM documents d JOIN gate g ON g.doc_id = d.doc_id
),
canon AS (
    SELECT k, min(doc_id) AS canon_id FROM keyed WHERE keep GROUP BY k
),
survivors AS (
    SELECT keyed.doc_id, keyed.k
    FROM keyed JOIN canon ON keyed.doc_id = canon.canon_id
),
split AS (
    SELECT doc_id,
           CASE WHEN u < 3865470566 THEN 'train'
                WHEN u < 4080218931 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, ('0x' || substr(md5(k), 1, 8))::BIGINT AS u
          FROM survivors)
)
SELECT keyed.doc_id,
       CASE WHEN NOT keyed.keep THEN 'dropped_quality'
            WHEN split.split IS NULL THEN 'dropped_dup'
            ELSE split.split END AS status
FROM keyed LEFT JOIN split ON split.doc_id = keyed.doc_id
"""



def q_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's actual product: dense token-ID sequences. Train
    the merges, rank the corpus-weighted vocabulary into ids (count
    DESC, token ASC — the deterministic order a vocab file ships in),
    encode the first 50 documents, and emit (doc_id, pos, token_id)
    rows. Id assignment collects the VOCABULARY-sized frequency table
    to the driver (the same bounded-by-|vocab| traffic as writing a
    vocab file; corpus size never reaches the driver) and broadcasts
    it back for the id join; the oracle replays training, vocabulary
    ranking, per-word encoding, and position flattening in SQL."""
    from traceframe_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    merges, syms = bpe.learn_bpe(d, _BPE_N_MERGES)
    try:
        vrows = bpe.vocab(syms).collect()
        vrows.sort(key=lambda r: (-r["tcount"], r["token"]))
        from traceframe_spark.session import local_frame

        ids = local_frame(
            spark,
            [(r["token"], i + 1) for i, r in enumerate(vrows)],
            "token: string, token_id: long",
        )
        enc = bpe.encode(
            d.filter(F.col("text").isNotNull() & (F.col("doc_id") < 50)), merges
        )
        ex = enc.selectExpr("doc_id", "posexplode(tokens) AS (pos, token)")
        return (
            ex.join(F.broadcast(ids), "token")
            .select("doc_id", F.col("pos").cast("long").alias("pos"), "token_id")
            .localCheckpoint(eager=True)
        )
    finally:
        syms.unpersist()


SQL_BPE_TOKEN_IDS = _sql_bpe_chain(_BPE_N_MERGES) + f"""
, vtok AS MATERIALIZED (
    SELECT token, CAST(sum(wcount) AS BIGINT) AS tcount
    FROM (SELECT wcount,
                 unnest(list_filter(string_split(s, '  '), x -> x <> '')) AS token
          FROM w{_BPE_N_MERGES})
    GROUP BY token
)
, ids AS (
    SELECT token,
           CAST(row_number() OVER (ORDER BY tcount DESC, token ASC) AS BIGINT) AS token_id
    FROM vtok
)
, wsym AS MATERIALIZED (
    SELECT word, list_filter(string_split(s, '  '), x -> x <> '') AS sl
    FROM w{_BPE_N_MERGES}
)
, dw AS (
    SELECT doc_id, unnest(wl) AS word, unnest(range(1, len(wl) + 1)) AS wpos
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS wl
          FROM documents WHERE text IS NOT NULL AND doc_id < 50)
)
, tokpos AS (
    SELECT doc_id, wpos,
           unnest(sl) AS token, unnest(range(1, len(sl) + 1)) AS spos
    FROM dw JOIN wsym USING (word)
)
, ordered AS (
    SELECT doc_id, token,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1 AS BIGINT) AS pos
    FROM tokpos
)
SELECT o.doc_id, o.pos, ids.token_id
FROM ordered o JOIN ids USING (token)
"""



def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift QA between the even- and odd-numbered sources
    (operators/text.py::token_kl_drift): top-20 tokens by |KL
    contribution|, rank-stable. Both per-token counts and the
    smoothed-KL arithmetic are replayed exactly by the oracle."""
    d = load_table(spark, sf_dir, "documents")
    side = F.substring(F.col("source"), 4, 9).cast("int") % 2
    drift = text.token_kl_drift(d.filter(side == 0), d.filter(side == 1))
    order = [F.abs(F.col("kl_q")).desc(), F.col("tok").asc()]
    return ranked_topk(drift, order, 20, rank_col="rn").select(
        "rn", "tok", "n_a", "n_b", "kl_q"
    )


SQL_TOKEN_DRIFT = r"""
WITH ca AS (
    SELECT tok, count(*) AS n_a
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 0)
    WHERE tok <> '' GROUP BY tok
),
cb AS (
    SELECT tok, count(*) AS n_b
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 1)
    WHERE tok <> '' GROUP BY tok
),
j AS (
    SELECT coalesce(ca.tok, cb.tok) AS tok,
           coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
    FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
),
tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS v FROM j),
kl AS (
    SELECT tok, n_a, n_b,
           CAST(floor(
               (((n_a + 1)::DOUBLE / (ta + v)::DOUBLE)
                * ln(((n_a + 1)::DOUBLE / (ta + v)::DOUBLE)
                     / ((n_b + 1)::DOUBLE / (tb + v)::DOUBLE))
                + ((n_b + 1)::DOUBLE / (tb + v)::DOUBLE)
                  * ln(((n_b + 1)::DOUBLE / (tb + v)::DOUBLE)
                       / ((n_a + 1)::DOUBLE / (ta + v)::DOUBLE)))
               * 10000000 + 0.5) AS BIGINT) AS kl_q
    FROM j CROSS JOIN tot
)
SELECT CAST(row_number() OVER (ORDER BY abs(kl_q) DESC, tok ASC) AS BIGINT) AS rn,
       tok, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, kl_q
FROM kl
ORDER BY abs(kl_q) DESC, tok ASC
LIMIT 20
"""



def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup over REAL binary payloads, value-verified end
    to end: 200 documents synthesize PNGs keyed on ``doc_id % 40``, so
    every payload exists in 5 byte-identical copies; media_exact_dedup
    collapses them by content (hash only distributes the shuffle — the
    payload itself is in the window key, so collisions cannot merge
    distinct bytes) and the survivors are DECODED, giving the oracle
    closed-form width/height/pixel_sum to recompute per surviving key."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_png_media(
        d.select((F.col("doc_id") % 40).alias("img_key")), "img_key"
    )
    kept = multimodal.media_exact_dedup(media)
    return multimodal.decode_image_meta(kept)


SQL_MEDIA_DEDUP = """
WITH k AS (
    SELECT DISTINCT doc_id % 40 AS media_id FROM documents WHERE doc_id < 200
),
d AS (
    SELECT media_id, media_id % 13 + 1 AS width, media_id % 7 + 1 AS height FROM k
),
px AS (
    SELECT media_id, width, height,
           unnest(generate_series(0, width * height * 3 - 1)) AS i
    FROM d
)
SELECT media_id, width, height,
       CAST(3 AS BIGINT) AS channels,
       CAST(SUM((media_id * 31 + i) % 256) AS BIGINT) AS pixel_sum
FROM px GROUP BY media_id, width, height
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality (operators/sketch.hll_registers /
    hll_estimate): estimate distinct l_orderkey over lineitem with 1024
    md5-portable registers and report it next to the exact distinct —
    the fixed-memory distinct-count the profile pass uses when the key
    universe doesn't fit (completes the sketch family: CMS frequency,
    Bloom membership, HLL cardinality). Every 2^-rho term is dyadic
    with the register sum bounded by 2^p, so the double sum is
    order-independent and the oracle lands on the IDENTICAL estimate,
    not an approximation of it."""
    from traceframe_spark.operators import sketch

    li = load_table(spark, sf_dir, "lineitem")
    regs = sketch.hll_registers(li, "l_orderkey", p=10)
    est = sketch.hll_estimate(regs, p=10)
    exact = li.agg(F.countDistinct("l_orderkey").cast("long").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_nonempty",
        "n_empty",
        qint(F.col("est"), 2).alias("est_q"),
        "exact_distinct",
    )


SQL_HLL_DISTINCT = """
WITH keys AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
regs AS (
    SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT % 1024 AS bucket,
           max(CASE WHEN v = 0 THEN 41 ELSE 41 - length(bin(v)) END) AS rho_max
    FROM (SELECT k,
                 ('0x' || substr(md5('rho' || '#' || k), 1, 10))::BIGINT AS v
          FROM keys)
    GROUP BY 1
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_nonempty,
           sum(power(2.0, -rho_max)) AS inv_sum
    FROM regs
),
est AS (
    SELECT n_nonempty,
           CAST(1024 - n_nonempty AS BIGINT) AS n_empty,
           (0.7213 / (1.0 + 1.079 / 1024)) * 1024.0 * 1024.0
               / (inv_sum + (1024 - n_nonempty)) AS raw
    FROM agg
)
SELECT n_nonempty, n_empty,
       CAST(floor(
           CASE WHEN raw <= 2560.0 AND n_empty > 0
                THEN 1024.0 * ln(1024.0 / n_empty)
                ELSE raw END * 100 + 0.5) AS BIGINT) AS est_q,
       (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS exact_distinct
FROM est
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one query: per-source document count, exact
    distinct-content count (dup mass), quality-gate keep count and
    rate, and mean length — the summary table a curation pipeline
    publishes with every corpus snapshot. Pure composition of existing
    pieces (content_key + quality_gate), one scan + one grouped
    aggregate after the gate's zero-shuffle projection."""
    from traceframe_spark.operators.dedup import spread

    # carry source/n_chars through the gate instead of re-joining the
    # corpus onto it: the join broadcast-built the ENTIRE CPU-heavy
    # gate projection in one task (measured 5.1 s single-task stage —
    # the row's whole cost); carry makes the plan one scan → gate
    # projection → grouped aggregate, and the spread runs the
    # projection at cluster width instead of the small file's single
    # row group. Identical rows: the inner join kept exactly the
    # gate's non-NULL-text row set, which is what the gate emits.
    d = load_table(spark, sf_dir, "documents")
    joined = text.quality_gate(
        spread(d, "doc_id", cpu=True), "doc_id", "text",
        carry=("source", "n_chars", "text"),
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct(dedup.content_key("text")).cast("long").alias("n_distinct"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
            qint(F.avg(F.col("keep").cast("double")), 4).alias("keep_rate_q"),
            qint(F.avg(F.col("n_chars").cast("double")), 2).alias("avg_chars_q"),
        )
    )


SQL_CORPUS_REPORT = f"""
WITH gate AS ({SQL_QUALITY_GATE})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(lower(trim(d.text)))) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(floor(avg(CASE WHEN g.keep THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) AS BIGINT) AS keep_rate_q,
       CAST(floor(avg(d.n_chars::DOUBLE) * 100 + 0.5) AS BIGINT) AS avg_chars_q
FROM documents d JOIN gate g ON g.doc_id = d.doc_id
GROUP BY d.source
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 5-gram shingle containment ≥ 0.6 on a bounded doc
    subset (operators/dedup.containment_pairs): the quote/excerpt
    detector — a short doc embedded in a long one scores containment
    ≈ 1 where symmetric Jaccard stays low. Same shingling definition as
    ngram_jaccard; the oracle emits both directions from the shared
    pair-count aggregate."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = dedup.containment_pairs(d, "doc_id", "text", threshold=0.6)
    return pairs.select(
        "id_sub", "id_super", qint(F.col("containment"), 4).alias("containment_q")
    )


SQL_CONTAINMENT_PAIRS = """
WITH docs AS (
    SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id < 150
),
shingled AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, substr(t, CAST(g AS INT), 5) AS sh
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS g
              FROM docs)
    )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
    FROM shingled a JOIN shingled b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
dirs AS (
    SELECT c.id_a AS id_sub, c.id_b AS id_super,
           c.n_common::DOUBLE / sa.n_sh::DOUBLE AS cont
    FROM common c JOIN sizes sa ON sa.doc_id = c.id_a
    UNION ALL
    SELECT c.id_b, c.id_a, c.n_common::DOUBLE / sb.n_sh::DOUBLE
    FROM common c JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_sub, id_super,
       CAST(floor(cont * 10000 + 0.5) AS BIGINT) AS containment_q
FROM dirs WHERE cont >= 0.6
"""


def q_containment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shippable corpus-scale containment composition
    (operators/dedup.containment_pipeline): exact-clone collapse →
    prefix-filtered candidate routing (pigeonhole-exact, rarest
    shingles first) → exact containment verification. The corpus is the
    same bounded subset as ``containment_pairs`` PLUS a shifted exact
    clone of itself, so the query pins both stages at once: stage 1
    must collapse every clone to its canonical (min id), after which
    the answer must EQUAL the raw operator's on the original subset —
    the candidate router provably loses no pair."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 100000))
    pairs = dedup.containment_pipeline(doubled, "doc_id", "text", threshold=0.6)
    return pairs.select(
        "id_sub", "id_super", qint(F.col("containment"), 4).alias("containment_q")
    )


SQL_CONTAINMENT_PIPELINE = """
WITH canon AS (
    -- exact-clone collapse over the doubled corpus: min doc_id per
    -- md5(lower(trim(text))) content key, mirroring exact_canonical_ids
    SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id, md5(lower(trim(text))) AS k
        FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 100000, md5(lower(trim(text)))
        FROM documents WHERE doc_id < 150
    ) GROUP BY k
),
docs AS (
    SELECT d.doc_id, lower(trim(d.text)) AS t
    FROM documents d JOIN canon c ON c.doc_id = d.doc_id
    WHERE d.doc_id < 150
),
shingled AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, substr(t, CAST(g AS INT), 5) AS sh
        FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 4, 1) + 1)) AS g
              FROM docs)
    )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
    FROM shingled a JOIN shingled b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
dirs AS (
    SELECT c.id_a AS id_sub, c.id_b AS id_super,
           c.n_common::DOUBLE / sa.n_sh::DOUBLE AS cont
    FROM common c JOIN sizes sa ON sa.doc_id = c.id_a
    UNION ALL
    SELECT c.id_b, c.id_a, c.n_common::DOUBLE / sb.n_sh::DOUBLE
    FROM common c JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_sub, id_super,
       CAST(floor(cont * 10000 + 0.5) AS BIGINT) AS containment_q
FROM dirs WHERE cont >= 0.6
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest triage (operators/text.ngram_novelty): docs
    with ``doc_id % 10 < 3`` play yesterday's snapshot; the rest are
    scored for the fraction of distinct word 3-grams the snapshot has
    never seen. Novelty ≈ 0 flags re-crawls and boilerplate before the
    full curation pass spends anything on them."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 10 < 3)
    corpus = d.filter(F.col("doc_id") % 10 >= 3)
    # bloom_prefilter stays OFF: this split is the re-crawl shape (ref
    # and corpus share a distribution), where only ~6% of gram mass is
    # novel — the prefilter can remove at most that 6% from the exact
    # join while paying 7 probes per gram plus the Bloom build, and the
    # measured A/B (SCALING.md r08, tools/bench_bloom_ab.py) has it
    # 2.7x SLOWER at 1x AND 100x. The knob is for high-novelty ingest
    # (cross-source split: ~64% novel mass), measured separately there.
    out = text.ngram_novelty(corpus, ref, n=3)
    return out.select(
        "doc_id", "n_grams", "n_novel", qint(F.col("novelty"), 4).alias("novelty_q")
    )


# novelty_q mirrors the ENGINE's float expression shape exactly:
# floor((1 - hit/n) * 1e4 + 0.5), not the algebraically-equal
# (n - hit)/n form — the two can differ in the last ulp at a grid
# boundary (same lesson as SQL_GROUP_AGG's double-floor note).
SQL_NGRAM_NOVELTY = r"""
WITH words AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(w[g:g+2], ' ') AS g
    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS g FROM words)
),
ref AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 < 3),
corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 10 >= 3),
per_doc AS (
    SELECT c.doc_id,
           count(*) AS n_grams,
           count(r.g) AS n_hit
    FROM corpus c LEFT JOIN ref r ON c.g = r.g
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(n_grams - n_hit, 0) AS BIGINT) AS n_novel,
       CAST(floor(coalesce(1.0 - n_hit::DOUBLE / n_grams::DOUBLE, 0.0) * 10000 + 0.5) AS BIGINT) AS novelty_q
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
WHERE d.doc_id % 10 >= 3
"""


def _index_split(spark: SparkSession, sf_dir: str):
    """The shared corpus split for the dedup-index queries: even docs
    are yesterday's indexed snapshot; today's delta is the odd docs
    PLUS an exact clone and a near-clone (8 appended chars) of the
    first 25 indexed docs — so the exact layer and the LSH layer each
    have a guaranteed, deterministic kill set."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 2 == 0)
    seeded = ref.filter(F.col("doc_id") < 50)
    delta = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionByName(
            seeded.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
        .unionByName(
            seeded.select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" the end")).alias("text"),
            )
        )
    )
    return ref, delta


def q_dedup_index_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact layer of the persistent dedup index
    (operators/dedup_index): the snapshot's content keys are WRITTEN to
    a store, and the delta probe anti-joins the STORED keys — the
    snapshot text is never re-read. The exact clones in the delta must
    die; the near-clones and genuinely-new odd docs must survive.
    Oracle: the md5 content-key anti-join is plain SQL, so this query
    is the oracle-green exact twin of the rows-only full probe
    (``dedup_index_delta``)."""
    from traceframe_spark.operators import dedup_index as di

    ref, delta = _index_split(spark, sf_dir)
    path = tmp_store("dedup_index_") + "/idx"
    # exact-only store (with_near=False): the content-key registry
    # shape — no MinHash pass is built or paid for an exact-layer probe
    di.write_dedup_index(ref, path, with_near=False)
    return di.dedup_against_index(delta, path, near_dup=False).select("doc_id")


SQL_DEDUP_INDEX_EXACT = """
WITH ref AS (
    SELECT DISTINCT md5(lower(trim(text))) AS k
    FROM documents WHERE doc_id % 2 = 0
),
delta AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id + 100000, text
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 50
    UNION ALL
    SELECT doc_id + 200000, text || ' the end'
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 50
)
SELECT d.doc_id FROM delta d
WHERE md5(lower(trim(d.text))) NOT IN (SELECT k FROM ref)
"""


def q_dedup_index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full persistent-index probe: exact content keys, then the STORED
    LSH band buckets + MinHash-estimated Jaccard ≥ 0.9 — the daily-delta
    dedup that costs O(delta), never O(snapshot). Built with
    ``portable=True`` (md5-affine hash families, P = 2^31−1, value-keyed
    band buckets — operators/dedup.minhash_signatures), so the ORACLE
    replays the entire probe in SQL: shingles → base md5 hash → 64
    affine minima → band keys → bucket join → agreeing-position
    estimate ≥ 0.9 → anti-join. The LSH machinery itself is
    value-verified, not just rows-counted (the xxhash64 production
    default stays the fast path; layer-kill semantics for it are pinned
    in tests/test_dedup_index.py)."""
    from traceframe_spark.operators import dedup_index as di

    ref, delta = _index_split(spark, sf_dir)
    path = tmp_store("dedup_index_") + "/idx"
    di.write_dedup_index(ref, path, portable=True)
    out = di.dedup_against_index(delta, path, threshold=0.9)
    # carry the probe's persisted signature frame through the
    # projection (operators/dedup._unpersist_with contract): without
    # it the cache dies with `out` and the three concurrent broadcast
    # builds race to recompute the delta MinHash chain
    return dedup.carry_cache(out.select("doc_id"), out)


# Replays the stored-index probe end to end: the same affine family
# constants are DERIVED from the family index i (portable_family), the
# empty-shingle doc folds to the init value P on both engines, and the
# est comparison n_eq/64 >= 0.9 is exact dyadic arithmetic — no float
# divergence surface anywhere in the chain.
SQL_DEDUP_INDEX_DELTA = r"""
WITH ref AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
),
delta AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT doc_id + 100000, text
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 50
    UNION ALL
    SELECT doc_id + 200000, text || ' the end'
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 50
),
surv AS (
    SELECT d.doc_id, d.text FROM delta d
    WHERE md5(lower(trim(d.text))) NOT IN
          (SELECT md5(lower(trim(text))) FROM ref)
),
fam AS (
    SELECT i,
           ((2 * i + 1) * 1103515245) % 2147483647 AS a,
           (i * 104729 + 12345) % 2147483647 AS b
    FROM range(0, 64) t(i)
),
dsh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(substr(t, g::INT, 5)), 1, 8))::BIGINT
               % 2147483647 AS h
    FROM (SELECT doc_id, lower(trim(text)) AS t FROM surv),
         unnest(range(1, greatest(length(t) - 4, 1) + 1)) AS u(g)
),
rsh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(substr(t, g::INT, 5)), 1, 8))::BIGINT
               % 2147483647 AS h
    FROM (SELECT doc_id, lower(trim(text)) AS t FROM ref),
         unnest(range(1, greatest(length(t) - 4, 1) + 1)) AS u(g)
),
dsig AS (
    SELECT s.doc_id, f.i, min((f.a * s.h + f.b) % 2147483647) AS v
    FROM dsh s CROSS JOIN fam f GROUP BY s.doc_id, f.i
),
rsig AS (
    SELECT s.doc_id, f.i, min((f.a * s.h + f.b) % 2147483647) AS v
    FROM rsh s CROSS JOIN fam f GROUP BY s.doc_id, f.i
),
dband AS (
    SELECT doc_id, i // 4 AS band,
           string_agg(v::VARCHAR, '-' ORDER BY i) AS bh
    FROM dsig GROUP BY doc_id, i // 4
),
rband AS (
    SELECT doc_id, i // 4 AS band,
           string_agg(v::VARCHAR, '-' ORDER BY i) AS bh
    FROM rsig GROUP BY doc_id, i // 4
),
cand AS (
    SELECT DISTINCT d.doc_id AS id_d, r.doc_id AS id_r
    FROM dband d JOIN rband r USING (band, bh)
),
near AS (
    SELECT DISTINCT c.id_d
    FROM cand c
    JOIN dsig ds ON ds.doc_id = c.id_d
    JOIN rsig rs ON rs.doc_id = c.id_r AND rs.i = ds.i
    GROUP BY c.id_d, c.id_r
    HAVING (count(*) FILTER (WHERE ds.v = rs.v))::DOUBLE / 64.0 >= 0.9
)
SELECT s.doc_id FROM surv s
WHERE s.doc_id NOT IN (SELECT id_d FROM near)
"""


def q_dedup_index_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full persistent-index probe of ``dedup_index_delta`` run
    against a MANIFEST-protocol store
    (operators/dedup_index.write_dedup_index(protocol="manifest") —
    immutable layer directories + one atomic manifest publish, the
    object-store-safe commit the streaming curation loop uses). The
    commit protocol changes how layers land and how probes resolve
    them (snapshot read of manifest-listed directories, meta from the
    manifest), and must change NOTHING about the stored values — so
    the oracle is ``SQL_DEDUP_INDEX_DELTA`` verbatim: the entire
    portable LSH chain (shingles → md5-affine minima → band keys →
    bucket join → agreement estimate ≥ 0.9 → anti-join) replayed in
    SQL against what the manifest store served back. Atomicity,
    snapshot isolation, and crash replay are pinned in
    tests/test_manifest_curation.py; THIS query value-pins the storage
    roundtrip itself."""
    from traceframe_spark.operators import dedup_index as di

    ref, delta = _index_split(spark, sf_dir)
    path = tmp_store("dedup_index_man_") + "/idx"
    di.write_dedup_index(ref, path, portable=True, protocol="manifest")
    out = di.dedup_against_index(delta, path, threshold=0.9)
    return dedup.carry_cache(out.select("doc_id"), out)


def q_index_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty from the STORED gram layer
    (operators/dedup_index.novelty_against_index): the snapshot docs
    (``doc_id % 10 < 3``, the same split as ``ngram_novelty``) have
    their distinct 3-gram md5 keys written to the index ONCE; the
    corpus side is then scored against the STORED keys — snapshot text
    is never re-grammed. Same answer as the batch operator, so the
    oracle is ``SQL_NGRAM_NOVELTY`` verbatim: the gram key is the full
    128-bit md5 (collision-negligible), and membership via LEFT SEMI
    join cannot double-count a hit. This is the triage half of the
    daily incremental loop; ``dedup_index_exact``/``_delta`` are the
    dedup half."""
    from traceframe_spark.operators import dedup_index as di

    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 10 < 3)
    corpus = d.filter(F.col("doc_id") % 10 >= 3)
    path = tmp_store("gram_index_") + "/idx"
    di.write_gram_layer(ref, path, n=3)
    out = di.novelty_against_index(corpus, path)
    return out.select(
        "doc_id", "n_grams", "n_novel", qint(F.col("novelty"), 4).alias("novelty_q")
    )


def q_index_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination from a STORED gram layer
    (operators/dedup_index.contamination_against_index): the benchmark
    suite (``doc_id % 20 == 0``, the same split as ``contamination``)
    has its distinct 3-gram md5 keys written once; the corpus is scored
    against the stored keys — the eval set is never re-grammed, and at
    100 TB neither is yesterday's already-scored corpus (only the new
    delta probes). Same answer as the batch operator, so the oracle is
    ``SQL_CONTAMINATION`` verbatim."""
    from traceframe_spark.operators import dedup_index as di

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    path = tmp_store("gram_index_") + "/idx"
    di.write_gram_layer(bench, path, n=3)
    out = di.contamination_against_index(corpus, path)
    return out.select(
        "doc_id",
        "n_grams",
        "n_hit",
        qint(F.col("overlap"), 6).alias("overlap_q"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (C4 1910.10683 §2.2 / CCNet 1911.00359 §3
    via operators/text.py::dedup_lines): lines occurring ≥2 times across
    the corpus survive only at their first occurrence, then documents
    are reassembled from the surviving lines. The synthetic docs are
    single-line, so "lines" here are fixed 8-token chunks
    (chunk_documents, overlap=0) — the splitting policy is an input, the
    dedup kernel is what's under test. The engine keys lines by
    xxhash64; the oracle groups the literal strings — identical answers
    barring a 64-bit collision inside 400 docs (~1e-13). ``text_md5``
    pins the reassembled text (order + separator) exactly."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    lines = text.chunk_documents(d, chunk_tokens=8, overlap=0).select(
        "doc_id",
        F.col("chunk_id").alias("line_no"),
        F.col("chunk_text").alias("line"),
    )
    kept = text.dedup_lines(lines, min_occurrences=2)
    docs = text.reassemble_lines(kept)
    return docs.select("doc_id", "n_lines", F.md5("text").alias("text_md5"))


SQL_LINE_DEDUP = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
    FROM documents WHERE doc_id < 400
),
lines AS (
    SELECT doc_id, u.i AS line_no,
           array_to_string(
               list_slice(t, CAST(u.i * 8 + 1 AS INT), CAST(u.i * 8 + 8 AS INT)),
               ' ') AS line
    FROM toks,
         unnest(range(0, greatest(CAST(ceil(len(t) / 8.0) AS BIGINT), 1))) AS u(i)
),
marked AS (
    SELECT doc_id, line_no, line,
           count(*) OVER (PARTITION BY line) AS n_occ,
           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
    FROM lines
)
SELECT doc_id, count(*) AS n_lines,
       md5(string_agg(line, chr(10) ORDER BY line_no)) AS text_md5
FROM marked
WHERE n_occ < 2 OR rn = 1
GROUP BY doc_id
"""


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2302.03169 via
    operators/sampling.py::dsir_importance): hashed 1+2-gram bucket
    models (md5 buckets, engine-portable), target = lang='en', raw =
    the whole bounded corpus; per-doc log importance weight quantized
    at 1e-4 (sum of ln ratios; both engines' libm agree far below
    that — same contract as doc_bigram_logprob)."""
    from traceframe_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    w = sampling.dsir_importance(
        d, is_target=F.col("lang") == "en", buckets=4096
    )
    return w.select(
        "doc_id", "n_grams", qint(F.col("logweight"), 4).alias("logweight_q")
    )


SQL_DSIR_IMPORTANCE = r"""
WITH toks AS (
    SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+') AS t
    FROM documents WHERE doc_id < 400
),
grams AS (
    SELECT doc_id, lang, t[CAST(u.i AS INT)] AS g
    FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    UNION ALL
    SELECT doc_id, lang,
           t[CAST(u.i AS INT)] || ' ' || t[CAST(u.i AS INT) + 1] AS g
    FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
),
bucketed AS (
    SELECT doc_id, lang = 'en' AS tgt,
           ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b
    FROM grams WHERE g <> ''
),
per_doc AS (
    SELECT doc_id, tgt, b, count(*) AS c FROM bucketed GROUP BY 1, 2, 3
),
model AS (
    SELECT b, sum(c) AS raw, coalesce(sum(c) FILTER (WHERE tgt), 0) AS tc
    FROM per_doc GROUP BY b
),
totals AS (SELECT sum(raw) AS r_tot, sum(tc) AS t_tot FROM model),
lam AS (
    SELECT b,
           ln((tc + 1)::DOUBLE / (t_tot + 4096)::DOUBLE)
         - ln((raw + 1)::DOUBLE / (r_tot + 4096)::DOUBLE) AS lam
    FROM model CROSS JOIN totals
)
SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_grams,
       CAST(floor(sum(p.c * l.lam) * 10000 + 0.5) AS BIGINT) AS logweight_q
FROM per_doc p JOIN lam l USING (b)
GROUP BY p.doc_id
"""




def _pq_dim_sum(e_expr: str, c_expr: str) -> str:
    """Explicit left-associated 8-term squared-L2 sum for one PQ
    subspace (dims s*8+1 .. s*8+8) — the SQL twin of
    operators/similarity._pq_subdist: same term order, so both engines
    round identically and the ADC ranking replays bit-for-bit."""
    terms = []
    for j in range(1, 9):
        a = f"(CAST({e_expr}[ss.s*8+{j}] AS DOUBLE) - CAST({c_expr}[ss.s*8+{j}] AS DOUBLE))"
        terms.append(f"{a} * {a}")
    return " + ".join(terms)


_SQL_PQ_ASSIGN = f"""
samp AS (
    SELECT row_number() OVER (ORDER BY h) - 1 AS c, embedding
    FROM (
        SELECT md5('pq|' || CAST(vec_id AS VARCHAR)) AS h, embedding
        FROM embeddings ORDER BY h LIMIT 16
    )
),
ss AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
ad AS (
    SELECT e.vec_id, ss.s, samp.c,
           {_pq_dim_sum('e.embedding', 'samp.embedding')} AS d2
    FROM embeddings e, ss, samp
),
codes AS (
    SELECT vec_id, s, c FROM ad
    QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, c ASC) = 1
)"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (profile.snapshot_diff): old = docs < 400, new =
    docs in [100, 500) with every 10th text perturbed — so all four
    statuses occur: 100-199,…,399 overlap (every 10th 'changed', the
    rest 'unchanged'), <100 'removed', >=400 'added'. The oracle
    replays the presence-flagged, null-safe hash-compare full-outer
    join (NULL-text rows classify by PRESENCE, never by md5(NULL))."""
    from traceframe_spark.operators.profile import snapshot_diff

    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") < 400)
    new = d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 500)).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    out = snapshot_diff(old, new, "doc_id", "text")
    return out.select(F.col("id").alias("doc_id"), "status")


SQL_SNAPSHOT_DIFF = """
WITH old AS (
    SELECT doc_id, md5(text) AS oh, TRUE AS op
    FROM documents WHERE doc_id < 400
),
new AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS nh,
           TRUE AS np
    FROM documents WHERE doc_id >= 100 AND doc_id < 500
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.op IS NULL THEN 'added'
            WHEN n.np IS NULL THEN 'removed'
            WHEN o.oh IS NOT DISTINCT FROM n.nh THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id
"""


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the whole embeddings table with the PORTABLE
    md5-bottom-16 sampled codebooks (similarity.pq_sample_codebooks /
    pq_encode): per vector, the 8 one-byte subspace codewords, joined
    to one string. The oracle replays sampling + per-subspace argmin
    assignment exactly (same explicit-order float sums)."""
    e = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebooks(spark, sf_dir)
    codes = similarity.pq_encode(e, "vec_id", "embedding", cb)
    return codes.select(
        F.col("id").alias("vec_id"),
        F.concat_ws("-", F.col("code")).alias("code_str"),
    )


SQL_PQ_CODES = f"""
WITH {_SQL_PQ_ASSIGN}
SELECT vec_id, string_agg(CAST(c AS VARCHAR), '-' ORDER BY s) AS code_str
FROM codes GROUP BY vec_id
"""


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 per query over the PQ codes (similarity.pq_adc_topk):
    each query's subspace lookup table is computed once, every
    candidate scores with 8 lookups + 7 adds — the compressed-domain
    scan that replaces float vectors with 1-byte codes at 100 TB. The
    approximate distances are bit-deterministic across engines
    (explicit-order sums over exact float32-derived doubles), so the
    oracle replays the RANKING, not just row counts."""
    e = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebooks(spark, sf_dir)
    codes = similarity.pq_encode(e, "vec_id", "embedding", cb)
    q = e.filter(F.col("vec_id") < 10)
    top = similarity.pq_adc_topk(codes, q, "vec_id", "embedding", cb, k=5)
    return top.select("qid", "cid", qint(F.col("ad2"), 4).alias("ad2_q"), "rn")


SQL_PQ_ADC_TOPK = f"""
WITH {_SQL_PQ_ASSIGN},
cw AS (
    SELECT vec_id,
           max(CASE WHEN s = 0 THEN c END) AS k0,
           max(CASE WHEN s = 1 THEN c END) AS k1,
           max(CASE WHEN s = 2 THEN c END) AS k2,
           max(CASE WHEN s = 3 THEN c END) AS k3,
           max(CASE WHEN s = 4 THEN c END) AS k4,
           max(CASE WHEN s = 5 THEN c END) AS k5,
           max(CASE WHEN s = 6 THEN c END) AS k6,
           max(CASE WHEN s = 7 THEN c END) AS k7
    FROM codes GROUP BY vec_id
),
scored AS (
    SELECT q.vec_id AS qid, v.vec_id AS cid,
           l0.d2 + l1.d2 + l2.d2 + l3.d2 + l4.d2 + l5.d2 + l6.d2 + l7.d2 AS ad2
    FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
    JOIN cw v ON v.vec_id <> q.vec_id
    JOIN ad l0 ON l0.vec_id = q.vec_id AND l0.s = 0 AND l0.c = v.k0
    JOIN ad l1 ON l1.vec_id = q.vec_id AND l1.s = 1 AND l1.c = v.k1
    JOIN ad l2 ON l2.vec_id = q.vec_id AND l2.s = 2 AND l2.c = v.k2
    JOIN ad l3 ON l3.vec_id = q.vec_id AND l3.s = 3 AND l3.c = v.k3
    JOIN ad l4 ON l4.vec_id = q.vec_id AND l4.s = 4 AND l4.c = v.k4
    JOIN ad l5 ON l5.vec_id = q.vec_id AND l5.s = 5 AND l5.c = v.k5
    JOIN ad l6 ON l6.vec_id = q.vec_id AND l6.s = 6 AND l6.c = v.k6
    JOIN ad l7 ON l7.vec_id = q.vec_id AND l7.s = 7 AND l7.c = v.k7
)
SELECT qid, cid,
       CAST(floor(ad2 * 10000 + 0.5) AS BIGINT) AS ad2_q,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS BIGINT) AS rn
FROM scored
QUALIFY rn <= 5
"""


def q_ann_adc_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ADC recall instrument itself, value-verified
    (operators/similarity.ann_adc_agreement — the bitext_ann_agree
    precedent for the compressed tier): per query, did ADC's top-1
    over the PORTABLE sampled codebooks pick the same corpus vector
    as exact cosine's top-1? Both argmaxes come off ONE scored-pair
    table carrying each pair's exact quantized cosine AND its ADC
    distance, so the recall number in SCALING.md's sampled-vs-trained
    table is a value-checked property, not a sampled estimate. The
    oracle replays codebook sampling, per-subspace assignment, the
    lookup-table distances (same explicit-order float sums), and both
    rankings."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 25)
    return similarity.ann_adc_agreement(
        e, q, "vec_id", "embedding", _pq_codebooks(spark, sf_dir)
    )


# Both tiers' argmaxes off ONE scored-pair table: `ad` (the per-vector
# subspace distances to every sampled codeword) doubles as the ADC
# lookup table for the query side, `codes` pivots to the corpus side's
# codewords, and the exact cosine joins the same (qid, cid) universe —
# one pair table, two row_number(1) picks.
SQL_ANN_ADC_AGREE = f"""
WITH {_SQL_PQ_ASSIGN},
cw AS (
    SELECT vec_id,
           max(CASE WHEN s = 0 THEN c END) AS k0,
           max(CASE WHEN s = 1 THEN c END) AS k1,
           max(CASE WHEN s = 2 THEN c END) AS k2,
           max(CASE WHEN s = 3 THEN c END) AS k3,
           max(CASE WHEN s = 4 THEN c END) AS k4,
           max(CASE WHEN s = 5 THEN c END) AS k5,
           max(CASE WHEN s = 6 THEN c END) AS k6,
           max(CASE WHEN s = 7 THEN c END) AS k7
    FROM codes GROUP BY vec_id
),
norms AS (
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
        WHERE q.vec_id < 25 AND c.vec_id <> q.vec_id
    )
    GROUP BY qid, cid
),
scored AS (
    SELECT d.qid, d.cid,
           CAST(floor(d.dot / (nq.nrm * nc.nrm) * 10000 + 0.5) AS BIGINT) AS cos,
           l0.d2 + l1.d2 + l2.d2 + l3.d2 + l4.d2 + l5.d2 + l6.d2 + l7.d2 AS ad2
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.qid
    JOIN norms nc ON nc.vec_id = d.cid
    JOIN cw v ON v.vec_id = d.cid
    JOIN ad l0 ON l0.vec_id = d.qid AND l0.s = 0 AND l0.c = v.k0
    JOIN ad l1 ON l1.vec_id = d.qid AND l1.s = 1 AND l1.c = v.k1
    JOIN ad l2 ON l2.vec_id = d.qid AND l2.s = 2 AND l2.c = v.k2
    JOIN ad l3 ON l3.vec_id = d.qid AND l3.s = 3 AND l3.c = v.k3
    JOIN ad l4 ON l4.vec_id = d.qid AND l4.s = 4 AND l4.c = v.k4
    JOIN ad l5 ON l5.vec_id = d.qid AND l5.s = 5 AND l5.c = v.k5
    JOIN ad l6 ON l6.vec_id = d.qid AND l6.s = 6 AND l6.c = v.k6
    JOIN ad l7 ON l7.vec_id = d.qid AND l7.s = 7 AND l7.c = v.k7
),
ranked AS (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS re,
           row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS ra
    FROM scored
)
SELECT e.qid, e.cid AS cid_exact, a.cid AS cid_adc,
       CAST(CASE WHEN a.cid = e.cid THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM (SELECT qid, cid FROM ranked WHERE re = 1) e
LEFT JOIN (SELECT qid, cid FROM ranked WHERE ra = 1) a USING (qid)
"""


def q_ann_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 through a PERSISTED manifest IVF-PQ index
    (write_ivf_index(pq_samples=...) + ivf_adc_topk_over_index) at
    nprobe = n_centroids: full probe makes candidate generation the
    whole corpus, so the result must EQUAL pq_adc_topk's — the same
    DuckDB ADC oracle pins the store roundtrip (codes + codebooks +
    centroids committed and served back in one snapshot) AND the
    composed probe machinery, the same full-probe-equals-exhaustive
    discipline ann_ivf_manifest uses for the float tier."""
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    path = tmp_store("ivfpq_") + "/ivfpq"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding",
        centroids=_ivf_centroids(spark, sf_dir, 8), protocol="manifest",
        pq_samples=_pq_codebooks(spark, sf_dir),
    )
    top = similarity.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=5, nprobe=8
    )
    return top.select("qid", "cid", qint(F.col("ad2"), 4).alias("ad2_q"), "rn")


def q_ann_opq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 through an OPQ-ROTATED trained IVF-PQ index
    (write_ivf_index(pq_samples=16, opq_rotate=True) +
    ivf_adc_topk_over_index at full probe): the orthogonal rotation
    (Ge et al. CVPR 2013) and the per-subspace k-means books both ride
    the manifest; encode, probe LUT, and ranking all run in rotated
    space. ROWS-ONLY by design — the eigendecomposition behind the
    rotation is not SQL-replayable — twinned by the value-verified
    unrotated chain (``ann_ivfpq_adc``, same machinery minus the
    rotation) and pinned by parity tests: streamed==batch on rotated
    indexes, rotation orthogonality, and re-rank-tier equality with
    exact cosine (tests/test_pq.py::test_opq_*)."""
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    path = tmp_store("opq_") + "/opq"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding",
        centroids=_ivf_centroids(spark, sf_dir, 8), protocol="manifest",
        pq_samples=16, opq_rotate=True,
    )
    top = similarity.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=5, nprobe=8
    )
    return top.select("qid", "cid", qint(F.col("ad2"), 4).alias("ad2_q"), "rn")


_PQ_CODEBOOKS: dict = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    key = sf_dir
    if key not in _PQ_CODEBOOKS:
        e = load_table(spark, sf_dir, "embeddings")
        _PQ_CODEBOOKS[key] = similarity.pq_sample_codebooks(
            e, "vec_id", "embedding"
        )
    return _PQ_CODEBOOKS[key]


_IVFPQ_RES: dict = {}


def _ivfpq_res_setup(spark: SparkSession, sf_dir: str) -> tuple:
    """Data-derived centroids (embeddings vec_id < 8, list id ==
    vec_id) + residual codebooks over them — residual codes depend on
    the assignment, so unlike the raw-PQ oracle the quantizer itself
    must be SQL-replayable; corpus-row centroids are, k-means-trained
    ones are not."""
    if sf_dir not in _IVFPQ_RES:
        e = load_table(spark, sf_dir, "embeddings")
        rows = e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        cents = [[float(x) for x in r["embedding"]] for r in rows]
        cb = similarity.pq_residual_codebooks(
            e, "vec_id", "embedding", cents
        )
        _IVFPQ_RES[sf_dir] = (cents, cb)
    return _IVFPQ_RES[sf_dir]


def q_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL-coded IVF-PQ — the full IVFADC formulation (Jégou et
    al. TPAMI 2011 §IV): each stored row's code quantizes its residual
    to its assigned coarse centroid, and a probe's lookup tables are
    per (query, probed list) over q - c(list). Because the codes now
    DEPEND on the coarse assignment, the oracle replays the entire
    composition by value: centroid assignment (explicit left-assoc
    squared-L2 chains, ties to lowest list), residual codebook
    derivation (md5-bottom-16 sample, assigned and subtracted in SQL),
    residual encoding, per-list query tables, ADC ranking. Full probe
    == exhaustive residual ADC, the same discipline as
    ann_ivfpq_adc — but here the quantizer is inside the pin."""
    e = load_table(spark, sf_dir, "embeddings")
    cents, cb = _ivfpq_res_setup(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    path = tmp_store("ivfpq_res_") + "/ivfpq"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding", centroids=cents,
        protocol="manifest", pq_samples=cb, pq_residual=True,
    )
    top = similarity.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=5, nprobe=8
    )
    return top.select("qid", "cid", qint(F.col("ad2"), 4).alias("ad2_q"), "rn")


def q_ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard IVFADC refinement (Jégou et al. §V.C): ADC builds
    a 20-candidate shortlist per query (compressed-domain scan), then
    only those 20 pay a raw-vector read and an exact quantized-cosine
    re-rank to the final top-5 — at 100 TB the float I/O follows the
    shortlist, never the probed candidate mass. Full probe makes the
    shortlist the global ADC top-20, so the oracle replays the whole
    two-tier decision: ADC ranking to 20, exact cosine over exactly
    those pairs, final (cos desc, cid asc) top-5."""
    from traceframe_spark.plans.catalog import tmp_store

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    path = tmp_store("ivfpq_rr_") + "/ivfpq"
    similarity.write_ivf_index(
        e, path, "vec_id", "embedding",
        centroids=_ivf_centroids(spark, sf_dir, 8), protocol="manifest",
        pq_samples=_pq_codebooks(spark, sf_dir),
    )
    top = similarity.ivf_adc_topk_over_index(
        spark, path, q, "vec_id", "embedding", k=20, nprobe=8, rerank_k=5
    )
    return top.select("qid", "cid", "cos", "rn")


SQL_ANN_IVFPQ_RERANK = f"""
WITH {_SQL_PQ_ASSIGN},
cw AS MATERIALIZED (
    SELECT vec_id,
           max(CASE WHEN s = 0 THEN c END) AS k0,
           max(CASE WHEN s = 1 THEN c END) AS k1,
           max(CASE WHEN s = 2 THEN c END) AS k2,
           max(CASE WHEN s = 3 THEN c END) AS k3,
           max(CASE WHEN s = 4 THEN c END) AS k4,
           max(CASE WHEN s = 5 THEN c END) AS k5,
           max(CASE WHEN s = 6 THEN c END) AS k6,
           max(CASE WHEN s = 7 THEN c END) AS k7
    FROM codes GROUP BY vec_id
),
lutq AS MATERIALIZED (
    SELECT vec_id, s, c, d2 FROM ad WHERE vec_id < 10
),
shortlist AS MATERIALIZED (
    SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, v.vec_id AS cid,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY l0.d2 + l1.d2 + l2.d2 + l3.d2 + l4.d2 + l5.d2 + l6.d2 + l7.d2 ASC,
                            v.vec_id ASC
               ) AS arn
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
        JOIN cw v ON v.vec_id <> q.vec_id
        JOIN lutq l0 ON l0.vec_id = q.vec_id AND l0.s = 0 AND l0.c = v.k0
        JOIN lutq l1 ON l1.vec_id = q.vec_id AND l1.s = 1 AND l1.c = v.k1
        JOIN lutq l2 ON l2.vec_id = q.vec_id AND l2.s = 2 AND l2.c = v.k2
        JOIN lutq l3 ON l3.vec_id = q.vec_id AND l3.s = 3 AND l3.c = v.k3
        JOIN lutq l4 ON l4.vec_id = q.vec_id AND l4.s = 4 AND l4.c = v.k4
        JOIN lutq l5 ON l5.vec_id = q.vec_id AND l5.s = 5 AND l5.c = v.k5
        JOIN lutq l6 ON l6.vec_id = q.vec_id AND l6.s = 6 AND l6.c = v.k6
        JOIN lutq l7 ON l7.vec_id = q.vec_id AND l7.s = 7 AND l7.c = v.k7
    ) WHERE arn <= 20
)
SELECT qid, cid,
       CAST(floor(
           list_sum(list_transform(generate_series(1, 64),
               i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(ec.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           * 10000 + 0.5) AS BIGINT) AS cos,
       CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY floor(
               list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(eq.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(ec.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000 + 0.5) DESC, cid ASC
       ) AS BIGINT) AS rn
FROM shortlist s
JOIN embeddings eq ON eq.vec_id = s.qid
JOIN embeddings ec ON ec.vec_id = s.cid
QUALIFY rn <= 5
"""


def _sql_d2_full(e_expr: str, c_expr: str) -> str:
    """Explicit left-associated 64-term squared-L2 chain — the SQL twin
    of operators/similarity._dist2's fold (0.0 + t1 + t2 + ...): same
    term order, so assignment argmins tie identically."""
    terms = []
    for i in range(1, 65):
        a = f"(CAST({e_expr}[{i}] AS DOUBLE) - CAST({c_expr}[{i}] AS DOUBLE))"
        terms.append(f"{a} * {a}")
    return " + ".join(terms)


SQL_ANN_IVFPQ_RESIDUAL = f"""
WITH
cent AS (
    SELECT vec_id AS lid, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
assign AS MATERIALIZED (
    SELECT vec_id, lid FROM (
        SELECT e.vec_id, c.lid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_d2_full('e.embedding', 'c.cvec')} ASC, c.lid ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
),
samp AS (
    SELECT row_number() OVER (ORDER BY h) - 1 AS c, embedding
    FROM (
        SELECT md5('pq|' || CAST(vec_id AS VARCHAR)) AS h, embedding
        FROM embeddings ORDER BY h LIMIT 16
    )
),
samp_res AS MATERIALIZED (
    SELECT c, rvec FROM (
        SELECT s.c,
               list_transform(generate_series(1, 64),
                   i -> CAST(s.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS rvec,
               row_number() OVER (
                   PARTITION BY s.c
                   ORDER BY {_sql_d2_full('s.embedding', 'ct.cvec')} ASC, ct.lid ASC
               ) AS rn
        FROM samp s CROSS JOIN cent ct
    ) WHERE rn = 1
),
vres AS MATERIALIZED (
    SELECT e.vec_id, a.lid,
           list_transform(generate_series(1, 64),
               i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS rv
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id
    JOIN cent ct ON ct.lid = a.lid
),
ss AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
ad AS MATERIALIZED (
    SELECT v.vec_id, v.lid, ss.s, sa.c,
           {_pq_dim_sum('v.rv', 'sa.rvec')} AS d2
    FROM vres v, ss, samp_res sa
),
codes AS MATERIALIZED (
    SELECT vec_id, lid, s, c FROM ad
    QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, c ASC) = 1
),
cw AS MATERIALIZED (
    SELECT vec_id, any_value(lid) AS lid,
           max(CASE WHEN s = 0 THEN c END) AS k0,
           max(CASE WHEN s = 1 THEN c END) AS k1,
           max(CASE WHEN s = 2 THEN c END) AS k2,
           max(CASE WHEN s = 3 THEN c END) AS k3,
           max(CASE WHEN s = 4 THEN c END) AS k4,
           max(CASE WHEN s = 5 THEN c END) AS k5,
           max(CASE WHEN s = 6 THEN c END) AS k6,
           max(CASE WHEN s = 7 THEN c END) AS k7
    FROM codes GROUP BY vec_id
),
qres AS MATERIALIZED (
    SELECT e.vec_id AS qid, ct.lid,
           list_transform(generate_series(1, 64),
               i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE)) AS qr
    FROM embeddings e CROSS JOIN cent ct WHERE e.vec_id < 10
),
qlut AS MATERIALIZED (
    SELECT q.qid, q.lid, ss.s, sa.c,
           {_pq_dim_sum('q.qr', 'sa.rvec')} AS d2
    FROM qres q, ss, samp_res sa
),
scored AS (
    SELECT q.qid, v.vec_id AS cid,
           l0.d2 + l1.d2 + l2.d2 + l3.d2 + l4.d2 + l5.d2 + l6.d2 + l7.d2 AS ad2
    FROM (SELECT DISTINCT qid FROM qres) q
    JOIN cw v ON v.vec_id <> q.qid
    JOIN qlut l0 ON l0.qid = q.qid AND l0.lid = v.lid AND l0.s = 0 AND l0.c = v.k0
    JOIN qlut l1 ON l1.qid = q.qid AND l1.lid = v.lid AND l1.s = 1 AND l1.c = v.k1
    JOIN qlut l2 ON l2.qid = q.qid AND l2.lid = v.lid AND l2.s = 2 AND l2.c = v.k2
    JOIN qlut l3 ON l3.qid = q.qid AND l3.lid = v.lid AND l3.s = 3 AND l3.c = v.k3
    JOIN qlut l4 ON l4.qid = q.qid AND l4.lid = v.lid AND l4.s = 4 AND l4.c = v.k4
    JOIN qlut l5 ON l5.qid = q.qid AND l5.lid = v.lid AND l5.s = 5 AND l5.c = v.k5
    JOIN qlut l6 ON l6.qid = q.qid AND l6.lid = v.lid AND l6.s = 6 AND l6.c = v.k6
    JOIN qlut l7 ON l7.qid = q.qid AND l7.lid = v.lid AND l7.s = 7 AND l7.c = v.k7
)
SELECT qid, cid,
       CAST(floor(ad2 * 10000 + 0.5) AS BIGINT) AS ad2_q,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS BIGINT) AS rn
FROM scored
QUALIFY rn <= 5
"""


PIPELINE_QUERIES = {
    "quality_resample": q_quality_resample,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_merges": q_bpe_merges,
    "bpe_vocab": q_bpe_vocab,
    "bpe_encode_lens": q_bpe_encode_lens,
    "bpe_store_encode": q_bpe_store_encode,
    "snapshot_diff": q_snapshot_diff,
    "audio_features": q_audio_features,
    "video_features": q_video_features,
    "doc_pagerank": q_doc_pagerank,
    "doc_triangles": q_doc_triangles,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "bloom_prefilter": q_bloom_prefilter,
    "ngram_jaccard": q_ngram_jaccard,
    "dup_windows": q_dup_windows,
    "dup_span_removal": q_dup_span_removal,
    "doc_bigram_logprob": q_doc_bigram_logprob,
    "lm_store_score": q_lm_store_score,
    "minhash_verified": q_minhash_verified,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "dedup_pipeline": q_dedup_pipeline,
    "cross_dedup": q_cross_dedup,
    "contamination": q_contamination,
    "column_profile": q_column_profile,
    "doc_entropy": q_doc_entropy,
    "doc_chunks": q_doc_chunks,
    "doc_quality": q_doc_quality,
    "doc_lang_id": q_doc_lang_id,
    "doc_repetition": q_doc_repetition,
    "doc_pii": q_doc_pii,
    "pack_sequences": q_pack_sequences,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
    "ann_ivf_manifest": q_ann_ivf_manifest,
    "pq_codes": q_pq_codes,
    "pq_adc_topk": q_pq_adc_topk,
    "ann_ivfpq_adc": q_ann_ivfpq_adc,
    "ann_ivfpq_residual": q_ann_ivfpq_residual,
    "ann_ivfpq_rerank": q_ann_ivfpq_rerank,
    "embed_near_dup": q_embed_near_dup,
    "media_features": q_media_features,
    "quality_gate": q_quality_gate,
    "curation_flow": q_curation_flow,
    "bpe_token_ids": q_bpe_token_ids,
    "token_drift": q_token_drift,
    "media_dedup": q_media_dedup,
    # r06 additions — registered at the tail so the recorded head-50
    # (rotation + refreshers) is untouched
    "containment_pairs": q_containment_pairs,
    "ngram_novelty": q_ngram_novelty,
    "hll_distinct": q_hll_distinct,
    "corpus_report": q_corpus_report,
    # r07 additions — placed into the registry head by _R7_ROTATION_HEAD
    # so they get driver-recorded the round they land (the r06 lesson)
    "containment_pipeline": q_containment_pipeline,
    # r08 additions — rotated into the head by _R8_ROTATION_HEAD
    "dedup_index_exact": q_dedup_index_exact,
    "dedup_index_delta": q_dedup_index_delta,
    "line_dedup": q_line_dedup,
    "dsir_importance": q_dsir_importance,
    "index_novelty": q_index_novelty,
    "index_contamination": q_index_contamination,
    "minhash_portable_pairs": q_minhash_portable_pairs,
    "simhash_portable_pairs": q_simhash_portable_pairs,
    "ann_lsh_portable": q_ann_lsh_portable,
    "bitext_mine": q_bitext_mine,
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
    # r10 additions — rotated into the head by _R10_ROTATION_HEAD
    "bitext_mine_ann": q_bitext_mine_ann,
    "bitext_ann_agree": q_bitext_ann_agree,
    # r11 additions — led the r11 head; r12 rotates its own newcomers forward
    "dedup_index_manifest": q_dedup_index_manifest,
    "lm_manifest_score": q_lm_manifest_score,
    # r13 additions — rotated into the head by _R13_ROTATION_HEAD
    "ann_adc_agree": q_ann_adc_agree,
    "ivf_id_membership": q_ivf_id_membership,
    "perplexity_buckets": q_perplexity_buckets,
    "perplexity_buckets_sampled": q_perplexity_buckets_sampled,
    "ppl_bucket_agree": q_ppl_bucket_agree,
    "image_dhash": q_image_dhash,
    "image_near_dup": q_image_near_dup,
    "unigram_vocab": q_unigram_vocab,
    "unigram_encode_lens": q_unigram_encode_lens,
    "ann_opq_adc": q_ann_opq_adc,
    "url_normalize": q_url_normalize,
    "domain_gate": q_domain_gate,
    "domain_cap": q_domain_cap,
    "web_curation_flow": q_web_curation_flow,
}

PIPELINE_ORACLE_SQL = {
    "quality_resample": SQL_QUALITY_RESAMPLE,
    "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
    "bpe_merges": SQL_BPE_MERGES,
    "bpe_vocab": SQL_BPE_VOCAB,
    "bpe_encode_lens": SQL_BPE_ENCODE_LENS,
    "bpe_store_encode": SQL_BPE_ENCODE_LENS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "dup_windows": SQL_DUP_WINDOWS,
    "dup_span_removal": SQL_DUP_SPAN_REMOVAL,
    "doc_bigram_logprob": SQL_DOC_BIGRAM_LOGPROB,
    "lm_store_score": SQL_DOC_BIGRAM_LOGPROB,
    "minhash_verified": SQL_MINHASH_VERIFIED,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_keep_canonical": SQL_DEDUP_KEEP_CANONICAL,
    "dedup_pipeline": SQL_DEDUP_PIPELINE,
    "cross_dedup": SQL_CROSS_DEDUP,
    "contamination": SQL_CONTAMINATION,
    "column_profile": SQL_COLUMN_PROFILE,
    "doc_entropy": SQL_DOC_ENTROPY,
    "doc_chunks": SQL_DOC_CHUNKS,
    "ann_ivf_exhaustive": SQL_ANN_COSINE_TOPK,
    "ann_ivf_manifest": SQL_ANN_COSINE_TOPK,
    "pq_codes": SQL_PQ_CODES,
    "pq_adc_topk": SQL_PQ_ADC_TOPK,
    "ann_ivfpq_adc": SQL_PQ_ADC_TOPK,
    "ann_adc_agree": SQL_ANN_ADC_AGREE,
    "ivf_id_membership": SQL_IVF_ID_MEMBERSHIP,
    "perplexity_buckets": SQL_PERPLEXITY_BUCKETS,
    "perplexity_buckets_sampled": SQL_PERPLEXITY_BUCKETS_SAMPLED,
    "ppl_bucket_agree": SQL_PPL_BUCKET_AGREE,
    "image_dhash": SQL_IMAGE_DHASH,
    "image_near_dup": SQL_IMAGE_NEAR_DUP,
    "unigram_vocab": SQL_UNIGRAM_VOCAB,
    "unigram_encode_lens": SQL_UNIGRAM_ENCODE_LENS,
    "url_normalize": SQL_URL_NORMALIZE,
    "domain_gate": SQL_DOMAIN_GATE,
    "domain_cap": SQL_DOMAIN_CAP,
    "web_curation_flow": SQL_WEB_CURATION_FLOW,
    "ann_ivfpq_residual": SQL_ANN_IVFPQ_RESIDUAL,
    "ann_ivfpq_rerank": SQL_ANN_IVFPQ_RERANK,
    "embed_near_dup": SQL_EMBED_NEAR_DUP,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_pii": SQL_DOC_PII,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "quality_gate": SQL_QUALITY_GATE,
    "curation_flow": SQL_CURATION_FLOW,
    "bpe_token_ids": SQL_BPE_TOKEN_IDS,
    "token_drift": SQL_TOKEN_DRIFT,
    "media_dedup": SQL_MEDIA_DEDUP,
    # real PNG decode: closed-form pixels make the decoded stats exactly
    # SQL-computable — media decode leaves the rows-only list
    "media_features": SQL_MEDIA_FEATURES,
    "audio_features": SQL_AUDIO_FEATURES,
    "video_features": SQL_VIDEO_FEATURES,
    "doc_pagerank": SQL_DOC_PAGERANK,
    "doc_triangles": SQL_DOC_TRIANGLES,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "bloom_prefilter": SQL_BLOOM_PREFILTER,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "hll_distinct": SQL_HLL_DISTINCT,
    "corpus_report": SQL_CORPUS_REPORT,
    "containment_pipeline": SQL_CONTAINMENT_PIPELINE,
    "dedup_index_exact": SQL_DEDUP_INDEX_EXACT,
    "dedup_index_delta": SQL_DEDUP_INDEX_DELTA,
    "line_dedup": SQL_LINE_DEDUP,
    "dsir_importance": SQL_DSIR_IMPORTANCE,
    # same split, same gram semantics, same output shape — the stored
    # gram layer changes WHERE the reference grams come from, not the
    # answer, so the batch operator's oracle applies verbatim
    "index_novelty": SQL_NGRAM_NOVELTY,
    "index_contamination": SQL_CONTAMINATION,
    "minhash_portable_pairs": SQL_MINHASH_PORTABLE_PAIRS,
    "simhash_portable_pairs": SQL_SIMHASH_PORTABLE_PAIRS,
    "ann_lsh_portable": SQL_ANN_LSH_PORTABLE,
    "bitext_mine": SQL_BITEXT_MINE,
    "bitext_mine_ann": SQL_BITEXT_MINE_ANN,
    "bitext_ann_agree": SQL_BITEXT_ANN_AGREE,
    # the commit protocol changes how layers land, never their values:
    # the append-protocol oracles apply verbatim to the manifest twins
    "dedup_index_manifest": SQL_DEDUP_INDEX_DELTA,
    "lm_manifest_score": SQL_DOC_BIGRAM_LOGPROB,
    "ann_lsh_multiprobe": SQL_ANN_LSH_MULTIPROBE,
}
