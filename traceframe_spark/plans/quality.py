"""Published LLM-corpus quality rule sets as oracle-checked queries:
the Gopher repetition + composition filters (Rae et al. 2112.11446,
Table A1) and the C4 line/page cleaning rules (Raffel et al.
1910.10683 §2.2) — the filter families every production training-data
pipeline runs before dedup/mixing.

Plan shape (the 100 TB story): every signal is a native Catalyst
expression inside :mod:`traceframe_spark.operators.text`
(``gopher_repetition_signals`` / ``gopher_quality_flags`` /
``c4_line_filter``), so each query is a ZERO-SHUFFLE projection over
the corpus scan — per-document work is bounded by document length,
never corpus size, and whole-stage codegen keeps it JVM-side.

The synthetic ``documents`` table is single-line word soup, so the
queries PLANT structure deterministically (the planted-PII precedent):
line breaks from a literal token replacement, a duplicated first line,
a repeated leading 10-gram, stop words / poison markers keyed on
``doc_id`` — both engines replay the same construction, so every
signal is exercised against real variation and the oracle verifies
the FULL chain (planting included) by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traceframe_spark.operators import text as T
from traceframe_spark.plans.catalog import load_table, qint


def _planted_lines(col):
    """Deterministic multi-line text: every literal ``' table'`` becomes
    a line break, the first line is duplicated at the end (line-dup
    signal), and the doc's own first 10 words are appended (5-gram-dup
    signal). Pure string expressions — DuckDB replays verbatim."""
    lined = F.replace(col, F.lit(" table"), F.lit("\n"))
    first_line = F.element_at(F.split(lined, "\n"), 1)
    first10 = F.array_join(
        F.slice(F.split(F.trim(col), r"\s+"), 1, 10), " "
    )
    return F.concat(lined, F.lit("\n"), first_line, F.lit(" "), first10)


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals over line-planted documents: duplicate
    line fraction (count and chars), top-2-gram char coverage, and
    duplicated-5-gram char coverage (both UNION form, <= 1). The oracle
    replays lines/grams/coverage with window functions + unnest —
    structurally the same relational plan the operator itself runs."""
    from traceframe_spark.operators.dedup import spread

    d = load_table(spark, sf_dir, "documents")
    # spread before the repetition kernel (line/gram coverage is a
    # CPU-bound per-doc computation; the small corpus scans as one row
    # group and otherwise runs single-task — the quality_gate width rule)
    planted = spread(d, "doc_id", cpu=True).select(
        "doc_id", _planted_lines(F.col("text")).alias("text")
    )
    r = T.gopher_repetition_profile(planted, "doc_id", "text")
    return r.select(
        "doc_id",
        "n_lines",
        qint(F.col("dup_line_frac"), 4).alias("dup_line_frac_q"),
        qint(F.col("dup_line_char_frac"), 4).alias("dup_line_char_frac_q"),
        qint(F.col("top_2gram_char_frac"), 4).alias("top2_char_frac_q"),
        qint(F.col("dup_5gram_char_frac"), 4).alias("dup5_char_frac_q"),
    )


SQL_GOPHER_REPETITION = r"""
WITH planted AS (
    SELECT doc_id,
           replace(text, ' table', chr(10)) || chr(10)
           || split_part(replace(text, ' table', chr(10)), chr(10), 1)
           || ' '
           || array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), 1, 10), ' ')
               AS t
    FROM documents
),
lines AS (
    SELECT doc_id, trim(u.l) AS line
    FROM planted, UNNEST(string_split(t, chr(10))) AS u(l)
    WHERE trim(u.l) <> ''
),
ls AS (
    SELECT doc_id, count(*) AS n_lines, sum(len(line)) AS line_chars
    FROM lines GROUP BY doc_id
),
dls AS (
    SELECT doc_id, count(*) AS nd_lines, sum(len(line)) AS dist_chars
    FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY doc_id
),
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(t)), '\s+')) AS w,
           CAST(generate_subscripts(regexp_split_to_array(lower(trim(t)), '\s+'), 1)
                AS BIGINT) AS i
    FROM planted
),
tokc AS (SELECT doc_id, sum(len(w)) AS total_wchars FROM toks GROUP BY doc_id),
g2 AS (
    SELECT doc_id, i,
           w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS g
    FROM toks QUALIFY g IS NOT NULL
),
top2 AS (
    SELECT doc_id, g
    FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
    QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY c DESC, c * len(g) DESC, g DESC
    ) = 1
),
cov2 AS (
    SELECT DISTINCT g2.doc_id, g2.i + k.o AS pos
    FROM g2 JOIN top2 ON g2.doc_id = top2.doc_id AND g2.g = top2.g,
         (SELECT 0 AS o UNION ALL SELECT 1) k
),
cov2c AS (
    SELECT c.doc_id, sum(len(t.w)) AS covered
    FROM cov2 c JOIN toks t ON t.doc_id = c.doc_id AND t.i = c.pos
    GROUP BY c.doc_id
),
g5 AS (
    SELECT doc_id, i,
           w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
             || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS g
    FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
    QUALIFY g IS NOT NULL
),
dup5 AS (
    SELECT doc_id, g FROM g5 GROUP BY doc_id, g HAVING count(*) > 1
),
cov5 AS (
    SELECT DISTINCT g5.doc_id, g5.i + k.o AS pos
    FROM g5 JOIN dup5 ON g5.doc_id = dup5.doc_id AND g5.g = dup5.g,
         (SELECT unnest(range(5)) AS o) k
),
cov5c AS (
    SELECT c.doc_id, sum(len(t.w)) AS covered
    FROM cov5 c JOIN toks t ON t.doc_id = c.doc_id AND t.i = c.pos
    GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(floor(coalesce((ls.n_lines - dls.nd_lines) * 1.0
                           / greatest(ls.n_lines, 1), 0) * 10000 + 0.5) AS BIGINT)
           AS dup_line_frac_q,
       CAST(floor(coalesce((ls.line_chars - dls.dist_chars) * 1.0
                           / greatest(ls.line_chars, 1), 0) * 10000 + 0.5) AS BIGINT)
           AS dup_line_char_frac_q,
       CAST(floor(coalesce(cov2c.covered * 1.0 / greatest(tokc.total_wchars, 1), 0)
                  * 10000 + 0.5) AS BIGINT) AS top2_char_frac_q,
       CAST(floor(coalesce(cov5c.covered * 1.0 / greatest(tokc.total_wchars, 1), 0)
                  * 10000 + 0.5) AS BIGINT) AS dup5_char_frac_q
FROM documents d
LEFT JOIN ls USING (doc_id)
LEFT JOIN dls USING (doc_id)
LEFT JOIN tokc USING (doc_id)
LEFT JOIN cov2c USING (doc_id)
LEFT JOIN cov5c USING (doc_id)
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher composition signals + the published keep gate, with stop
    words planted on every third document so the verdict varies (the
    synthetic vocabulary contains only 'the' from the Gopher list)."""
    d = load_table(spark, sf_dir, "documents")
    t2 = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" and that have"))
    ).otherwise(F.col("text"))
    q = T.gopher_quality_flags(t2)
    return d.select(
        "doc_id",
        q["n_words"].alias("n_words"),
        qint(q["mean_word_len"], 4).alias("mean_word_len_q"),
        qint(q["symbol_word_ratio"], 4).alias("symbol_ratio_q"),
        qint(q["alpha_word_frac"], 4).alias("alpha_frac_q"),
        q["n_stopwords_present"].alias("n_stop"),
        q["keep"].alias("keep"),
    )


SQL_GOPHER_QUALITY = r"""
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || ' and that have' ELSE text END AS t
    FROM documents
),
toks AS (
    SELECT doc_id, u.w
    FROM planted,
         UNNEST(regexp_split_to_array(lower(trim(t)), '\s+')) AS u(w)
    WHERE u.w <> ''
),
ws AS (
    SELECT doc_id,
           count(*) AS n_words,
           sum(len(regexp_replace(w, '[^a-zA-Z]', '', 'g'))) AS letter_chars,
           sum(CASE WHEN regexp_matches(w, '[a-zA-Z]') THEN 1 ELSE 0 END) AS alpha_words
    FROM toks GROUP BY doc_id
),
stops AS (
    SELECT doc_id, count(DISTINCT w) AS n_stop
    FROM toks
    WHERE w IN ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')
    GROUP BY doc_id
),
sym AS (
    SELECT doc_id,
           len(trim(t)) - len(replace(trim(t), '#', '')) AS n_hash,
           (len(trim(t)) - len(replace(trim(t), '...', ''))) / 3 AS n_ellipsis
    FROM planted
)
SELECT p.doc_id,
       CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
       CAST(floor(coalesce(ws.letter_chars * 1.0 / greatest(ws.n_words, 1), 0)
                  * 10000 + 0.5) AS BIGINT) AS mean_word_len_q,
       CAST(floor(coalesce((sym.n_hash + sym.n_ellipsis) * 1.0
                           / greatest(ws.n_words, 1), 0) * 10000 + 0.5) AS BIGINT)
           AS symbol_ratio_q,
       CAST(floor(coalesce(ws.alpha_words * 1.0 / greatest(ws.n_words, 1), 0)
                  * 10000 + 0.5) AS BIGINT) AS alpha_frac_q,
       CAST(coalesce(stops.n_stop, 0) AS BIGINT) AS n_stop,
       (coalesce(ws.n_words, 0) BETWEEN 50 AND 100000
        AND coalesce(ws.letter_chars * 1.0 / greatest(ws.n_words, 1), 0) >= 3.0
        AND coalesce(ws.letter_chars * 1.0 / greatest(ws.n_words, 1), 0) <= 10.0
        AND coalesce((sym.n_hash + sym.n_ellipsis) * 1.0 / greatest(ws.n_words, 1), 0) <= 0.1
        AND coalesce(ws.alpha_words * 1.0 / greatest(ws.n_words, 1), 0) >= 0.8
        AND coalesce(stops.n_stop, 0) >= 2) AS keep
FROM planted p
LEFT JOIN ws USING (doc_id)
LEFT JOIN stops USING (doc_id)
LEFT JOIN sym USING (doc_id)
"""


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line cleaning over punctuation-planted lines (every literal
    ``' table'`` becomes ``'.' + newline`` so most lines terminate
    correctly), with poison markers planted by doc_id: every 11th doc
    gets 'lorem ipsum' (page flag), every 7th an injected short
    'javascript' line (line drop)."""
    d = load_table(spark, sf_dir, "documents")
    lined = F.replace(F.col("text"), F.lit(" table"), F.lit(".\n"))
    lined = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit("beware this line mentions javascript here.\n"), lined
        ),
    ).otherwise(lined)
    lined = F.when(
        F.col("doc_id") % 11 == 0, F.concat(lined, F.lit(" lorem ipsum"))
    ).otherwise(lined)
    c = T.c4_line_filter(F.concat(lined, F.lit(".")))
    return d.select(
        "doc_id",
        c["n_lines"].alias("n_lines"),
        c["n_kept"].alias("n_kept"),
        c["page_flagged"].alias("page_flagged"),
        F.md5(c["text_clean"]).alias("clean_md5"),
    )


SQL_C4_FILTER = r"""
WITH planted AS (
    SELECT doc_id,
           (CASE WHEN doc_id % 11 = 0
                 THEN base || ' lorem ipsum' ELSE base END) || '.' AS t
    FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN 'beware this line mentions javascript here.' || chr(10)
                         || replace(text, ' table', '.' || chr(10))
                    ELSE replace(text, ' table', '.' || chr(10))
               END AS base
        FROM documents
    )
),
lines AS (
    SELECT doc_id, i, line FROM (
        SELECT doc_id,
               CAST(generate_subscripts(string_split(t, chr(10)), 1) AS BIGINT) AS i,
               trim(unnest(string_split(t, chr(10)))) AS line
        FROM planted
    ) WHERE line <> ''
),
kept AS (
    SELECT doc_id, i, line
    FROM lines
    WHERE regexp_matches(line, '[.!?]["'']?$')
      AND len(regexp_split_to_array(line, '\s+')) >= 5
      AND NOT contains(lower(line), 'javascript')
),
agg AS (
    SELECT l.doc_id,
           count(*) AS n_lines,
           count(k.i) AS n_kept,
           md5(coalesce(string_agg(k.line, chr(10) ORDER BY k.i), '')) AS clean_md5
    FROM lines l LEFT JOIN kept k ON l.doc_id = k.doc_id AND l.i = k.i
    GROUP BY l.doc_id
)
SELECT p.doc_id,
       CAST(coalesce(agg.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
       (contains(lower(p.t), 'lorem ipsum') OR contains(lower(p.t), '{'))
           AS page_flagged,
       coalesce(agg.clean_md5, md5('')) AS clean_md5
FROM planted p LEFT JOIN agg USING (doc_id)
"""


QUALITY_QUERIES = {
    "gopher_repetition": q_gopher_repetition,
    "gopher_quality": q_gopher_quality,
    "c4_filter": q_c4_filter,
}

QUALITY_ORACLE_SQL = {
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "c4_filter": SQL_C4_FILTER,
}
