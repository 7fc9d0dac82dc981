"""Property suite: text operators vs pure-Python mirrors on random
word-salad documents. Complements the DuckDB oracle (which pins one
dataset) with randomized structural invariants."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from traceframe_spark.operators import text

WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "y9", "z"]),
    min_size=0,
    max_size=40,
)

HSET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_entropy(toks: list[str]) -> float:
    if not toks:
        return 0.0
    n = len(toks)
    return -sum((c / n) * math.log2(c / n) for c in Counter(toks).values())


def _py_ngrams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.mark.usefixtures("spark")
class TestTextProperties:
    @given(words=WORDS)
    @HSET
    def test_entropy_matches_python(self, spark, words):
        doc = " ".join(words)
        got = (
            spark.range(1)
            .select(text.token_entropy(F.lit(doc)).alias("h"))
            .first()["h"]
        )
        # tokens('') is [''] (one empty token), like Python split of ''
        expected = _py_entropy(doc.lower().split() if doc.strip() else [""])
        assert math.isclose(got, expected, abs_tol=1e-9)

    @given(words=WORDS, n=st.integers(2, 4))
    @HSET
    def test_word_ngrams_match_python(self, spark, words, n):
        doc = " ".join(words)
        got = (
            spark.range(1)
            .select(text.word_ngrams(F.lit(doc), n).alias("g"))
            .first()["g"]
        )
        toks = doc.lower().split() if doc.strip() else [""]
        assert got == _py_ngrams(toks, n)

    @given(words=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=60))
    @HSET
    def test_chunks_reconstruct_document(self, spark, words):
        doc = " ".join(words)
        df = spark.createDataFrame([(1, doc)], "doc_id: long, text: string")
        rows = sorted(
            text.chunk_documents(df, chunk_tokens=8, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        # stripping each later chunk's 3-token overlap re-joins to the doc
        parts = [rows[0]["chunk_text"]] + [
            " ".join(r["chunk_text"].split(" ")[3:]) for r in rows[1:]
        ]
        assert " ".join(p for p in parts if p) == doc
        # every chunk except the last is full-size
        for r in rows[:-1]:
            assert r["n_chunk_tokens"] == 8


def test_quality_gate_rules_fire_independently(spark):
    """Each gate rule trips on a document engineered to trip ONLY it
    (token count, bigram repetition, token entropy, and language are
    separate axes); a clean English document passes with n_fail=0."""
    clean = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "to a small house near the river where many other animals "
        "gather for food and water every single day of the year"
    )
    # 18 DISTINCT tokens: <20 (short) but entropy log2(18)=4.17>3.8,
    # zero repeated bigrams, stopword-rich -> only too_short fires
    short = "the of and a in to for is on that by with from as at this but not"
    # 44 distinct English-leaning words + one bigram repeated 4x:
    # 5/51 repeated bigrams (>0.06) but entropy ~5.4 and 52 tokens
    base = " ".join(
        ["the", "of", "and", "a", "in", "to", "for", "is", "on", "that"]
        + [f"w{i}" for i in range(34)]
    )
    repetitive = base + " foo bar" * 4
    # 24 DISTINCT German stopwords: >=20 tokens, entropy 4.6, rep 0,
    # stopword argmax = de -> only non_en fires
    german = (
        "der die das und ist nicht ein eine mit von zu aus bei auf "
        "dem den des im am um an als auch nach"
    )
    df = spark.createDataFrame(
        [(1, clean), (2, short), (3, repetitive), (4, german)],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in text.quality_gate(df).collect()}
    assert rows[1]["keep"] and rows[1]["n_fail"] == 0
    for doc_id, rule in [(2, "too_short"), (3, "repetitive"), (4, "non_en")]:
        assert rows[doc_id][rule], (doc_id, rule)
        assert rows[doc_id]["n_fail"] == 1, (doc_id, dict(rows[doc_id].asDict()))
        assert not rows[doc_id]["keep"]
    # low_entropy: repeated filler drops entropy below the gate
    low = spark.createDataFrame(
        [(9, "the " * 60 + "of and a in to for is on that by")],
        "doc_id: long, text: string",
    )
    (r9,) = text.quality_gate(low).collect()
    assert r9["low_entropy"] and not r9["keep"]


def test_quality_gate_excludes_null_text(spark):
    """Explicit NULL-text semantics: a document with NULL text is not
    gateable (no rule can be evaluated) and is EXCLUDED from the gate
    output — matching the SQL oracle, whose n-gram unnest drops such
    rows. Previously the engine emitted a NULL-flag row here, a latent
    engine/oracle row-count divergence."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and "
             "again across the wide green field every day"),
         (2, None)],
        "doc_id: long, text: string",
    )
    rows = text.quality_gate(df).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert all(r["keep"] is not None for r in rows)


def test_token_kl_drift_flags_the_shifted_token(spark):
    """A token whose mass explodes in snapshot B dominates the |KL|
    ranking; stable shared tokens sit near zero."""
    base = "the cat sat on the mat with a dog and a bird near the tree"
    a = spark.createDataFrame([(i, base) for i in range(20)], "doc_id: long, text: string")
    b_rows = [(100 + i, base) for i in range(20)]
    b_rows += [(200 + i, "boilerplate " * 30) for i in range(5)]
    b = spark.createDataFrame(b_rows, "doc_id: long, text: string")

    drift = text.token_kl_drift(a, b).collect()
    by_tok = {r["tok"]: r for r in drift}
    top = max(drift, key=lambda r: abs(r["kl_q"]))
    assert top["tok"] == "boilerplate"
    assert by_tok["boilerplate"]["n_a"] == 0 and by_tok["boilerplate"]["n_b"] == 150
    # a token present on both sides at similar rates barely contributes
    assert abs(by_tok["cat"]["kl_q"]) < abs(by_tok["boilerplate"]["kl_q"]) / 10
