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
