"""Unigram-LM tokenizer: training semantics, encode contract, store
roundtrip (operators/unigram.py)."""

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import unigram


@pytest.fixture(scope="module")
def corpus(spark):
    # "abab" mass makes 'ab' (and 'abab') high-frequency candidates;
    # 'xyz' appears once so its multi-char pieces prune under EM
    rows = [
        (0, "abab abab abab cd"),
        (1, "abab cd cd"),
        (2, "abab abab xyz"),
        (3, "cd abab"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learn_unigram_coverage_and_pruning(corpus):
    vocab = unigram.learn_unigram(corpus, seed_size=4, n_rounds=2)
    pieces = {p for p, _, _ in vocab}
    # every corpus character survives as a single (coverage floor)
    assert {"a", "b", "c", "d", "x", "y", "z"} <= pieces
    # the dominant substring is a piece and is actually USED: its EM
    # frequency carries the corpus mass
    by_piece = {p: f for p, f, _ in vocab}
    assert "abab" in pieces and by_piece["abab"] == 7  # one per word occurrence
    # costs are positive integers on the 1e-6 grid, monotone in freq
    costs = {p: c for p, _, c in vocab}
    assert all(isinstance(c, int) and c > 0 for c in costs.values())
    assert costs["abab"] < costs["x"]  # frequent piece is cheaper


def test_encode_reassembles_words(corpus):
    vocab = unigram.learn_unigram(corpus, seed_size=4, n_rounds=2)
    enc = unigram.encode_unigram(corpus, vocab).collect()
    by_id = {r["id"]: r for r in enc}
    assert set(by_id) == {0, 1, 2, 3}
    for r in enc:
        # concatenated tokens reproduce the original words exactly
        text = [w for w in by_id[r["id"]]["tokens"]]
        assert "".join(text) == "".join(
            w for w in dict(
                [(0, "abab abab abab cd"), (1, "abab cd cd"),
                 (2, "abab abab xyz"), (3, "cd abab")]
            )[r["id"]].split()
        )
        assert r["n_tokens"] == len(r["tokens"])
    # the dominant word tokenizes as ONE piece
    assert by_id[3]["tokens"][-1] == "abab"


def test_encode_unknown_char_fallback(spark, corpus):
    vocab = unigram.learn_unigram(corpus, seed_size=4, n_rounds=1)
    new = spark.createDataFrame([(9, "abQd")], "doc_id long, text string")
    out = unigram.encode_unigram(new, vocab).collect()[0]
    assert "Q" in out["tokens"]  # unseen char emitted at the UNK floor
    assert "".join(out["tokens"]) == "abQd"
    # the UNK floor is strictly worse than any trained piece, so the
    # doc's cost exceeds any same-length in-vocab encoding
    costs = [c for _, _, c in vocab]
    assert out["cost_q"] > max(costs)


def test_encode_skips_null_text(spark, corpus):
    vocab = unigram.learn_unigram(corpus, seed_size=4, n_rounds=1)
    d = spark.createDataFrame(
        [(0, "abab"), (1, None)], "doc_id long, text string"
    )
    out = unigram.encode_unigram(d, vocab).collect()
    assert [r["id"] for r in out] == [0]


@pytest.mark.parametrize("protocol", ["append", "manifest"])
def test_unigram_store_roundtrip(spark, corpus, tmp_path, protocol):
    vocab = unigram.learn_unigram(corpus, seed_size=4, n_rounds=2)
    path = str(tmp_path / f"uni_{protocol}")
    unigram.write_unigram_model(spark, vocab, path, protocol=protocol)
    assert unigram.load_unigram_vocab(spark, path) == vocab
    # store-backed encode equals in-memory encode
    a = {
        (r["id"], tuple(r["tokens"]), r["cost_q"])
        for r in unigram.encode_unigram(corpus, vocab).collect()
    }
    b = {
        (r["id"], tuple(r["tokens"]), r["cost_q"])
        for r in unigram.encode_against_unigram(corpus, path).collect()
    }
    assert a == b


def test_unigram_empty_store_raises(spark, tmp_path):
    path = str(tmp_path / "uni_empty")
    spark.createDataFrame(
        [], "piece string, freq long, cost_q long"
    ).write.parquet(path)
    with pytest.raises(IOError, match="no pieces"):
        unigram.load_unigram_vocab(spark, path)


def test_viterbi_tie_breaks_match_sql_order():
    """The DP tuple order (cost, n, seg-string) with equal-cost pieces:
    the lexicographically smallest seg string wins — the exact order
    DuckDB's row_number replays."""
    costs = {"a": 10, "b": 10, "ab": 20}  # 'a'+'b' == 'ab' in cost
    # n_pieces breaks the tie first: 'ab' (1 piece) beats 'a b' (2)
    assert unigram._viterbi("ab", costs, 4, 100) == (20, 1, "ab")
    costs2 = {"a": 10, "b": 10, "c": 10, "ab": 20, "bc": 20}
    # 'abc': 'a bc' vs 'ab c' tie at (30, 2); 'a bc' < 'ab c' as strings
    assert unigram._viterbi("abc", costs2, 4, 100) == (30, 2, "a bc")
