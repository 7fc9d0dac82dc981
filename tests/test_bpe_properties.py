"""Property-based tests for the BPE merge semantics.

The engine's merge is a plain string ``replace`` on a two-space-padded
symbol string (operators/bpe.py). Its claimed equivalence to the
reference greedy left-to-right non-overlapping tuple merge is the
load-bearing trick (it is what lets DuckDB replay training), so it gets
hammered here WITHOUT Spark: Python ``str.replace`` has the same
non-overlapping left-to-right contract as Spark's and DuckDB's
``replace``, so the padded-string form can be property-tested at
thousands of examples per second. A final low-volume property runs the
full distributed trainer against the reference on random corpora.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from traceframe_spark.operators.bpe import END_WORD, SEP

from tests.test_bpe import ref_bpe


def pad(syms: tuple[str, ...]) -> str:
    return SEP + SEP.join(syms) + SEP


def unpad(s: str) -> tuple[str, ...]:
    return tuple(x for x in s.split(SEP) if x)


def replace_merge(s: str, left: str, right: str) -> str:
    """The engine's merge, expressed with Python str.replace (same
    non-overlapping left-to-right semantics as Spark/DuckDB replace)."""
    return s.replace(f" {left}{SEP}{right} ", f" {left}{right} ")


def ref_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


# symbols are 1-3 chars over a tiny alphabet so collisions/overlaps are
# common (that's where the boundary-space argument could break)
symbol = st.text(alphabet="abc", min_size=1, max_size=3)


@given(
    syms=st.lists(symbol, min_size=1, max_size=12).map(tuple),
    left=symbol,
    right=symbol,
)
@settings(max_examples=2000, deadline=None)
def test_replace_merge_equals_reference_merge(syms, left, right):
    got = unpad(replace_merge(pad(syms), left, right))
    assert got == ref_merge(syms, left, right)


@given(syms=st.lists(symbol, min_size=2, max_size=12).map(tuple))
@settings(max_examples=500, deadline=None)
def test_merge_chain_equals_reference_chain(syms):
    """Chained merges (the encode path) stay equivalent when each merge's
    OUTPUT feeds the next — including merges of previously merged
    symbols, the case single-step tests can't cover."""
    merges = [("a", "b"), ("ab", "c"), ("a", "a"), ("aa", "ab"), ("c", "c")]
    s, t = pad(syms), syms
    for left, right in merges:
        s = replace_merge(s, left, right)
        t = ref_merge(t, left, right)
        assert unpad(s) == t


@given(
    corpus=st.lists(
        st.lists(st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=5, deadline=None)
def test_distributed_trainer_matches_reference(spark, corpus):
    from pyspark.sql import functions as F

    from traceframe_spark.operators import bpe

    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges, syms = bpe.learn_bpe(df, 4)
    got_syms = {
        r["word"]: tuple(r["arr"])
        for r in syms.select("word", bpe.symbol_array(F.col("s")).alias("arr")).collect()
    }
    syms.unpersist()

    wc: dict[str, int] = {}
    for line in corpus:
        for w in line.split():
            wc[w] = wc.get(w, 0) + 1
    want_merges, want_syms = ref_bpe(wc, 4)
    assert merges == want_merges
    assert got_syms == want_syms
    # every surviving symbol string round-trips to its word
    for w, s in got_syms.items():
        assert "".join(s) == w + END_WORD
