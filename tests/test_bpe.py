"""BPE trainer pinned against an independent pure-Python reference.

The oracle gate already replays the training loop in DuckDB on the
testdata corpus; these tests pin the SEMANTICS on adversarial inputs
the corpus doesn't contain — overlapping pairs (``aaa``: leftmost-first
merge), repeated non-overlapping pairs (``abab``: both merge in one
round), merged symbols re-merging in later rounds — plus the encode
round-trip property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import bpe


def ref_bpe(word_counts: dict[str, int], n: int):
    """Reference BPE (Sennrich et al. 2016 pseudocode): greedy
    left-to-right non-overlapping pair merge per round, argmax pair by
    (count DESC, left ASC, right ASC), stop when the best pair count
    drops below 2."""
    syms = {w: tuple(list(w) + [bpe.END_WORD]) for w in word_counts}
    merges = []
    for _ in range(n):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        nxt = {}
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt[w] = tuple(out)
        syms = nxt
    return merges, syms


CORPUS = [
    "aaa abab banana bandana",
    "banana banana abab cab",
    "aaa cab bandana banana",
    "low lower lowest low low",
]


@pytest.fixture(scope="module")
def trained(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, syms = bpe.learn_bpe(df, 8)
    rows = {r["word"]: tuple(r["arr"]) for r in syms.select(
        "word", bpe.symbol_array(F.col("s")).alias("arr")).collect()}
    syms.unpersist()
    return merges, rows


def _word_counts():
    wc: dict[str, int] = {}
    for line in CORPUS:
        for w in line.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_merges_match_reference(trained):
    merges, _ = trained
    want, _ = ref_bpe(_word_counts(), 8)
    assert merges == want
    # the adversarial words actually exercised the edge semantics
    lefts = [m[0] for m in merges]
    assert "a" in lefts  # (a, X) merges exist on this corpus


def test_final_symbols_match_reference(trained):
    _, got = trained
    want_merges, want_syms = ref_bpe(_word_counts(), 8)
    assert got == want_syms


def test_overlap_is_leftmost_first(spark):
    # one word "aaaa" repeated: round 1 must merge (a,a) and produce
    # [aa, aa, </w>], NOT [a, aa, a, </w>] or a triple merge
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    merges, syms = bpe.learn_bpe(df, 1)
    arr = syms.select(bpe.symbol_array(F.col("s")).alias("a")).collect()[0]["a"]
    syms.unpersist()
    assert merges[0][:2] == ("a", "a")
    assert arr == ["aa", "aa", bpe.END_WORD]


def test_encode_round_trip(spark, trained):
    merges, _ = trained
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    enc = bpe.encode(df, merges)
    for row in enc.collect():
        toks = row["tokens"]
        rebuilt = "".join(toks).replace(bpe.END_WORD, " ").strip()
        assert rebuilt == " ".join(row["text"].split())


def test_encode_unseen_text_uses_learned_merges(spark, trained):
    merges, _ = trained
    df = spark.createDataFrame([("lowest banana unseenword",)], "text string")
    toks = bpe.encode(df, merges).collect()[0]["tokens"]
    # every token is either a learned merge product or a base symbol
    vocab = {m[0] + m[1] for m in merges}
    for t in toks:
        assert t in vocab or len(t.replace(bpe.END_WORD, "")) <= 1 or t == bpe.END_WORD, (
            f"token {t!r} is neither a learned merge nor a base symbol"
        )


def test_early_stop_on_singleton_pairs(spark):
    # every pair unique -> best count 1 -> zero merges regardless of budget
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    merges, syms = bpe.learn_bpe(df, 5)
    syms.unpersist()
    assert merges == []


def test_token_ids_decode_back_to_text(spark, tmp_path):
    """The id pipeline is faithful: ids are dense 1..|vocab|, and
    decoding each document's id sequence through the inverted vocab
    (dropping the end-of-word markers) reconstructs its exact
    whitespace words in order."""
    from traceframe_spark.plans.pipeline import q_bpe_token_ids

    texts = {
        0: "low lower lowest newer newest wide wider widest",
        1: "the newer method is wider than the lowest one",
        2: "low low low newest newest wide",
    }
    rows = [(i, t, "en", "src0", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    out = q_bpe_token_ids(spark, str(tmp_path)).collect()
    ids_seen = {r["token_id"] for r in out}
    assert min(ids_seen) >= 1

    # rebuild the id -> token mapping exactly as the query defines it
    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    merges, syms = bpe.learn_bpe(d, 10)
    vrows = bpe.vocab(syms).collect()
    syms.unpersist()
    vrows.sort(key=lambda r: (-r["tcount"], r["token"]))
    id2tok = {i + 1: r["token"] for i, r in enumerate(vrows)}
    assert ids_seen <= set(id2tok)

    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["token_id"]))
    for doc_id, seq in by_doc.items():
        seq.sort()
        assert [p for p, _ in seq] == list(range(len(seq)))  # dense positions
        decoded = "".join(id2tok[t] for _, t in seq)
        assert decoded.replace(bpe.END_WORD, " ").strip() == texts[doc_id]


def test_stored_bpe_model_roundtrip_both_protocols(spark, tmp_path):
    """write_bpe_model / load_bpe_merges / encode_against_bpe: the
    stored merges come back in training order on BOTH protocols and
    encoding against the store equals encoding with the in-memory
    list; an empty store read is refused loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from traceframe_spark.operators import bpe

    docs = spark.createDataFrame(
        [(i, "low lower lowest low low newer new") for i in range(20)],
        "doc_id long, text string",
    )
    merges, syms = bpe.learn_bpe(docs, 6)
    syms.unpersist()
    assert merges, "training must learn at least one merge"
    want = [
        (r["doc_id"], list(r["tokens"]))
        for r in bpe.encode(docs, merges).orderBy("doc_id").collect()
    ]
    for proto in ("append", "manifest"):
        path = str(tmp_path / f"bpe_{proto}")
        bpe.write_bpe_model(spark, merges, path, protocol=proto)
        assert bpe.load_bpe_merges(spark, path) == merges
        got = [
            (r["doc_id"], list(r["tokens"]))
            for r in bpe.encode_against_bpe(docs, path).orderBy("doc_id").collect()
        ]
        assert got == want
    with _pt.raises(ValueError, match="protocol"):
        bpe.write_bpe_model(spark, merges, str(tmp_path / "x"), protocol="zip")
    empty = str(tmp_path / "bpe_empty")
    bpe.write_bpe_model(spark, [], empty, protocol="manifest")
    with _pt.raises(IOError, match="no merges"):
        bpe.load_bpe_merges(spark, empty)
