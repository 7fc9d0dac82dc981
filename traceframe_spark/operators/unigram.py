"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model), the second tokenizer family next to BPE
(operators/bpe.py): modern pipelines need both to compare tokenizations
or to match a target model's tokenizer.

Beyond the reference surface (hindfoot/traceframe has no tokenizer);
same scale discipline as the BPE trainer:

1. **Train on the word-frequency table, not the corpus.** One shuffle
   collapses the corpus into (word, wcount); every EM round after that
   touches only this table. Corpus size stops mattering after pass 1.
2. **The model is bounded.** Vocabulary = every single character plus
   the top ``seed_size`` multi-character substrings — the NB-classifier
   / LM store shape: collect is O(vocab), never O(corpus), and the
   model broadcasts to every executor as a plain dict.
3. **Hard (Viterbi) EM, integer costs.** Each round: E-step = best
   segmentation of every distinct word under the current piece costs
   (Viterbi DP inside an Arrow-batched ``mapInPandas`` kernel — the
   per-word DP is genuinely imperative, the one place Python is the
   right tool); M-step = corpus-weighted usage counts per piece (one
   explode + aggregate), re-priced into costs. Piece costs live on the
   ``10^-6`` grid (``cost_q = floor(ln(total/freq)*1e6 + 0.5)``) and
   DP compares integer tuples ``(cost, n_pieces, seg_string)`` — a
   TOTAL order both engines share, so the whole training loop (seeding,
   every Viterbi choice, every usage count) replays in ANSI SQL as
   chained CTEs and is value-verified by the ``unigram_vocab`` /
   ``unigram_encode_lens`` oracle rows (the ``bpe_merges`` precedent).
   Hard-EM trades the soft posterior of full EM for exact
   replayability; the pruning/argmax structure is the published
   algorithm's.

Tie-break contract: DP states compare as (cost_q, n_pieces, seg)
where ``seg`` is the pieces joined by a single space (words are
whitespace tokens, so pieces never contain spaces). Python compares
str by code point, DuckDB by UTF-8 bytes — identical orders (UTF-8
preserves code-point order), so the elected segmentation is the same
everywhere.

Encoding handles out-of-vocabulary characters with a deterministic
UNK floor ``unk_cost_q = floor(ln(2*total)*1e6 + 0.5)`` (strictly
worse than any seen piece, so known pieces always win); the char
itself is emitted as the token, the SentencePiece byte-fallback shape.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traceframe_spark.operators.bpe import word_freq

COST_Q = 1_000_000


def _q(x: float) -> int:
    return int(math.floor(x * COST_Q + 0.5))


def piece_candidates(
    wf: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """(piece, freq) corpus-weighted OCCURRENCE counts of every
    substring of length 1..max_piece_len of the word table — the
    unigram seed statistics. JVM-side: a nested sequence/transform
    explode; the aggregation gets map-side partials, so the shuffle
    carries only distinct pieces."""
    w = F.col("word")
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda l: w.substr(i, l),
            ),
        )
    )
    return (
        wf.select(F.col("wcount").alias("_w"), F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("_w").alias("freq"))
    )


def seed_vocab(
    wf: DataFrame, seed_size: int = 1000, max_piece_len: int = 4
) -> list[tuple[str, int]]:
    """Seed vocabulary rows [(piece, freq)]: ALL single characters
    (coverage guarantee) plus the top ``seed_size`` multi-character
    substrings by (freq DESC, piece ASC). Bounded collects only —
    alphabet + seed_size rows."""
    cand = piece_candidates(wf, max_piece_len).persist()
    try:
        singles = cand.filter(F.length("piece") == 1).collect()
        multis = (
            cand.filter(F.length("piece") >= 2)
            .orderBy(F.col("freq").desc(), F.col("piece").asc())
            .limit(seed_size)
            .collect()
        )
    finally:
        cand.unpersist()
    return [(r["piece"], int(r["freq"])) for r in singles] + [
        (r["piece"], int(r["freq"])) for r in multis
    ]


def _costs_of(freqs: dict[str, int]) -> tuple[dict[str, int], int]:
    """(piece -> cost_q, unk_cost_q) from raw frequencies."""
    total = sum(freqs.values())
    costs = {p: _q(math.log(total / f)) for p, f in freqs.items()}
    return costs, _q(math.log(2.0 * total))


def _viterbi(
    word: str, costs: dict[str, int], max_piece_len: int, unk_cost: int
) -> tuple[int, int, str]:
    """Best segmentation of one word: (cost_q, n_pieces, seg) minimal
    under tuple order. Unknown single chars price at ``unk_cost``."""
    n = len(word)
    dp: list[tuple[int, int, str] | None] = [None] * (n + 1)
    dp[0] = (0, 0, "")
    for j in range(1, n + 1):
        best: tuple[int, int, str] | None = None
        for l in range(1, min(max_piece_len, j) + 1):
            prev = dp[j - l]
            if prev is None:
                continue
            piece = word[j - l : j]
            c = costs.get(piece)
            if c is None:
                if l > 1:
                    continue
                c = unk_cost
            seg = prev[2] + " " + piece if prev[2] else piece
            cand = (prev[0] + c, prev[1] + 1, seg)
            if best is None or cand < best:
                best = cand
        dp[j] = best
    assert dp[n] is not None  # singles + unk floor make every word reachable
    return dp[n]


def _segment_words(
    wf: DataFrame, costs: dict[str, int], max_piece_len: int, unk_cost: int
) -> DataFrame:
    """(word, wcount, seg, n_pieces, cost_q) — Viterbi over the word
    table via Arrow-batched ``mapInPandas`` with the bounded cost dict
    in the task closure. Runs on DISTINCT words: corpus occurrence
    mass never re-enters the DP."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs, ns, cs = [], [], []
            for w in pdf["word"]:
                c, n, seg = _viterbi(w, costs, max_piece_len, unk_cost)
                segs.append(seg)
                ns.append(n)
                cs.append(c)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "wcount": pdf["wcount"],
                    "seg": segs,
                    "n_pieces": pd.Series(ns, dtype="int64"),
                    "cost_q": pd.Series(cs, dtype="int64"),
                }
            )

    return wf.select("word", "wcount").mapInPandas(
        run, schema="word string, wcount long, seg string, n_pieces long, cost_q long"
    )


def learn_unigram(
    df: DataFrame,
    seed_size: int = 1000,
    max_piece_len: int = 4,
    n_rounds: int = 2,
    text_col: str = "text",
) -> list[tuple[str, int, int]]:
    """Train the unigram model: seed, then ``n_rounds`` of hard EM.
    Returns the bounded vocabulary [(piece, freq, cost_q)] — the model
    artifact (:func:`write_unigram_model` persists it).

    M-step rule (deterministic): a piece's new frequency is its
    corpus-weighted Viterbi usage; multi-char pieces with zero usage
    are PRUNED (the EM contribution prune of the published algorithm,
    hard-EM form), single chars floor at 1 (coverage must survive —
    SentencePiece's required-character set)."""
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    wf = word_freq(df, text_col).persist()
    try:
        freqs = dict(
            (p, f) for p, f in seed_vocab(wf, seed_size, max_piece_len)
        )
        for _ in range(n_rounds):
            costs, unk = _costs_of(freqs)
            seg = _segment_words(wf, costs, max_piece_len, unk)
            usage_rows = (
                seg.select(
                    F.col("wcount").alias("_w"),
                    F.explode(F.split("seg", " ")).alias("piece"),
                )
                .groupBy("piece")
                .agg(F.sum("_w").alias("u"))
                .collect()  # bounded: pieces used ⊆ current vocab
            )
            usage = {r["piece"]: int(r["u"]) for r in usage_rows}
            freqs = {
                p: max(usage.get(p, 0), 1) if len(p) == 1 else usage.get(p, 0)
                for p in freqs
            }
            freqs = {p: f for p, f in freqs.items() if f > 0}
        costs, _ = _costs_of(freqs)
        return sorted(
            (p, f, costs[p]) for p, f in freqs.items()
        )
    finally:
        wf.unpersist()


def encode_unigram(
    df: DataFrame,
    vocab: list[tuple[str, int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """(id, tokens, n_tokens, cost_q) — Viterbi-tokenize every document
    against a trained vocabulary. Zero shuffles: one Arrow-batched
    ``mapInPandas`` with the bounded cost dict in the closure and a
    per-batch word memo (a batch's repeated words pay one DP). Unknown
    characters emit themselves at the UNK floor."""
    costs = {p: c for p, _, c in vocab}
    total = sum(f for _, f, _ in vocab)
    unk = _q(math.log(2.0 * total))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, int, str]] = {}
        for pdf in batches:
            ids, toks, ns, cs = [], [], [], []
            for i, t in zip(pdf["id"], pdf["text"]):
                if t is None:
                    continue
                pieces: list[str] = []
                cost = 0
                for w in t.split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _viterbi(w, costs, max_piece_len, unk)
                    pieces.extend(got[2].split(" "))
                    cost += got[0]
                ids.append(i)
                toks.append(pieces)
                ns.append(len(pieces))
                cs.append(cost)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    # object dtype even when empty: an empty float64
                    # column can't Arrow-convert to list<string>
                    "tokens": pd.Series(toks, dtype="object"),
                    "n_tokens": pd.Series(ns, dtype="int64"),
                    "cost_q": pd.Series(cs, dtype="int64"),
                }
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(
        run,
        schema="id long, tokens array<string>, n_tokens long, cost_q long",
    )


def write_unigram_model(
    spark: SparkSession,
    vocab: list[tuple[str, int, int]],
    path: str,
    protocol: str = "append",
) -> None:
    """Persist a trained unigram vocabulary — the SEVENTH artifact on
    the shared store protocols (after rollup, HLL, dedup-index layers,
    bigram LM, IVF lists, BPE merges): train ONCE, every snapshot
    tokenizes against the stored pieces (token ids must not drift
    between snapshots — the frozen-model contract shared with
    ``write_bpe_model``). ``protocol="manifest"`` commits atomically
    with ``n_pieces`` in the manifest meta."""
    from traceframe_spark.session import local_frame

    frame = local_frame(
        spark,
        [(p, int(f), int(c)) for p, f, c in vocab],
        "piece string, freq long, cost_q long",
    )
    if protocol == "manifest":
        from traceframe_spark.streaming import manifest_store as MS

        MS.commit_layer_frames(
            spark, path, {"pieces": frame}, replace=True,
            meta={"n_pieces": len(vocab)},
        )
    elif protocol == "append":
        frame.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"unknown unigram store protocol {protocol!r}")


def load_unigram_vocab(
    spark: SparkSession, path: str
) -> list[tuple[str, int, int]]:
    """The stored vocabulary [(piece, freq, cost_q)]. Bounded driver
    read (vocab rows); protocol auto-detected."""
    from traceframe_spark.streaming import manifest_store as MS

    if MS.is_manifest_store(spark, path):
        df = MS.read_manifest_layer(spark, path, "pieces")
    else:
        df = spark.read.parquet(path)
    rows = df.collect()  # bounded: vocab rows
    if not rows:
        raise IOError(f"unigram store at {path!r} holds no pieces")
    return sorted((r["piece"], int(r["freq"]), int(r["cost_q"])) for r in rows)


def encode_against_unigram(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize against a STORED model (:func:`write_unigram_model`) —
    the steady-state shape shared with ``encode_against_bpe`` /
    ``score_against_lm``: the training corpus is never re-read.

    Spread to cluster parallelism first: the Viterbi segmentation is
    CPU-bound per row and a small corpus otherwise scans as 1-2
    parquet row groups (the ``encode_against_bpe`` width rule)."""
    from traceframe_spark.operators.dedup import spread

    return encode_unigram(
        spread(df, id_col, cpu=True),
        load_unigram_vocab(df.sparkSession, path),
        id_col=id_col,
        text_col=text_col,
        max_piece_len=max_piece_len,
    )
