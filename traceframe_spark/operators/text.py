"""Text-analysis operators for corpus curation.

Language ID (stopword-overlap heuristic), quality scoring, token
counting, and document fingerprinting — the per-document signals a
training-data pipeline filters on. Everything is a native Catalyst
expression over the canonical ``documents`` shape (doc_id, text, ...);
at 100 TB these are embarrassingly parallel scans with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.session import read_meta_dir as _read_meta_dir_session

# Small high-frequency stopword lists per language (public knowledge).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "a", "is", "that", "it", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "im"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una", "es", "por"],
    "it": ["il", "la", "le", "e", "di", "che", "in", "un", "una", "per", "con", "del"],
}


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (long). A BPE-ish proxy is
    :func:`subword_count`."""
    return F.size(tokens(col)).cast("long")


def subword_count(col: Column) -> Column:
    """BPE-ish token-count proxy: segments of letters, digits, or single
    punctuation — the regex split a byte-pair tokenizer's pre-tokenizer
    applies. Counts pieces, JVM-side."""
    pieces = F.split(
        F.trim(col),
        r"(?<=[^\p{L}\p{N}])|(?=[^\p{L}\p{N}])",
    )
    # trim(p) != '' drops EVERY whitespace piece — a bare p != ' ' would
    # count tabs/newlines as subword tokens
    return F.size(F.filter(pieces, lambda p: F.trim(p) != F.lit(""))).cast("long")


def stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_id(col: Column, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: the language whose stopword list overlaps
    the document's tokens most (ties broken by language code order);
    'und' (undetermined) when nothing matches.

    Argmax is expressed as array_max over (score, inverted-lang) structs
    — struct ordering gives the JVM-side argmax without a UDF.
    """
    langs = langs or list(STOPWORDS)
    toks = tokens(col)
    scored = F.array(
        *[
            F.struct(
                stopword_hits(toks, lang).alias("score"),
                # invert code point order so ties pick the FIRST lang code
                F.lit(-i).alias("pref"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_signals(col: Column) -> Column:
    """Struct of quality-scoring signals: token/char counts, mean word
    length, punctuation ratio, uppercase ratio, digit ratio."""
    raw = F.trim(col)
    toks = tokens(col)
    n_char = F.length(raw).cast("double")
    n_tok = F.size(toks).cast("double")
    n_punct = (n_char - F.length(F.regexp_replace(raw, r"[\p{Punct}]", ""))).cast("double")
    n_upper = (n_char - F.length(F.regexp_replace(raw, r"[A-Z]", ""))).cast("double")
    n_digit = (n_char - F.length(F.regexp_replace(raw, r"[0-9]", ""))).cast("double")
    safe = F.greatest(n_char, F.lit(1.0))
    return F.struct(
        n_char.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (n_char / F.greatest(n_tok, F.lit(1.0))).alias("mean_word_len"),
        (n_punct / safe).alias("punct_ratio"),
        (n_upper / safe).alias("upper_ratio"),
        (n_digit / safe).alias("digit_ratio"),
    )


def quality_score(col: Column) -> Column:
    """Scalar quality heuristic in [0,1]: long enough, words of sane
    length, not punctuation/digit soup. Deterministic and monotone in
    each signal — meant for threshold filtering, not absolute meaning."""
    s = quality_signals(col)
    len_ok = F.least(s["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    wordlen = s["mean_word_len"]
    wordlen_ok = F.when((wordlen >= 3.0) & (wordlen <= 12.0), 1.0).otherwise(0.5)
    punct_ok = F.lit(1.0) - F.least(s["punct_ratio"] * 4.0, F.lit(1.0))
    digit_ok = F.lit(1.0) - F.least(s["digit_ratio"] * 4.0, F.lit(1.0))
    return (len_ok * 0.4 + wordlen_ok * 0.2 + punct_ok * 0.2 + digit_ok * 0.2)


def fingerprint_md5(col: Column) -> Column:
    """Exact-content fingerprint: md5 of lowercased, trimmed text."""
    return F.md5(F.lower(F.trim(col)))


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Content-defined fingerprint: minimum xxhash64 over word
    ``window``-grams (a 1-hash MinHash). Stable under small edits away
    from the minimizing window — the cheap near-dup prefilter."""
    toks = tokens(col)
    k = F.greatest(F.size(toks) - (window - 1), F.lit(1))
    # zip-of-shifted-slices (see word_ngrams) — slice-per-position in the
    # lambda re-splits the text per gram once Catalyst inlines the alias
    z = F.arrays_zip(*[F.slice(toks, i + 1, k) for i in range(window)])
    grams = F.transform(
        z,
        lambda s: F.xxhash64(
            F.concat_ws(" ", *[s[str(i)] for i in range(window)])
        ),
    )
    return F.array_min(grams)


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB) so the engine result is oracle-checkable: no backrefs, no
# lookaround, no \b differences in char classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Share of repeated word ``n``-grams: 1 - distinct/total. The
    standard boilerplate/looping-generation signal — high values mean
    the document repeats itself. Zero-shuffle JVM expression."""
    toks = tokens(col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    # zip-of-shifted-slices, not slice-per-position in the lambda (see
    # word_ngrams: inlining makes the latter re-split per gram). Shorter
    # slices zip-pad with null; concat_ws drops nulls, preserving the
    # truncated partial gram for docs shorter than n words.
    z = F.arrays_zip(*[F.slice(toks, i + 1, k) for i in range(n)])
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    ratio = F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(
        grams
    ).cast("double")
    # absent text repeats nothing: 0, not a null that poisons filters
    return F.coalesce(ratio, F.lit(0.0))


def token_entropy(col: Column) -> Column:
    """Shannon entropy (base 2) of the document's token distribution —
    the gibberish/boilerplate signal: near 0 for repeated filler, high
    for diverse text.

    Computed as a single fold over the SORTED token array using
    ``H = log2(n) - (Σ c·log2 c)/n`` over run lengths ``c``: the lambda
    state is (prev, run, Σ c·log2 c) and never references the token
    array itself — a per-distinct-token ``filter`` count would re-split
    the text per distinct token once Catalyst inlines the alias (see
    :func:`word_ngrams`). Zero-shuffle JVM expression.
    """
    toks = F.array_sort(tokens(col))

    def close_run(acc):
        c = acc["run"].cast("double")
        return acc["s"] + F.when(acc["run"] > 0, c * F.log2(c)).otherwise(F.lit(0.0))

    def step(acc, t):
        same = acc["prev"].isNotNull() & (acc["prev"] == t)
        return F.struct(
            t.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["s"]).otherwise(close_run(acc)).alias("s"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("s"),
    )
    sum_clogc = F.aggregate(toks, init, step, close_run)
    n = F.size(tokens(col)).cast("double")
    return F.when(n > 0, F.log2(n) - sum_clogc / n).otherwise(F.lit(0.0))


def word_ngrams(col: Column, n: int) -> Column:
    """Strict word ``n``-grams (space-joined): empty array for documents
    shorter than ``n`` words. JVM expression built as ``arrays_zip`` of
    ``n`` shifted slices, NOT per-position ``slice`` inside a lambda:
    Catalyst inlines aliased projections into Generate/lambda bodies, so
    a per-position slice re-evaluates the regex ``split`` once per gram
    (quadratic per doc — measured 30x slower at 54 words/doc). The zip
    form evaluates the split n+1 times per row and the lambda only
    touches the zipped struct. The ``when`` guard matters because
    ``F.sequence(1, 0)`` yields a DEscending [1, 0], not empty."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    z = F.arrays_zip(*[F.slice(toks, i + 1, k) for i in range(n)])
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 24,
    bloom_hashes: int = 7,
) -> DataFrame:
    """Benchmark decontamination: per-document overlap of distinct word
    ``n``-grams with the benchmark set's n-gram union — the GPT-3-style
    test-set leakage check (Brown et al. 2020, appendix C, 13-grams).

    Returns (id_col, n_grams, n_hit, overlap): ``n_hit`` distinct grams
    of the doc that appear anywhere in the benchmark, ``overlap`` their
    share (0.0 for docs shorter than ``n`` words).

    100 TB shape: benchmark suites are tiny relative to the corpus, so
    the distinct benchmark gram set is broadcast and the corpus side is
    ONE scan + ONE shuffle — per-doc distinctness is JVM-side
    ``array_distinct`` (no distinct shuffle), ``n_grams`` rides through
    the explode, and the only exchange is the per-doc groupBy. If the
    benchmark side is itself huge, pass ``broadcast_benchmark=False``
    for a plain hash join on the gram key.

    ``bloom_prefilter=True`` (for the non-broadcast, corpus-sized
    reference case) broadcasts a Bloom sketch of the reference grams
    (xxhash64-hashed, ``bloom_bits`` bits / ``bloom_hashes`` hashes —
    size ``bloom_bits`` at ~10 bits per distinct reference gram) and
    routes ONLY probable-hit grams into the exact gram-key join; a
    Bloom miss is a GUARANTEED non-hit (no false negatives), so it
    skips both the join and the per-gram aggregation entirely, and a
    false positive merely adds join traffic the exact join then
    rejects — the answer is bit-identical with the filter on or off.
    The saving follows the corpus's novel mass (misses skip all
    shuffles); the cost is the Bloom build plus k word-indexed probe
    joins per gram. MEASURED (SCALING.md r08): on local[32], where
    shuffle is memory-speed, the probe overhead exceeds the shuffle
    saved at every point tried — 0.32-0.48x the plain join at 1x and
    100x corpus, at 6% AND 64% novel mass — so the knob stays DEFAULT
    OFF; it is a bet on network-bound shuffle (a real multi-rack
    cluster), not a locally demonstrable win. Past a few billion
    distinct reference grams the sketch outgrows broadcast — the plain
    hash join is the scale-out path there too.
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_col or text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    base = corpus.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("gs"),
    )
    if bloom_prefilter:
        from traceframe_spark.operators import sketch

        # the same distinct-grams subtree feeds the bloom build AND the
        # exact join — identical subplans, so ReuseExchange shares the
        # distinct's shuffle instead of scanning the reference twice.
        # MEASURED (r08, tools/bench_bloom_ab.py): this path LOSES at
        # every locally measurable point — 0.32-0.48x the plain join at
        # 1x and 100x, on both a low-novelty (6% novel mass) and a
        # high-novelty (64%) split — because the k word-indexed probe
        # joins cost more than the gram-key shuffle they skip while
        # shuffle is memory-speed. It stays available for genuinely
        # network-bound clusters, default OFF. (A dense driver-collected
        # literal probe was tried and is unusable: a 524k-element array
        # literal takes minutes to build/evaluate through py4j.)
        bg = bench_grams.select("g")
        bloom = sketch.bloom_build(bg, "g", bloom_hashes, bloom_bits, fast=True)
        grams = base.select(id_col, F.explode("gs").alias("g"))
        probed = sketch.bloom_probe_keep(
            bloom, grams, "g", bloom_hashes, bloom_bits, fast=True
        )
        hits = (
            probed.filter(F.col("probable_member"))
            .join(bg, "g")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hit"))
        )
        docs = base.select(id_col, F.size("gs").alias("n_grams"))
        return docs.join(hits, id_col, "left").select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("overlap"),
        )
    exploded = base.select(
        id_col,
        F.size("gs").alias("n_grams"),
        # explode_outer keeps zero-gram (shorter-than-n) docs as a null row
        F.explode_outer("gs").alias("g"),
    )
    return (
        exploded.join(bench_grams, "g", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count_if(F.col("hit").isNotNull()).alias("n_hit"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_hit",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit").cast("double") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("overlap"),
        )
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_reference: bool = False,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 24,
    bloom_hashes: int = 7,
) -> DataFrame:
    """Ingest QA: per-document fraction of distinct word ``n``-grams NOT
    present anywhere in a reference corpus (e.g. yesterday's snapshot).
    Novelty ≈ 1 flags genuinely new content; novelty ≈ 0 flags
    re-crawls, mirrors, and templated boilerplate — the triage signal a
    continuous-ingest pipeline uses to decide what deserves the full
    curation pass. The inverse view of :func:`contamination` (same
    distinct-gram machinery, reference side instead of benchmark side),
    so gram semantics exist exactly once.

    Unlike benchmark suites, reference corpora are corpus-sized —
    default is a plain hash join on the gram key (one shuffle each
    side); pass ``broadcast_reference=True`` only for small references.
    ``bloom_prefilter=True`` broadcasts a Bloom sketch of the reference
    grams and lets the definitely-novel gram mass skip the join and the
    per-gram aggregation entirely — answers are bit-identical (Bloom
    misses are guaranteed novel; false positives are re-checked by the
    exact join); see :func:`contamination` for sizing AND for the
    measured verdict: it is a net LOSS wherever shuffle is memory-speed
    (0.32-0.48x at 1x/100x, 6%/64% novelty — SCALING.md r08), so it
    stays default off as a network-bound-cluster bet. Output: (id_col,
    n_grams, n_novel, novelty); zero-gram docs (shorter than ``n``
    words) report novelty 0.0 — nothing new, nothing to keep.
    """
    hits = contamination(
        corpus,
        reference,
        id_col,
        text_col,
        n=n,
        broadcast_benchmark=broadcast_reference,
        bloom_prefilter=bloom_prefilter,
        bloom_bits=bloom_bits,
        bloom_hashes=bloom_hashes,
    )
    return hits.select(
        id_col,
        "n_grams",
        (F.col("n_grams") - F.col("n_hit")).cast("long").alias("n_novel"),
        F.when(F.col("n_grams") > 0, 1.0 - F.col("overlap"))
        .otherwise(F.lit(0.0))
        .alias("novelty"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    pre-packing step for long documents (a context-window's worth of
    tokens per training row, overlapping so no boundary context is
    lost).

    Output: (id_col, chunk_id, n_chunk_tokens, chunk_text). Stride is
    ``chunk_tokens - overlap``; the final chunk is the remainder (never
    empty, never duplicated: a doc shorter than ``chunk_tokens`` yields
    exactly one chunk). Pure JVM expressions, zero shuffle.

    The token array rides THROUGH the explode as a materialized column —
    a Generate node is a projection-collapse barrier, so each chunk's
    ``slice`` reads the already-built array instead of re-splitting the
    text per chunk (Catalyst would inline a per-chunk lambda slice; see
    :func:`word_ngrams` for the quadratic failure mode).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start + overlap < n
    # (i.e. the chunk contributes at least one NEW token past the overlap)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        # coalesce: a NULL-text doc yields one empty chunk whose token
        # count is 0, matching the chunk_text '' convention below
        F.coalesce(F.size(piece), F.lit(0)).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pii_counts(col: Column) -> Column:
    """Struct of per-kind PII match counts (email / ipv4 / phone)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long").alias(kind)
            for kind, pat in PII_PATTERNS.items()
        ]
    )


def redact_pii(col: Column) -> Column:
    """Replace every PII match with ``[<KIND>]`` — the curation-pipeline
    scrub step. Chained regexp_replace, zero-shuffle."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences.

    Deterministic sequential packing: documents ordered by ``id_col``
    fill sequence ``seq_id = floor(prefix_tokens / budget)`` where
    ``prefix_tokens`` counts all tokens of PRECEDING documents — the
    contiguous-fill layout a dataloader consumes (documents may straddle
    a boundary; the trainer's sampler splits there). Output adds
    (n_tokens, prefix_tokens, seq_id, offset_in_seq).

    The global prefix sum runs as a distributed scan, never a
    single-partition window: rows bucket by DETERMINISTIC quantile
    boundaries of ``id_col`` (computed once, Greenwald-Khanna — no
    sampling), cumsum within each bucket in parallel windows, then add
    the bucket's cascaded base offset from one tiny per-bucket-totals
    aggregate (O(partitions) driver data at any corpus size). The bucket
    must be a pure function of the row — a ``spark_partition_id()``
    after ``repartitionByRange`` is NOT stable across the totals job and
    the main query (range boundaries are sampled per evaluation) and
    silently mis-offsets rows. Output is identical to a naive
    global-window form. ``id_col`` must be numeric and unique.
    """
    from pyspark.sql.window import Window

    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    toks = df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
    qs = [i / partitions for i in range(1, partitions)]
    bounds = sorted(set(df.stat.approxQuantile(id_col, qs, 0.001))) if qs else []
    # bucket = number of boundaries <= id: pure expression of the row
    bucket = F.aggregate(
        F.array(*[F.lit(b) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(id_col).cast("double") > b, 1).otherwise(0),
    )
    keyed = toks.withColumn("_bkt", bucket)
    w = Window.partitionBy("_bkt").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = keyed.withColumn(
        "_local_prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    # cascaded base offset per bucket: tiny driver-side scan
    totals = (
        keyed.groupBy("_bkt").agg(F.sum("n_tokens").alias("t")).orderBy("_bkt").collect()
    )
    bases, acc = {}, 0
    for r in totals:
        bases[r["_bkt"]] = acc
        acc += r["t"]
    base = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in bases.items() for x in kv]), F.col("_bkt")
        ),
        F.lit(0),
    ).cast("long")
    prefix = (F.col("_local_prefix") + base).alias("prefix_tokens")
    return local.select(
        id_col,
        "n_tokens",
        prefix,
        F.floor((F.col("_local_prefix") + base) / budget).cast("long").alias("seq_id"),
        ((F.col("_local_prefix") + base) % budget).cast("long").alias("offset_in_seq"),
    )


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence. THE bigram
    definition, shared by the self-trained scorer, the stored-LM
    builder, and the stored-LM scorer so all three cannot drift."""
    toks = tokens(F.col(text_col))
    k = F.size(toks) - 1
    z = F.arrays_zip(F.slice(toks, 1, k), F.slice(toks, 2, k))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(z).alias("p"))
        .select("id", F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    )


def write_bigram_lm(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    protocol: str = "append",
) -> None:
    """Persist the add-one-smoothed bigram LM estimated from ``docs``:
    (w1, w2, c12) bigram counts at ``{path}/bigrams``, (w1, c1) prefix
    counts at ``{path}/prefix``, and the second-token vocabulary size
    in ``{path}/lm_meta`` — the CCNet quality-filter shape
    (1911.00359 §4.3: the LM is trained ONCE on a frozen reference
    corpus, then every crawl snapshot is scored against it). Stored
    layers are narrow token rows, independent of document count or
    length; the reference corpus text is never re-read at scoring
    time — same incremental contract as the dedup index's layers.

    ``protocol="manifest"`` commits both count layers AND the vocab
    size in ONE atomic manifest publish (layer-manifest store, see
    :mod:`~traceframe_spark.streaming.manifest_store`) instead of the
    three-step overwrite sequence — a crashed build can never leave a
    bigrams/prefix/meta mismatch, a RETRAIN over an existing store is
    a commit (prior model time-travel-readable until vacuumed), and
    the store is object-store-legal. Readers auto-detect the
    protocol."""
    if protocol not in ("append", "manifest"):
        raise ValueError(f"unknown LM store protocol {protocol!r}")
    spark = docs.sparkSession
    bi = _bigram_pairs(docs, id_col, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    bi = bi.persist()
    try:
        # one wide tokenize+count pass populates the cache; the layer
        # writes and the |V| aggregate below then all read cached
        # blocks and can run concurrently (guide §2.6)
        bi.count()
        uni = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
        if protocol == "manifest":
            from traceframe_spark.streaming import manifest_store as MS

            v = bi.agg(F.count_distinct("w2")).first()[0]
            MS.commit_layer_frames(
                spark, path, {"bigrams": bi, "prefix": uni},
                replace=True, meta={"v": int(v)},
            )
            return
        from concurrent.futures import ThreadPoolExecutor

        def _w_bi() -> int:
            bi.write.mode("overwrite").parquet(f"{path}/bigrams")
            return 0

        def _w_uni() -> int:
            uni.write.mode("overwrite").parquet(f"{path}/prefix")
            return 0

        def _v() -> int:
            return int(bi.agg(F.count_distinct("w2")).first()[0])

        with ThreadPoolExecutor(max_workers=3) as pool:
            _, _, v = pool.map(lambda f: f(), (_w_bi, _w_uni, _v))
        from traceframe_spark.session import write_meta_dir

        write_meta_dir(spark, f"{path}/lm_meta", {"v": int(v)})
    finally:
        bi.unpersist()


def _read_lm_store(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    """(bigrams, prefix, |V|) from a stored LM, protocol auto-detected:
    a manifest-protocol store resolves ONE manifest (snapshot-consistent
    layers; |V| is a driver-side JSON field, no Spark job), an
    append-protocol store reads the plain directories + meta JSON."""
    from traceframe_spark.streaming import manifest_store as MS

    if MS.is_manifest_store(spark, path):
        man, meta_v = MS.resolve_required_meta(
            spark, path, "v", "write_bigram_lm"
        )
        return (
            MS.read_manifest_layer(spark, path, "bigrams", man=man),
            MS.read_manifest_layer(spark, path, "prefix", man=man),
            int(meta_v),
        )
    return (
        spark.read.parquet(f"{path}/bigrams"),
        spark.read.parquet(f"{path}/prefix"),
        int(_read_meta_dir_session(spark, f"{path}/lm_meta")["v"]),
    )


def load_lm_frames(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    """Read a stored bigram LM (:func:`write_bigram_lm`) ONCE and pin it
    in executor storage: (bigrams, prefix, |V|) with both count frames
    persisted (MEMORY_AND_DISK) and eagerly materialized — later
    scoring reads cached blocks, never re-listing the store per call.
    This is the per-stream hoist for :func:`score_against_lm` inside
    ``foreachBatch``: the model is FROZEN by contract, so reading it
    per micro-batch bought nothing but a per-batch store listing +
    meta job.

    Deliberately persist-with-LINEAGE, not ``localCheckpoint``: losing
    an executor that held cached blocks is ROUTINE on a real cluster,
    and retained lineage recomputes the lost blocks from the store
    (whose file listing was captured once at read time) — a
    lineage-cut pin would instead kill every later micro-batch of a
    long-lived stream. The trade: deleting the store path mid-stream is
    survivable only while the cached blocks live; that is an operator
    error against a frozen model, not a failure mode to optimize for."""
    bi, uni, v = _read_lm_store(spark, path)
    bi = bi.persist()
    uni = uni.persist()
    # materialize NOW: the pin must be populated (and the store path
    # validated) at load time, not on the first batch's scoring job
    bi.count()
    uni.count()
    return bi, uni, v


def score_against_lm(
    delta: DataFrame,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    frames: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """(id, avg_logprob) for ``delta`` documents under the STORED LM —
    :func:`bigram_logprob_scores`'s answer without re-training: when
    the delta IS the training corpus the two are identical (the oracle
    twin), and on a genuinely new delta unseen bigrams take the add-one
    floor ``ln(1 / (c1 + |V|))`` and unseen prefixes ``ln(1 / |V|)``
    (LEFT joins + coalesce — the batch scorer never needs this branch
    because in-corpus pairs always exist in their own model).

    Cost shape at 100 TB: the delta is tokenized once; the model side
    contributes only stored narrow count rows joined BY KEY (bigram and
    prefix joins shuffle O(|delta bigrams| + model rows)); reference
    corpus text is untouched. Same docstring contract as the batch
    scorer: documents with fewer than 2 tokens emit no row.

    ``frames`` (from :func:`load_lm_frames`) scores against an
    already-pinned model instead of reading ``path`` — repeated callers
    (a stream's every micro-batch) pay the store listing once, not per
    call."""
    if frames is not None:
        bi, uni, v = frames
    else:
        if path is None:
            raise ValueError("score_against_lm needs `path` or `frames`")
        bi, uni, v = _read_lm_store(delta.sparkSession, path)
    pairs = _bigram_pairs(delta, id_col, text_col)
    lp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(v)))
    )
    return (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .groupBy("id")
        .agg(F.avg(lp).alias("avg_logprob"))
    )


def bigram_logprob_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Statistical-LM quality scoring: each document's mean add-one-
    smoothed bigram log-probability under the LM estimated from the
    corpus itself — the relational core of perplexity-based filtering
    (out-of-distribution/gibberish docs score far below the corpus
    mode). ``lp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + |V|))`` with
    ``c(w1)`` the bigram-prefix count and ``|V|`` the distinct
    second-token vocabulary.

    Scale shape: one explode to (doc, w1, w2); the model is ONE
    aggregation over that relation (map-side partials) — the prefix
    counts and vocabulary size derive from the bigram partials, not
    from extra corpus scans — joined back by key, with the vocabulary
    size broadcast via crossJoin. Training and scoring are the same
    two-scan dataflow a 100 TB corpus needs, no driver-side model
    object.

    Contract: documents with fewer than 2 tokens have no bigrams and
    therefore NO output row (their log-probability is undefined, not
    zero) — left-join the scores back if passthrough is needed.
    """
    pairs = _bigram_pairs(df, id_col, text_col)
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    voc = bi.agg(F.count_distinct("w2").alias("v"))
    lp = F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
    return (
        pairs.join(bi, ["w1", "w2"])
        .join(uni, ["w1"])
        .crossJoin(F.broadcast(voc))
        .groupBy("id")
        .agg(F.avg(lp).alias("avg_logprob"))
    )


def document_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: language guess, quality signals +
    score, token counts, fingerprints."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        lang_id(t).alias("lang_guess"),
        quality_signals(t).alias("signals"),
        quality_score(t).alias("quality"),
        token_count(t).alias("n_tokens"),
        subword_count(t).alias("n_subwords"),
        fingerprint_md5(t).alias("fp_md5"),
        rolling_fingerprint(t).alias("fp_rolling"),
    )


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_repetition: float = 0.06,
    min_entropy: float = 3.8,
    lang: str = "en",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Composed C4/Gopher-style document gate: one zero-shuffle scan
    emits per-rule flags, the failed-rule count, and the keep verdict —
    the standard first stage of a training-data curation pipeline
    (filter *with reasons*, so rejected mass is attributable per rule).

    Rules: ``too_short`` (token count), ``repetitive`` (repeated
    word-bigram ratio), ``low_entropy`` (token Shannon entropy),
    ``non_<lang>`` (stopword-overlap language guess). Ratio thresholds
    are compared on the engine-portable 1e-4 grid (the suite's ``qint``
    convention), so the verdict is identical across engines even for
    documents that sit exactly on a threshold.

    Everything is a JVM expression over one pass of the text column —
    at 100 TB this is a pure map stage with full codegen, no Python,
    no shuffle; cost is scan throughput. No reference analogue (the
    reference has no text-curation surface).

    NULL-text semantics (explicit): documents with NULL text are NOT
    gateable — no rule can be evaluated — so they are excluded from the
    output entirely (same row set as the SQL oracle, whose n-gram unnest
    drops them). Route NULL-text rows through an upstream completeness
    check if they must be accounted for.
    """
    df = df.filter(F.col(text_col).isNotNull())
    c = F.col(text_col)
    rep_q = F.floor(repetition_ratio(c, 2) * 10000 + F.lit(0.5)).cast("long")
    ent_q = F.floor(token_entropy(c) * 10000 + F.lit(0.5)).cast("long")
    max_rep_q = int(max_repetition * 10000 + 0.5)
    min_ent_q = int(min_entropy * 10000 + 0.5)
    flags = [
        ("too_short", token_count(c) < min_tokens),
        ("repetitive", rep_q > max_rep_q),
        ("low_entropy", ent_q < min_ent_q),
        (f"non_{lang}", lang_id(c) != lang),
    ]
    n_fail = None
    for _, fl in flags:
        term = fl.cast("int")
        n_fail = term if n_fail is None else n_fail + term
    return df.select(
        id_col,
        *carry,  # pass-through columns, so compositions avoid a rejoin
        *[fl.alias(name) for name, fl in flags],
        n_fail.cast("long").alias("n_fail"),
        (n_fail == 0).alias("keep"),
    )


def token_kl_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpus snapshots: each union-
    vocabulary token's contribution ``pA*ln(pA/pB) + pB*ln(pB/pA)`` to
    the SYMMETRIC (Jeffreys) KL divergence, with add-one smoothing so
    tokens absent from one side stay finite. Symmetry matters: plain
    KL(A‖B) weights by pA, so a token that EXPLODES in the new snapshot
    but was absent from the old one barely registers — exactly the
    boilerplate-injection case the instrument exists to catch. The
    corpus-QA question is "did this ingest change what the model will
    read?"; mass concentrating on a few tokens means boilerplate or a
    source shift, a flat profile means benign growth.

    Two grouped counts (one shuffle each, vocabulary-sized results) and
    a vocabulary-sized join — corpus size only enters through the
    scans, so the instrument is affordable at any snapshot size.
    Returns (tok, n_a, n_b, kl_q) with kl_q on the 1e-7 grid.
    """
    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias(out))
        )

    ca = counts(a, "n_a")
    cb = counts(b, "n_b")
    j = ca.join(cb, "tok", "full_outer").select(
        "tok",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = j.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"), F.count("*").alias("v")
    )
    j = j.crossJoin(F.broadcast(tot))  # one-row scalar totals
    pa = (F.col("n_a") + 1).cast("double") / (F.col("ta") + F.col("v")).cast("double")
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tb") + F.col("v")).cast("double")
    kl = pa * F.log(pa / pb) + pb * F.log(pb / pa)
    return j.select(
        "tok",
        "n_a",
        "n_b",
        F.floor(kl * 10000000 + F.lit(0.5)).cast("long").alias("kl_q"),
    )


def dedup_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "line_no",
    line_col: str = "line",
    min_occurrences: int = 2,
    scope_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 / CCNet curation step:
    Raffel et al. 1910.10683 §2.2 "three-sentence span" dedup, CCNet
    1911.00359 §3 paragraph-hash dedup): any normalized line occurring
    ``min_occurrences``-or-more times across the corpus is kept ONLY at
    its canonical first occurrence (lowest ``(id, pos)``) and dropped
    everywhere else — boilerplate (nav bars, cookie banners, license
    headers) dies corpus-wide while its first sighting survives.

    Input is the exploded ``(id, pos, line)`` shape — from
    ``F.posexplode(F.split(text, '\\n'))`` on real corpora, or from
    :func:`chunk_documents` when the "line" is a fixed token window.
    This keeps the splitting policy (newline / sentence / chunk) out of
    the dedup kernel. Output: the input rows that SURVIVE, plus
    ``n_occurrences`` (corpus-wide count of the line's key) and
    ``is_canonical`` (true on the first occurrence of a repeated line).

    Scale shape (100 TB): lines shuffle by a 64-bit xxhash64 key, never
    by the line string — the aggregate that computes ``(count,
    first-occurrence)`` per key is one map-side-combinable groupBy, and
    survivors come back via one hash-hash equi-join on the same key, so
    the corpus text crosses the wire once in each direction and nothing
    is quadratic. ``scope_col`` (e.g. per-source dedup) simply widens
    the key. Collisions: two DIFFERENT lines sharing an xxhash64 value
    inside one scope would merge their counts (~2e-10 at 1 B distinct
    lines/scope); acceptable for curation, same trade as
    :func:`duplicated_window_spans`.
    """
    if min_occurrences < 2:
        raise ValueError("min_occurrences must be >= 2 (1 would drop every line)")
    key_src = F.lower(F.trim(F.col(line_col))) if normalize else F.col(line_col)
    scope = [F.col(scope_col)] if scope_col else []
    keyed = lines.withColumn("_lk", F.xxhash64(key_src, *scope))
    occ = keyed.groupBy("_lk").agg(
        F.count("*").alias("n_occurrences"),
        F.min(F.struct(F.col(id_col), F.col(pos_col))).alias("_canon"),
    )
    joined = keyed.join(occ, "_lk")
    is_canon = (F.col("_canon")[id_col] == F.col(id_col)) & (
        F.col("_canon")[pos_col] == F.col(pos_col)
    )
    return (
        joined.filter((F.col("n_occurrences") < min_occurrences) | is_canon)
        .withColumn("is_canonical", (F.col("n_occurrences") >= min_occurrences) & is_canon)
        .drop("_lk", "_canon")
    )


def reassemble_lines(
    kept: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "line_no",
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """Rebuild one text per document from surviving lines, in original
    line order: ``(id, text, n_lines)``. One groupBy on the doc id
    (bounded by per-document line count); ordering is restored by
    sorting the collected ``(pos, line)`` structs, not by a window, so
    the plan is a single aggregate."""
    packed = F.array_sort(
        F.collect_list(F.struct(F.col(pos_col).alias("p"), F.col(line_col).alias("l")))
    )
    return kept.groupBy(F.col(id_col)).agg(
        F.concat_ws(sep, F.transform(packed, lambda s: s["l"])).alias("text"),
        F.count("*").alias("n_lines"),
    )


# Gopher rule-set stop words (Rae et al. 2112.11446, Table A1): a doc
# must contain at least two of these to pass the quality filter.
GOPHER_STOPWORDS: list[str] = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher repetition signals (Rae et al. 2112.11446
    Table A1, the "repetitious documents" family) as a DataFrame:

    - ``n_lines``; ``dup_line_frac``: occurrences of a line beyond its
      first over total lines (split on ``\\n``, trimmed, empties
      dropped); ``dup_line_char_frac``: characters in those duplicate
      occurrences over total line characters.
    - ``top_2gram_char_frac``: word characters covered by occurrences
      of the most frequent word 2-gram, over total word characters —
      UNION coverage (overlapping occurrences never double-count a
      character, so the fraction is <= 1). Top gram = highest count,
      ties by larger count x length then lexicographically larger
      gram — deterministic in both engines.
    - ``dup_5gram_char_frac``: word characters covered by any word
      5-gram occurring more than once — same union coverage (the span
      semantics ``remove_duplicated_substrings`` cuts by).

    Plan shape, deliberately RELATIONAL: tokens are exploded to
    (id, pos, word) rows, n-grams come from ``lead`` windows, gram
    occurrence counts from count-over-(id, gram) windows, the top gram
    from a max-over-id window, and union coverage from a rolling
    ``max(flag) over (rows n-1 preceding)`` window — every stage is
    codegen'd window/aggregate machinery over narrow rows, linear in
    document length. A pure array-expression form was tried first and
    abandoned: Spark's higher-order functions (transform/filter/
    aggregate) are CodegenFallback — interpreted, no subexpression
    elimination — and Catalyst inlines array aliases into lambda
    bodies, so the per-gram counting nested inside per-position
    coverage re-evaluated whole arrays per element (measured ~200 ms
    per 60-word doc; this plan does the same docs at ~1 ms). At 100 TB
    the cost is one shuffle of (id, pos, word) rows — narrow, and
    every window after the first reuses the id-hash partitioning.

    Line signals stay as (cheap, single-level) array expressions and
    join back on ``id_col``. Empty documents report zeros."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )
    n_lines = F.size(lines).cast("double")
    nd_lines = F.size(F.array_distinct(lines)).cast("double")
    line_chars = F.aggregate(
        lines, F.lit(0.0), lambda acc, ln: acc + F.length(ln).cast("double")
    )
    dist_line_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0.0),
        lambda acc, ln: acc + F.length(ln).cast("double"),
    )
    z = F.lit(0.0)
    line_stats = df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.coalesce(
            (n_lines - nd_lines) / F.greatest(n_lines, F.lit(1.0)), z
        ).alias("dup_line_frac"),
        F.coalesce(
            (line_chars - dist_line_chars) / F.greatest(line_chars, F.lit(1.0)), z
        ).alias("dup_line_char_frac"),
    )

    tok_rows = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("i", "w"),
    )
    win = Window.partitionBy("id").orderBy("i")
    g2 = F.concat_ws(" ", F.col("w"), F.lead("w", 1).over(win))
    g5 = F.concat_ws(
        " ", F.col("w"),
        *[F.lead("w", k).over(win) for k in (1, 2, 3, 4)],
    )
    # lead past the end -> null; concat_ws drops nulls, so a partial
    # tail gram would alias a shorter real gram. Null the partials out
    # (they have no full n-token window) to match the lead-based SQL.
    last = F.max("i").over(Window.partitionBy("id"))
    grams = tok_rows.select(
        "id", "i", "w",
        F.when(F.col("i") + 1 <= last, g2).alias("g2"),
        F.when(F.col("i") + 4 <= last, g5).alias("g5"),
    )
    c2 = F.count("*").over(Window.partitionBy("id", "g2"))
    c5 = F.count("*").over(Window.partitionBy("id", "g5"))
    counted = grams.select(
        "id", "i", "w",
        F.when(F.col("g2").isNotNull(), c2).alias("c2"),
        F.col("g2"),
        (F.when(F.col("g5").isNotNull(), c5) > 1).alias("dup5"),
    )
    top2 = F.max(
        F.when(
            F.col("g2").isNotNull(),
            F.struct(
                F.col("c2").alias("c"),
                (F.col("c2") * F.length("g2")).alias("cl"),
                F.col("g2").alias("g"),
            ),
        )
    ).over(Window.partitionBy("id"))
    flagged = counted.select(
        "id", "i", "w",
        (F.col("g2") == top2["g"]).alias("top2f"),
        "dup5",
    )
    # union coverage: token i is covered iff any gram window containing
    # it is flagged -> rolling max over the n-1 preceding gram flags
    cov2 = F.max(F.coalesce(F.col("top2f"), F.lit(False)).cast("int")).over(
        win.rowsBetween(-1, 0)
    )
    cov5 = F.max(F.coalesce(F.col("dup5"), F.lit(False)).cast("int")).over(
        win.rowsBetween(-4, 0)
    )
    covered = flagged.select(
        "id", "w", cov2.alias("cov2"), cov5.alias("cov5")
    )
    gram_stats = covered.groupBy("id").agg(
        F.sum(F.length("w")).cast("double").alias("total_wchars"),
        F.sum(F.when(F.col("cov2") == 1, F.length("w")).otherwise(0))
        .cast("double").alias("cov2_chars"),
        F.sum(F.when(F.col("cov5") == 1, F.length("w")).otherwise(0))
        .cast("double").alias("cov5_chars"),
    )
    return line_stats.join(gram_stats, "id", "left").select(
        F.col("id").alias(id_col),
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        F.coalesce(
            F.col("cov2_chars") / F.greatest(F.col("total_wchars"), F.lit(1.0)), z
        ).alias("top_2gram_char_frac"),
        F.coalesce(
            F.col("cov5_chars") / F.greatest(F.col("total_wchars"), F.lit(1.0)), z
        ).alias("dup_5gram_char_frac"),
    )


def gopher_quality_flags(col: Column) -> Column:
    """Struct of the Gopher composition signals + the combined ``keep``
    verdict (Rae et al. 2112.11446 Table A1, the "quality filtering"
    family), as native expressions:

    - ``n_words`` in [50, 100000]; ``mean_word_len`` in [3, 10]
      (letter-character mean over whitespace words);
    - ``symbol_word_ratio`` (occurrences of ``#`` or ``...`` per word)
      <= 0.1;
    - ``bullet_line_frac`` (lines starting with a bullet) <= 0.9 and
      ``ellipsis_line_frac`` (lines ending with ``...``) <= 0.3;
    - ``alpha_word_frac`` (words containing at least one alphabetic
      character) >= 0.8;
    - ``n_stopwords_present`` (distinct members of
      :data:`GOPHER_STOPWORDS` appearing as words) >= 2.

    ``keep`` is the conjunction — the published Gopher gate. Signals
    ride along so downstream consumers can re-threshold without
    recomputing."""
    toks = F.filter(tokens(col), lambda t: t != F.lit(""))
    n_words = F.size(toks).cast("long")
    word_len_sum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("double"),
    )
    mean_word_len = word_len_sum / F.greatest(n_words.cast("double"), F.lit(1.0))
    raw = F.trim(col)
    n_hash = F.size(F.split(raw, "#", -1)) - 1
    n_ellipsis = F.size(F.split(raw, r"\.\.\.", -1)) - 1
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / F.greatest(
        n_words.cast("double"), F.lit(1.0)
    )
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )
    n_lines = F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    bullet_frac = (
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"^(\-|\*|•)"))
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: ln.rlike(r"\.\.\.$"))).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}"))).cast("double")
        / F.greatest(n_words.cast("double"), F.lit(1.0))
    )
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    ).cast("long")
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return F.struct(
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords_present"),
        keep.alias("keep"),
    )


# C4 page-level poison markers (Raffel et al. 1910.10683 §2.2): a page
# containing any of these is dropped outright.
C4_PAGE_MARKERS: list[str] = ["lorem ipsum", "{"]


def c4_line_filter(col: Column, min_words: int = 5) -> Column:
    """The C4 line-level cleaning rules (Raffel et al. 1910.10683
    §2.2) as one native expression — struct of the cleaned text plus
    audit counts:

    - keep only lines ending in terminal punctuation (. ! ? or a
      closing quote after one);
    - drop lines with fewer than ``min_words`` whitespace words;
    - drop lines containing the word "javascript" (case-insensitive);
    - ``page_flagged``: the page-level poison verdict (contains
      "lorem ipsum" or a curly brace, case-insensitive) — C4 drops
      the whole page; surfaced as a flag so the caller chooses.

    Returns struct (text_clean, n_lines, n_kept, page_flagged). The
    kept lines are re-joined with ``\\n`` in original order."""
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r"[.!?][\"']?$")
        & (F.size(F.split(ln, r"\s+")) >= min_words)
        & ~F.lower(ln).contains("javascript"),
    )
    low = F.lower(col)
    flagged = F.lit(False)
    for m in C4_PAGE_MARKERS:
        flagged = flagged | low.contains(m)
    return F.struct(
        F.concat_ws("\n", kept).alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        flagged.alias("page_flagged"),
    )


def _sampled_cutoffs(
    s: DataFrame, lang_col: str | None, n_buckets: int, sample_k: int
) -> DataFrame:
    """Per-language sampled score cutoffs ``(_lk, _cuts)`` from a scored
    ``(id, logprob_q[, lang])`` frame: deterministic md5 bottom-k sample
    (two-pass prefix refinement, no task ever sorts more than ~k rows),
    then the ``n_buckets - 1`` values at desc-ranks ``ceil(b*m/n)``,
    descending. Shared by :func:`perplexity_buckets` (method='sampled')
    and :func:`perplexity_bucket_agreement` — ONE definition, so the
    agreement instrument measures the production cut, not a twin."""
    lk = F.col(lang_col) if lang_col else F.lit("")
    keyed = s.select(
        "id",
        "logprob_q",
        *([lang_col] if lang_col else []),
        lk.alias("_lk"),
        F.md5(F.concat_ws("|", F.lit("ppl"), F.col("id"))).alias("_h"),
    ).withColumn("_hp", F.substring("_h", 1, 4))
    # Pass 1: smallest 4-hex prefix whose cumulative count reaches k.
    wc = Window.partitionBy("_lk").orderBy("_hp")
    thr = (
        keyed.groupBy("_lk", "_hp")
        .agg(F.count("*").alias("n"))
        .withColumn("cum", F.sum("n").over(wc))
        .filter(F.col("cum") >= sample_k)
        .groupBy("_lk")
        .agg(F.min("_hp").alias("_thr"))
    )
    cand = keyed.join(F.broadcast(thr), "_lk", "left").filter(
        F.col("_thr").isNull() | (F.col("_hp") <= F.col("_thr"))
    )
    # Pass 2: exact md5 bottom-k on the surviving sliver (~k rows/lang).
    wk = Window.partitionBy("_lk").orderBy("_h")
    samp = cand.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= sample_k
    )
    # Cutoff b = sample value at desc-rank ceil(b*m/n_buckets), b<n.
    ws = Window.partitionBy("_lk").orderBy(
        F.col("logprob_q").desc(), F.col("id").asc()
    )
    ranked = samp.select("_lk", "logprob_q", "id").withColumn(
        "_r", F.row_number().over(ws)
    )
    m = ranked.groupBy("_lk").agg(F.max("_r").alias("_m"))
    bvals = F.explode(
        F.sequence(F.lit(1), F.lit(n_buckets - 1))
    ).alias("_b")
    cut_ranks = m.select("_lk", "_m", bvals).select(
        "_lk",
        F.ceil(F.col("_b") * F.col("_m") / F.lit(n_buckets))
        .cast("int")
        .alias("_r"),
    )
    return (
        ranked.join(cut_ranks, ["_lk", "_r"])
        .groupBy("_lk")
        .agg(
            F.reverse(F.sort_array(F.collect_list("logprob_q"))).alias(
                "_cuts"
            )
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    lm_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    n_buckets: int = 3,
    quantize: int = 4,
    method: str = "sampled",
    sample_k: int = 4096,
    allow_exact_global: bool = False,
    _scored_joined: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3): score every document against the FROZEN
    stored reference LM (:func:`score_against_lm` — the model is
    trained once on a trusted corpus and never fed back, so buckets
    stay comparable across crawl snapshots) and cut each language into
    ``n_buckets`` equal-population perplexity bands. Bucket 1 = head
    (highest avg log-prob = lowest perplexity = most reference-like);
    the paper keeps head+middle for LM pretraining and discards or
    down-weights the tail.

    Two cut strategies, same output schema:

    - ``method="sampled"`` (the production default) — CCNet's actual
      formulation (§4.3 computes percentile CUTOFFS once, then buckets
      by comparison): derive the ``n_buckets - 1`` per-language score
      cutoffs from a bounded deterministic sample (md5 bottom-k per
      language, ``sample_k`` rows, selected with the two-pass prefix
      threshold refinement of ``percentiles_sampled`` so no task ever
      sorts more than ~k rows), broadcast the tiny (lang, cutoffs)
      table, and bucket every document by comparison:
      ``bucket = 1 + #{cutoffs c : score < c}`` (ties land head-side).
      NO global or per-language sort of the corpus anywhere — the cut
      is a broadcast-join + array filter, embarrassingly parallel at
      100 TB even when one language (or ``lang_col=None``) holds every
      row. Band boundaries are sample-rank estimates (rank error
      O(1/sqrt(k)) per cutoff); the whole chain — sampling keys,
      bottom-k, cutoff ranks, comparison — is deterministic and
      replayed in ANSI SQL by the ``perplexity_buckets_sampled``
      oracle row, with per-doc agreement vs the exact cut measured by
      the ``ppl_bucket_agree`` instrument row.

    - ``method="exact"`` — the oracle-replayable twin: one window
      keyed by language, ``ntile(n_buckets)`` over
      (score desc, id asc). Exactly equal-population, but each
      language's ENTIRE (id, score) set sorts in ONE task; with
      ``lang_col=None`` the whole corpus lands on a single task, so
      that combination raises unless ``allow_exact_global=True`` is
      passed explicitly (small corpora / oracle replay only).

    Determinism: scores land on the ``10^-quantize`` grid BEFORE
    either cut, ties break on id — both methods replay in ANSI SQL and
    are value-verified by their oracle rows. ``lang_col=None`` cuts
    globally; with a language column the bands are per language, the
    paper's setup (a language's own score distribution defines its
    head). Documents with fewer than 2 tokens emit no row (the
    scorer's contract).

    Scale shape (sampled): one delta tokenization + the stored-LM key
    joins (:func:`score_against_lm`'s own audit); pass 1 histograms
    4-hex md5 prefixes per language (map-side-combining grouped count,
    ≤ langs × 65536 narrow rows); pass 2 sorts only the ~k-row sliver
    at or below each language's threshold prefix; the final bucket
    assignment is a broadcast join against ≤ langs rows of cutoff
    arrays. Would survive 100 TB with a single dominant language."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if method not in ("sampled", "exact"):
        raise ValueError("method must be 'sampled' or 'exact'")
    if method == "exact" and lang_col is None and not allow_exact_global:
        raise ValueError(
            "method='exact' with lang_col=None sorts the whole corpus in "
            "one task; pass allow_exact_global=True (small data only) or "
            "use method='sampled'"
        )
    if sample_k < n_buckets:
        raise ValueError("sample_k must be >= n_buckets")
    if _scored_joined is not None:
        # perplexity_bucket_agreement runs BOTH cut strategies over the
        # same scores; computing (and caching) the tokenize + stored-LM
        # join chain once and passing the joined frame here halves the
        # instrument's scoring work without touching either cut's logic.
        s = _scored_joined
    else:
        scored = score_against_lm(
            docs, lm_path, id_col=id_col, text_col=text_col
        ).select(
            "id",
            F.floor(F.col("avg_logprob") * (10**quantize) + F.lit(0.5))
            .cast("long")
            .alias("logprob_q"),
        )
        side = docs.select(
            F.col(id_col).alias("id"),
            *([F.col(lang_col)] if lang_col else []),
        )
        s = scored.join(side, "id")
    out_cols = [
        F.col("id").alias(id_col),
        *([F.col(lang_col)] if lang_col else []),
        "logprob_q",
    ]
    if method == "exact":
        part = [F.col(lang_col)] if lang_col else []
        w = Window.partitionBy(*part).orderBy(
            F.col("logprob_q").desc(), F.col("id").asc()
        )
        return s.withColumn(
            "bucket", F.ntile(n_buckets).over(w).cast("long")
        ).select(*out_cols, "bucket")
    # method == "sampled": two-pass bounded cutoff derivation. The
    # scored frame feeds both the cutoff sample and the final bucket
    # join, so pin it (narrow: id, score, lang) instead of re-running
    # the tokenize + LM-join chain twice.
    from traceframe_spark.operators.dedup import _unpersist_with

    if _scored_joined is None:
        s = s.persist()
        # Materialize eagerly: the threshold-prefix and cutoff frames
        # below are broadcast, and their broadcast-build jobs launch
        # concurrently BEFORE the cache is populated — each would re-run
        # the tokenize + stored-LM join chain inside a single-task
        # broadcast stage (the dedup_against_index finding; same fix).
        # A caller-passed frame is the caller's to pin.
        s.count()
    lk = F.col(lang_col) if lang_col else F.lit("")
    cuts = _sampled_cutoffs(s, lang_col, n_buckets, sample_k)
    out = (
        s.withColumn("_lk", lk)
        .join(F.broadcast(cuts), "_lk")
        .withColumn(
            "bucket",
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        F.col("_cuts"),
                        lambda c: F.col("logprob_q") < c,
                    )
                )
            ).cast("long"),
        )
        .select(*out_cols, "bucket")
    )
    return out if _scored_joined is not None else _unpersist_with(out, s)


def perplexity_bucket_agreement(
    docs: DataFrame,
    lm_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    n_buckets: int = 3,
    quantize: int = 4,
    sample_k: int = 4096,
) -> DataFrame:
    """Band-agreement instrument for the sampled perplexity cut (the
    ``ann_adc_agreement`` methodology applied to CCNet bucketing): run
    BOTH cut strategies of :func:`perplexity_buckets` off the same
    frozen LM and report, per document, the exact-ntile bucket, the
    sampled-cutoff bucket, and an ``agree`` flag — so the sampled
    path's band fidelity is a value-checked property of the engine,
    not a sampled estimate. Disagreements concentrate exactly at band
    boundaries (rank error O(1/sqrt(sample_k)) per cutoff, plus ntile's
    arbitrary id tie-split of tied scores, which the comparison cut
    keeps together by design).

    Output: (id, [lang], logprob_q, bucket_exact, bucket_sampled,
    agree). Diagnostic only — the exact path sorts per language in one
    task, so run this on a bounded audit slice, not the full corpus."""
    # Score ONCE for both cut strategies: the exact ntile and the
    # sampled comparison cut are deterministic functions of the same
    # (id, logprob_q[, lang]) frame, so running the tokenize +
    # stored-LM join chain twice (one per strategy) bought nothing.
    # The shared frame is pinned and materialized here — it feeds the
    # exact window, the sampled two-pass cutoff derivation (whose
    # broadcast builds would otherwise race to recompute it), and the
    # final join.
    scored = score_against_lm(
        docs, lm_path, id_col=id_col, text_col=text_col
    ).select(
        "id",
        F.floor(F.col("avg_logprob") * (10**quantize) + F.lit(0.5))
        .cast("long")
        .alias("logprob_q"),
    )
    side = docs.select(
        F.col(id_col).alias("id"),
        *([F.col(lang_col)] if lang_col else []),
    )
    s = scored.join(side, "id").persist()
    s.count()
    # BOTH buckets off the one pinned frame in a SINGLE plan: the
    # sampled bucket is a broadcast join against the tiny per-language
    # cutoff arrays (the production cut, via the shared
    # :func:`_sampled_cutoffs`), the exact bucket an ntile window over
    # the same rows — the two-derivations-plus-id-join form paid a
    # whole extra scan of the cached frame and a shuffle join only to
    # reunite columns that were never apart (same values: the inner
    # broadcast join on ``_lk`` keeps every row — each language's
    # cutoffs exist by construction — and ntile depends only on the
    # per-language row set and its (score desc, id) order, both
    # untouched by the join).
    lk = F.col(lang_col) if lang_col else F.lit("")
    cuts = _sampled_cutoffs(s, lang_col, n_buckets, sample_k)
    part = [F.col(lang_col)] if lang_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col("logprob_q").desc(), F.col("id").asc()
    )
    out = (
        s.withColumn("_lk", lk)
        .join(F.broadcast(cuts), "_lk")
        .withColumn(
            "bucket_sampled",
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        F.col("_cuts"),
                        lambda c: F.col("logprob_q") < c,
                    )
                )
            ).cast("long"),
        )
        .withColumn("bucket_exact", F.ntile(n_buckets).over(w).cast("long"))
        .select(
            F.col("id").alias(id_col),
            *([F.col(lang_col)] if lang_col else []),
            "logprob_q",
            "bucket_exact",
            "bucket_sampled",
            (F.col("bucket_exact") == F.col("bucket_sampled"))
            .cast("long")
            .alias("agree"),
        )
    )
    from traceframe_spark.operators.dedup import _unpersist_with

    return _unpersist_with(out, s)
