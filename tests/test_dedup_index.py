"""Persistent dedup index (operators/dedup_index): layer-kill
semantics, append incrementality, and parameter portability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import dedup_index as di


BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long and winding tune about shingled documents and dedup stores"
)


@pytest.fixture()
def corpus(spark):
    # 10 indexed docs with disjoint-ish bodies (distinct suffix block
    # per doc so no accidental near-dups across ids)
    rows = [(i, f"{BASE} variant {i} " + f"tail-{i} " * 20) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_layer_kill_semantics(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=32, bands=8)
    delta = spark.createDataFrame(
        [
            # exact clone of doc 3 (case/whitespace-normalized match)
            (103, "  " + (BASE + " variant 3 " + "tail-3 " * 20).upper()),
            # near clone of doc 4: tiny appended suffix, jaccard ~0.97
            (104, BASE + " variant 4 " + "tail-4 " * 20 + "zzz"),
            # genuinely novel
            (105, "completely different content " + "nowhere-else " * 30),
        ],
        "doc_id long, text string",
    )
    # exact layer only: the clone dies, the near-clone survives
    exact_only = di.dedup_against_index(delta, path, near_dup=False)
    assert _ids(exact_only) == [104, 105]
    # full probe: clone dies in layer 1, near-clone in layer 2
    full = di.dedup_against_index(delta, path, threshold=0.9)
    assert _ids(full) == [105]


def test_append_from_index_derived_frame_grows_near_layers(spark, corpus, tmp_path):
    # REGRESSION (r08): the canonical daily loop appends survivors whose
    # lineage READS this index. Appending to {path}/exact triggers
    # Spark's recacheByPath, which re-evaluates that lineage against the
    # UPDATED store — to empty — so the sig/band appends that follow
    # would silently write nothing and near-clones of accepted docs
    # would sail through forever. append_dedup_index localCheckpoints
    # the input to pin the rows first.
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=32, bands=8)
    sig0 = spark.read.parquet(f"{path}/sigs").count()
    delta = spark.createDataFrame(
        [(700, "entirely new material " + "brick " * 40)],
        "doc_id long, text string",
    )
    surv = di.dedup_against_index(delta, path, threshold=0.9)  # index-derived
    di.append_dedup_index(surv, path)
    assert spark.read.parquet(f"{path}/sigs").count() == sig0 + 1
    # and the near layer actually knows the accepted doc now
    near = spark.createDataFrame(
        [(701, "entirely new material " + "brick " * 40 + "x")],
        "doc_id long, text string",
    )
    assert di.dedup_against_index(near, path, threshold=0.9).count() == 0
    # same for the gram layer: append of an index-derived frame adds keys
    di.write_gram_layer(corpus, path, n=3)
    g0 = spark.read.parquet(f"{path}/grams").count()
    surv2 = di.dedup_against_index(
        spark.createDataFrame(
            [(702, "unseen prose entirely " + "plank " * 30)],
            "doc_id long, text string",
        ),
        path,
        threshold=0.9,
    )
    di.append_gram_layer(surv2, path)
    assert spark.read.parquet(f"{path}/grams").count() > g0


def test_append_makes_reprobe_empty(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=32, bands=8)
    delta = spark.createDataFrame(
        [(200 + i, f"fresh body {i} " + f"block-{i} " * 25) for i in range(5)],
        "doc_id long, text string",
    )
    surv = di.dedup_against_index(delta, path, threshold=0.9)
    assert _ids(surv) == [200, 201, 202, 203, 204]
    di.append_dedup_index(surv, path)
    # the daily loop's invariant: once appended, the same delta is
    # fully absorbed (every doc exact-hits its own stored key)
    again = di.dedup_against_index(delta, path, threshold=0.9)
    assert again.count() == 0
    # and the original corpus is still absorbed too (append, not clobber)
    assert di.dedup_against_index(corpus, path, threshold=0.9).count() == 0


def test_probe_uses_stored_params_not_defaults(spark, corpus, tmp_path):
    # build with NON-default hashing; the probe takes no hash params at
    # all — it must read (n_hashes, bands, shingle_size) from meta, or
    # every band hash would mismatch and near-dups would sail through
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=48, bands=12, shingle_size=4)
    assert di.read_index_meta(spark, path) == (48, 12, 4)
    near = spark.createDataFrame(
        [(300, BASE + " variant 7 " + "tail-7 " * 20 + "q")],
        "doc_id long, text string",
    )
    assert di.dedup_against_index(near, path, threshold=0.9).count() == 0
    # append must also hash with stored params: append a doc, then its
    # own near-clone must be caught via the appended band entries
    novel = spark.createDataFrame(
        [(301, "append-only body " + "chunk " * 40)], "doc_id long, text string"
    )
    di.append_dedup_index(novel, path)
    near2 = spark.createDataFrame(
        [(302, "append-only body " + "chunk " * 40 + "y")],
        "doc_id long, text string",
    )
    assert di.dedup_against_index(near2, path, threshold=0.9).count() == 0


def test_index_stores_no_text(spark, corpus, tmp_path):
    # the point of the index: document bytes never land in the store
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=32, bands=8)
    for layer, cols in (
        ("exact", {"ckey", "id"}),
        ("sigs", {"id", "sig"}),
        ("bands", {"band", "bh", "id"}),
    ):
        got = set(spark.read.parquet(f"{path}/{layer}").columns)
        assert got == cols, layer


def test_portable_store_layer_kill_and_append(spark, corpus, tmp_path):
    # the md5-affine portable families must make the same layer-kill
    # decisions as the xxhash64 default on clear-cut cases, and the
    # portable flag must be pinned in meta so appends/probes hash the
    # stored way (a mixed-family store would silently miss everything)
    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, n_hashes=32, bands=8, portable=True)
    assert di._index_is_portable(spark, path)
    delta = spark.createDataFrame(
        [
            (103, "  " + (BASE + " variant 3 " + "tail-3 " * 20).upper()),
            (104, BASE + " variant 4 " + "tail-4 " * 20 + "zzz"),
            (105, "completely different content " + "nowhere-else " * 30),
        ],
        "doc_id long, text string",
    )
    assert _ids(di.dedup_against_index(delta, path, threshold=0.9)) == [105]
    # band keys are portable strings, signature values < 2^31
    bh = spark.read.parquet(f"{path}/bands").select("bh").first()["bh"]
    assert isinstance(bh, str) and "-" in bh
    mx = spark.read.parquet(f"{path}/sigs").select(
        F.max(F.array_max("sig")).alias("m")
    ).first()["m"]
    assert mx < (1 << 31)
    # append hashes with the stored (portable) families: an appended
    # doc's near-clone must be caught via the appended band entries
    novel = spark.createDataFrame(
        [(301, "append-only body " + "chunk " * 40)], "doc_id long, text string"
    )
    di.append_dedup_index(novel, path)
    near2 = spark.createDataFrame(
        [(302, "append-only body " + "chunk " * 40 + "y")],
        "doc_id long, text string",
    )
    assert di.dedup_against_index(near2, path, threshold=0.9).count() == 0


def test_exact_only_store(spark, corpus, tmp_path):
    # with_near=False writes the content-key registry shape: no MinHash
    # layers on disk, exact probes and appends work, near probes fail
    # loudly instead of silently missing everything
    import os

    path = str(tmp_path / "idx")
    di.write_dedup_index(corpus, path, with_near=False)
    assert not os.path.exists(f"{path}/sigs")
    assert not os.path.exists(f"{path}/bands")
    delta = spark.createDataFrame(
        [
            (103, "  " + (BASE + " variant 3 " + "tail-3 " * 20).upper()),
            (105, "completely different content " + "nowhere-else " * 30),
        ],
        "doc_id long, text string",
    )
    assert _ids(di.dedup_against_index(delta, path, near_dup=False)) == [105]
    with pytest.raises(ValueError, match="exact-only"):
        di.dedup_against_index(delta, path, threshold=0.9)
    # append stays exact-only and absorbs the appended docs
    surv = di.dedup_against_index(delta, path, near_dup=False)
    di.append_dedup_index(surv, path)
    assert not os.path.exists(f"{path}/sigs")
    assert di.dedup_against_index(delta, path, near_dup=False).count() == 0


def test_gram_layer_matches_batch_operator(spark, tmp_path):
    # the stored-layer probe must land on the BATCH operator's exact
    # answer: same split, same gram semantics, reference side read from
    # the store instead of re-grammed text
    from traceframe_spark.operators import text
    from traceframe_spark.plans.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    ref = d.filter(F.col("doc_id") % 10 < 3)
    corpus = d.filter(F.col("doc_id") % 10 >= 3)
    path = str(tmp_path / "gidx")
    di.write_gram_layer(ref, path, n=3)
    assert di.read_gram_meta(spark, path) == 3

    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], round(r["novelty"], 9))
        for r in di.novelty_against_index(corpus, path).collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], round(r["novelty"], 9))
        for r in text.ngram_novelty(corpus, ref, n=3).collect()
    }
    assert got == want


def test_gram_layer_contamination_matches_batch_operator(spark, tmp_path):
    # decontamination from the stored layer = the batch operator's
    # answer with the benchmark grams read from the store
    from traceframe_spark.operators import text
    from traceframe_spark.plans.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    path = str(tmp_path / "gidx")
    di.write_gram_layer(bench, path, n=3)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], round(r["overlap"], 9))
        for r in di.contamination_against_index(corpus, path).collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], round(r["overlap"], 9))
        for r in text.contamination(corpus, bench, n=3).collect()
    }
    assert got == want


def test_gram_layer_append_absorbs_and_zero_gram(spark, tmp_path):
    path = str(tmp_path / "gidx")
    snap = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    di.write_gram_layer(snap, path, n=3)
    delta = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # fully seen: 2 grams, 0 novel
            (2, "one two three four five"),        # fully novel: 3 grams
            (3, "so short"),                       # < n words: zero grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in di.novelty_against_index(delta, path).collect()}
    assert (out[1]["n_grams"], out[1]["n_novel"], out[1]["novelty"]) == (2, 0, 0.0)
    assert (out[2]["n_grams"], out[2]["n_novel"], out[2]["novelty"]) == (3, 3, 1.0)
    # zero-gram docs report novelty 0.0 — the batch operator's contract
    assert (out[3]["n_grams"], out[3]["n_novel"], out[3]["novelty"]) == (0, 0, 0.0)

    # fold doc 2 in; its grams are no longer novel, and the layer stayed
    # a distinct set (append anti-joins stored keys)
    di.append_gram_layer(delta.filter(F.col("doc_id") == 2), path)
    again = {r["doc_id"]: r for r in di.novelty_against_index(delta, path).collect()}
    assert again[2]["n_novel"] == 0
    grams = spark.read.parquet(f"{path}/grams")
    assert grams.count() == grams.distinct().count()
    # re-appending the same doc adds nothing
    before = grams.count()
    di.append_gram_layer(delta.filter(F.col("doc_id") == 2), path)
    assert spark.read.parquet(f"{path}/grams").count() == before


def test_registry_twin_consistency(spark, tmp_path):
    # the registered delta query's survivors are a subset of the exact
    # twin's (the LSH layer only ever removes more), and both keep
    # every genuinely-novel doc
    from traceframe_spark.plans.pipeline import (
        q_dedup_index_delta,
        q_dedup_index_exact,
    )

    sf = "/root/testdata/sf0.001"
    exact = set(_ids(q_dedup_index_exact(spark, sf)))
    full = set(_ids(q_dedup_index_delta(spark, sf)))
    assert full <= exact
    # the seeded exact clones (+100000) died in both
    assert not any(100000 <= i < 200000 for i in exact)
    # the seeded near-clones (+200000) survive exact and die in full —
    # except possibly estimator-boundary pairs: with k=64 the MinHash
    # estimate of a pair sitting just above threshold 0.9 can land
    # either side (sigma ~ 1/8 of a position count), so a survivor is
    # acceptable ONLY if its exact shingle jaccard is in the boundary
    # zone; anything comfortably above threshold must die
    near_seeded = {i for i in exact if 200000 <= i < 300000}
    assert near_seeded  # exact layer cannot kill a suffix-edited doc
    survivors = {i for i in full if 200000 <= i < 300000}
    assert len(survivors) <= max(1, len(near_seeded) // 5)
    if survivors:
        from traceframe_spark.operators.dedup import char_shingles
        from traceframe_spark.plans.pipeline import _index_split

        ref, delta = _index_split(spark, sf)
        d = delta.filter(F.col("doc_id").isin(list(survivors))).select(
            F.col("doc_id").alias("k"),
            char_shingles(F.lower(F.trim("text"))).alias("sh_d"),
        )
        r = ref.filter(
            F.col("doc_id").isin([i - 200000 for i in survivors])
        ).select(
            (F.col("doc_id") + 200000).alias("k"),
            char_shingles(F.lower(F.trim("text"))).alias("sh_r"),
        )
        jac = (
            d.join(r, "k")
            .select(
                (
                    F.size(F.array_intersect("sh_d", "sh_r"))
                    / F.size(F.array_union("sh_d", "sh_r"))
                ).alias("j")
            )
            .collect()
        )
        assert all(row["j"] < 0.95 for row in jac), jac


def test_day_n_production_loop(spark, tmp_path):
    """The full production order the curation demo runs (r09 stage 11):
    dedup_pipeline survivors -> write index + gram layer once -> daily
    probe / novelty triage / append. Day 2's clones of day 1's ACCEPTED
    docs must die purely because of the fold-back appends — the
    incremental property the index family exists for."""
    from traceframe_spark.operators.dedup import dedup_pipeline

    raw = spark.createDataFrame(
        [(i, f"{BASE} variant {i} " + f"tail-{i} " * 20) for i in range(8)]
        # near-dup cluster the pipeline must collapse BEFORE indexing
        + [(100 + j, f"{BASE} clustered copy " + "tail-x " * 20 + f" tweak{j}")
           for j in range(3)],
        "doc_id long, text string",
    )
    day0 = dedup_pipeline(raw, "doc_id", "text", threshold=0.9)
    assert day0.count() == 9  # 8 distinct + 1 cluster canonical
    idx = str(tmp_path / "idx")
    di.write_dedup_index(day0, idx)
    di.write_gram_layer(day0, idx, n=3)

    def fresh(day):
        return spark.createDataFrame(
            [
                (1000 * day + k,
                 f"day {day} dispatch {k} "
                 + " ".join(f"uniq{day}x{k}w{j}token" for j in range(30)))
                for k in range(3)
            ],
            "doc_id long, text string",
        )

    # day 1: re-crawl of indexed doc + edit of indexed doc + fresh
    d1 = spark.createDataFrame(
        [(501, f"{BASE} variant 1 " + "tail-1 " * 20),
         (502, f"{BASE} variant 2 " + "tail-2 " * 20 + " edited")],
        "doc_id long, text string",
    ).unionByName(fresh(1))
    s1 = di.dedup_against_index(d1, idx, threshold=0.9)
    assert _ids(s1) == [1000, 1001, 1002]
    nov1 = di.novelty_against_index(s1, idx)
    assert nov1.filter(F.col("novelty") > 0.7).count() == 3
    di.append_dedup_index(s1, idx)
    di.append_gram_layer(s1, idx)
    assert di.dedup_against_index(d1, idx, threshold=0.9).count() == 0

    # day 2: clones + near-edits of day 1's ACCEPTS, plus fresh
    d2 = (
        fresh(1).select((F.col("doc_id") + 50).alias("doc_id"), "text")
        .unionByName(
            fresh(1).select(
                (F.col("doc_id") + 60).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" edited")).alias("text"),
            )
        )
        .unionByName(fresh(2))
    )
    s2 = di.dedup_against_index(d2, idx, threshold=0.9)
    assert _ids(s2) == [2000, 2001, 2002]  # day-1 clones AND edits die
    # day-2 fresh docs stay novel; a re-probe of day 1's text is stale
    nov2 = di.novelty_against_index(s2, idx)
    assert nov2.filter(F.col("novelty") > 0.7).count() == 3
    stale = di.novelty_against_index(
        fresh(1).select((F.col("doc_id") + 70).alias("doc_id"), "text"), idx
    )
    assert stale.agg(F.max("novelty")).first()[0] == 0.0


def test_append_sequence_pins_callers_frame(spark, tmp_path):
    """REGRESSION (r09): the canonical two-append sequence on one lazy
    index-derived frame — append_dedup_index(surv) then
    append_gram_layer(surv) — must fold the SAME survivor rows into
    both stores. The first append's full-row localCheckpoint pins the
    caller's shared RDD; an r09 attempt to checkpoint only the derived
    narrow layers (cheaper) lost that pin, and the gram append silently
    re-probed the updated store — to empty. Note surv.count() AFTER the
    first append legitimately reads 0 (count() builds a fresh plan that
    sees the updated index); the gram append must NOT behave like
    count()."""
    snap = spark.createDataFrame(
        [(i, f"{BASE} variant {i} " + f"tail-{i} " * 20) for i in range(4)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    di.write_dedup_index(snap, idx)
    di.write_gram_layer(snap, idx, n=3)
    delta = spark.createDataFrame(
        [(900 + k, f"fresh item {k} " + " ".join(f"zz{k}w{j}gram" for j in range(20)))
         for k in range(3)],
        "doc_id long, text string",
    )
    surv = di.dedup_against_index(delta, idx, threshold=0.9)  # lazy, index-derived
    g0 = spark.read.parquet(f"{idx}/grams").count()
    di.append_dedup_index(surv, idx)
    di.append_gram_layer(surv, idx)
    # all three survivors' sigs landed AND their grams landed
    assert spark.read.parquet(f"{idx}/sigs").count() == 4 + 3
    assert spark.read.parquet(f"{idx}/grams").count() > g0
    stale = di.novelty_against_index(
        delta.select((F.col("doc_id") + 50).alias("doc_id"), "text"), idx
    )
    assert stale.agg(F.max("novelty")).first()[0] == 0.0


def test_ckeys_bloom_prefilter_identical_answers(spark, tmp_path):
    """The exact-layer Bloom sidecar (r13): manifest builds commit it,
    fold-backs maintain it in the same commit, compaction OR-folds it,
    and probe answers are IDENTICAL to a sidecar-less store on every
    delta shape — all-fresh (the skip-the-layer fast path), all-hit,
    and mixed."""
    from traceframe_spark.streaming import manifest_store as MS

    docs = spark.createDataFrame(
        [(i, f"base text number {i} " * 10) for i in range(20)],
        "doc_id long, text string",
    )
    mani = str(tmp_path / "ckb_idx")
    di.write_dedup_index(docs, mani, n_hashes=32, bands=8, protocol="manifest")
    man = MS._latest_manifest(spark, mani)
    assert "ckeys_bloom" in man["layers"]
    legacy = str(tmp_path / "ckb_legacy")
    di.write_dedup_index(docs, legacy, n_hashes=32, bands=8)  # no sidecar

    fresh = spark.createDataFrame(
        [(100 + i, f"totally new content {i} " * 12) for i in range(5)],
        "doc_id long, text string",
    )
    hits = docs.limit(3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    mixed = fresh.unionByName(hits)
    for delta in (fresh, hits, mixed):
        a = sorted(
            r["doc_id"]
            for r in di.dedup_against_index(
                delta, mani, near_dup=False, bloom_prefilter=True
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in di.dedup_against_index(delta, legacy, near_dup=False).collect()
        )
        assert a == b
        # and the default (prefilter off) agrees on the sidecar store too
        assert a == sorted(
            r["doc_id"]
            for r in di.dedup_against_index(delta, mani, near_dup=False).collect()
        )
    # fold-back maintains the sidecar in the SAME commit; a clone of an
    # APPENDED doc then dies through the bloom path
    di.append_dedup_index(fresh, mani)
    man2 = MS._latest_manifest(spark, mani)
    assert len(man2["layers"]["ckeys_bloom"]) == 2
    clone = spark.createDataFrame(
        [(999, "totally new content 0 " * 12)], "doc_id long, text string"
    )
    assert di.dedup_against_index(
        clone, mani, near_dup=False, bloom_prefilter=True
    ).count() == 0
    # compaction OR-folds the sidecar; answers unchanged after
    MS.compact_manifest_layers(spark, mani)
    man3 = MS._latest_manifest(spark, mani)
    assert len(man3["layers"]["ckeys_bloom"]) == 1
    assert di.dedup_against_index(
        clone, mani, near_dup=False, bloom_prefilter=True
    ).count() == 0
    assert di.dedup_against_index(
        spark.createDataFrame([(7, "never seen before")], "doc_id long, text string"),
        mani, near_dup=False, bloom_prefilter=True,
    ).count() == 1
