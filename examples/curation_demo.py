"""End-to-end training-data curation tour on the synthetic corpus.

Run: python examples/curation_demo.py [sf_dir]

The pipeline a 100 TB pretraining corpus goes through, on the driver
testdata: profile → quality/language gate → PII scrub → exact +
near-duplicate removal → sequence packing → deterministic shard export.
Every step is a lazy DataFrame transform; the only driver-side data are
the tiny per-partition offsets in pack_sequences and this demo's show().
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import traceframe_spark as tfs
from traceframe_spark import sinks
from traceframe_spark.operators import dedup, graph, text
from traceframe_spark.operators.profile import column_profile
from traceframe_spark.operators.sampling import weighted_domain_sample


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = tfs.get_spark(app_name="curation-demo", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 1. one-pass profile: what does the corpus look like?
    print("\n== column profile ==")
    column_profile(docs).filter(F.col("column").isin("doc_id", "text")).show(12, truncate=False)

    # 2. per-document signals, computed once, filtered on declaratively
    sig = docs.select(
        "doc_id",
        "text",
        "source",
        text.lang_id(F.col("text")).alias("lang"),
        text.quality_score(F.col("text")).alias("quality"),
        text.repetition_ratio(F.col("text")).alias("repetition"),
        text.token_count(F.col("text")).alias("n_tokens"),
    )
    gated = sig.filter(
        (F.col("quality") >= 0.5) & (F.col("repetition") <= 0.5) & (F.col("lang") != "und")
    )
    n1 = gated.count()
    print(f"quality/lang/repetition gate: {n0} -> {n1}")

    # 2b. the published rule sets (r12), one expression pass each. The
    # synthetic vocabulary contains only 'the' from the Gopher stop
    # list, so the published keep gate correctly rejects EVERYTHING
    # raw; planting two more stop words flips it — the gate reacts to
    # exactly the signal the paper says it should.
    gq = text.gopher_quality_flags(F.col("text"))
    n_gopher_raw = docs.select(gq["keep"].alias("k")).filter("k").count()
    planted = text.gopher_quality_flags(
        F.concat(F.col("text"), F.lit(" and that have"))
    )
    n_gopher = docs.select(planted["keep"].alias("k")).filter("k").count()
    # a doc that repeats its own text has ~full duplicate-line coverage
    selfdup = docs.select(
        "doc_id", F.concat_ws("\n", "text", "text").alias("text")
    )
    rep = text.gopher_repetition_profile(selfdup, "doc_id", "text").agg(
        F.avg("dup_line_char_frac").alias("a")
    ).first()["a"]
    c4 = text.c4_line_filter(F.concat(F.col("text"), F.lit(".")))
    n_c4_kept = docs.select(c4["n_kept"].alias("nk")).agg(
        F.sum("nk")
    ).first()[0]
    assert n_gopher_raw == 0 and n_gopher > 0 and rep >= 0.45 and n_c4_kept > 0
    print(
        f"published gates: gopher keep {n_gopher_raw}/{n0} raw (stop-word "
        f"poor by construction) -> {n_gopher}/{n0} with planted stop words; "
        f"self-duplicated docs show dup-line char coverage {rep:.2f}; "
        f"c4 keeps {n_c4_kept} terminal-punctuated lines"
    )

    # 3. PII scrub (counts first, then redact in place)
    pii = gated.select(F.sum(text.pii_counts(F.col("text"))["email"]).alias("emails")).first()
    scrubbed = gated.withColumn("text", text.redact_pii(F.col("text")))
    print(f"pii: {pii['emails']} emails redacted")

    # 4. dedup: exact content hash, then MinHash-LSH near-dup pairs →
    #    connected components → keep each cluster's canonical doc
    #    (transitive: a≈b≈c collapses to one survivor, not pairwise)
    exact = dedup.exact_dedup(scrubbed, ["text"], "doc_id")
    n2 = exact.count()
    near_pairs = dedup.minhash_dedup_pairs(exact, "doc_id", "text", threshold=0.9)
    comp = graph.connected_components(near_pairs, "id_a", "id_b")
    kept = graph.keep_canonical(exact, "doc_id", comp)
    n3 = kept.count()
    n_clusters = comp.select("component").distinct().count()
    print(
        f"dedup: {n1} -> {n2} (exact) -> {n3} "
        f"(near-dup: {n_clusters} clusters collapsed to canonicals)"
    )

    # 4b. exact substring dedup (duplicated-window, Lee et al.): cut
    #     repeated >=8-token passages, keeping one canonical copy.
    #     Runs AFTER doc-level dedup on purpose (cutting shared passages
    #     first would lower pair similarity and mask near-dups); on this
    #     synthetic corpus the cluster stage already removed every
    #     whole-doc near-dup, so typically 0 docs shrink here — the
    #     residual check that the survivors carry no repeated runs.
    cut = dedup.remove_duplicated_substrings(kept, "doc_id", "text")
    n_shrunk = cut.filter(
        F.length("text_dedup") < F.length(F.trim(F.regexp_replace("text", r"\s+", " ")))
    ).count()
    kept = cut.withColumn("text", F.col("text_dedup")).drop("text_dedup")
    print(f"substring dedup: repeated passages cut from {n_shrunk} docs, {n3} retained")

    # 5. benchmark decontamination: drop docs leaking eval-set n-grams
    bench = docs.filter(F.col("doc_id") % 97 == 0)  # stand-in eval set
    scores = text.contamination(kept, bench, n=3)
    clean = kept.join(
        scores.filter(F.col("overlap") <= 0.3).select("doc_id"), "doc_id"
    )
    n4 = clean.count()
    print(f"decontamination: {n3} -> {n4} (3-gram overlap <= 0.3 vs eval set)")

    # 6. domain mixture: resample each source at its mixture weight
    rates = {f"src{i}": [1.0, 0.7, 0.4][i % 3] for i in range(20)}
    mixed = weighted_domain_sample(clean, rates)
    n5 = mixed.count()
    print(f"domain mix: {n4} -> {n5} (per-source rates, deterministic)")

    # 6a. leakage-safe train/val/test split: the split is drawn from
    # document CONTENT, so duplicate text can never straddle splits
    from traceframe_spark.operators.sampling import leakage_safe_split

    split = leakage_safe_split(mixed, {"train": 0.9, "val": 0.05, "test": 0.05})
    sc = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(
        f"split: train {sc.get('train', 0)} / val {sc.get('val', 0)} / "
        f"test {sc.get('test', 0)} (content-keyed, leakage-safe)"
    )

    # 6b. learn the tokenizer ON the curated corpus (BPE): the word-
    # frequency table absorbs corpus size, each merge is one tiny job
    from traceframe_spark.operators import bpe

    merges, syms = bpe.learn_bpe(mixed, n_merges=12)
    base_syms = syms.select(F.sum(F.col("wcount") * F.size(bpe.symbol_array(bpe.initial_symbols(F.col("word"))))).alias("n")).first()["n"]
    bpe_syms = syms.select(F.sum(F.col("wcount") * F.size(bpe.symbol_array(F.col("s")))).alias("n")).first()["n"]
    syms.unpersist()
    print(
        f"tokenizer: {len(merges)} BPE merges learned; "
        f"{base_syms} char symbols -> {bpe_syms} tokens "
        f"({100 * (1 - bpe_syms / base_syms):.0f}% compression)"
    )

    # 7. pack into fixed-token training sequences
    packed = text.pack_sequences(mixed, budget=512)
    seqs = packed.agg(F.max("seq_id")).first()[0] + 1
    toks = packed.agg(F.sum("n_tokens")).first()[0]
    print(f"packing: {toks} tokens -> {seqs} sequences of 512")

    # 8. deterministic shard export for the dataloader
    out = tempfile.mkdtemp(prefix="curated_shards_")
    sinks.write_training_shards(
        mixed.join(packed.select("doc_id", "seq_id"), "doc_id"),
        out,
        n_shards=4,
        shuffle_key="doc_id",
        mode="overwrite",
    )
    back = spark.read.parquet(out)
    print(f"shards: {back.count()} rows across 4 files at {out}")

    # 8b. multimodal curation: synthesize real PNG/WAV/Y4M payloads for
    # a document slice, decode REAL features distributed (mapInPandas),
    # and drop undecodable media — the image/audio/video triage step
    from traceframe_spark.operators import multimodal

    docs50 = docs.filter("doc_id < 50")
    img = multimodal.decode_image_meta(multimodal.synthesize_png_media(docs50, "doc_id"))
    aud = multimodal.decode_audio_meta(multimodal.synthesize_wav_media(docs50, "doc_id"))
    vid = multimodal.decode_video_meta(multimodal.synthesize_y4m_media(docs50, "doc_id"))
    n_img = img.filter("width IS NOT NULL").count()
    n_aud = aud.filter("n_frames IS NOT NULL").count()
    vid_ok = vid.filter("n_frames IS NOT NULL")
    n_vid = vid_ok.count()
    motion = vid_ok.agg(F.sum("motion_sum")).first()[0]
    print(
        f"media triage: {n_img}/50 images, {n_aud}/50 audio, {n_vid}/50 video "
        f"decoded (total video motion {motion})"
    )

    # 9. embedding-side curation: flag within-label outliers (likely
    # mislabeled vectors), then compact for serving — int8 quantization
    # and sign-bit binarization (the Hamming-rankable 16-byte form)
    from traceframe_spark.operators import vectorprep

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    outliers = vectorprep.label_outlier_scores(
        emb, "vec_id", "embedding", "label", dim=64, bottom_k=1
    )
    n_out = outliers.count()
    qstats = vectorprep.quantization_stats(emb, "vec_id", "embedding")
    n_sat = qstats.agg(F.sum("n_sat")).first()[0]
    ham = vectorprep.hamming_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", k=3
    )
    print(
        f"embeddings: {emb.count()} vectors, {n_out} per-label outliers flagged, "
        f"{n_sat} saturated int8 codes, hamming top-3 for 3 probes -> {ham.count()} rows"
    )

    # 10. corpus instruments (r06): the dataset card, ingest-novelty
    # triage, HLL cardinality, weighted sampling, and embedding drift —
    # the monitoring surface a CONTINUOUS pipeline runs per snapshot
    from traceframe_spark.operators import sketch
    from traceframe_spark.operators.sampling import priority_sample
    from traceframe_spark.operators.text import ngram_novelty

    regs = sketch.hll_registers(docs, "text", p=10)
    hll = sketch.hll_estimate(regs, p=10).first()
    exact_texts = docs.select("text").distinct().count()
    ref = docs.filter(F.col("doc_id") % 10 < 3)
    nov = ngram_novelty(docs.filter(F.col("doc_id") % 10 >= 3), ref, n=3)
    n_stale = nov.filter(F.col("novelty") < 0.3).count()
    sample = priority_sample(docs, k=25, weight_col="n_chars")
    drift = vectorprep.embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "label", "embedding", dim=64,
    )
    min_cos = drift.agg(F.min("cos_q")).first()[0]
    print(
        f"instruments: HLL distinct texts ~{hll['est']:.0f} (exact {exact_texts}), "
        f"{n_stale} low-novelty docs vs the 30% reference snapshot, "
        f"priority sample of {sample.count()} by length, "
        f"per-label embedding drift min cos_q {min_cos} (10000 = stable)"
    )

    # 11. the day-N production loop (r08 index family, r09 loop): the
    # full order a 100 TB daily pipeline runs —
    #   day 0: dedup_pipeline survivors (NOT the raw corpus: indexing
    #           pre-dedup text stores near-dup clusters and candidate
    #           mass dominates every later probe — the measured caveat
    #           in SCALING.md r08) → write_dedup_index + write_gram_layer
    #   day N: probe the delta against the STORED layers (exact
    #           re-crawls die in the ckey layer, light edits in the LSH
    #           layer, clones of ANY prior day's accepts die because
    #           fold-back appended them) → gram-layer novelty triage →
    #           append survivors. Snapshot text is never re-read
    #           (SCALING.md r08: on-the-fly scales 13.1x with the
    #           snapshot, the probe 1.86x).
    from traceframe_spark.operators import dedup_index as di

    idx = tempfile.mkdtemp(prefix="curation_idx_") + "/idx"
    day0 = clean.select("doc_id", "text")  # the pipeline's survivors
    di.write_dedup_index(day0, idx)
    di.write_gram_layer(day0, idx, n=3)
    # the third stored layer of the daily loop: a frozen quality LM
    # (CCNet shape — trained ONCE on the curated day-0 corpus, deltas
    # scored against the persisted counts, day-0 text never re-read)
    lm = tempfile.mkdtemp(prefix="curation_lm_") + "/lm"
    text.write_bigram_lm(day0, lm)
    # longest docs as seeds: the "light edit" below appends a fixed
    # 17-char suffix, which only stays jaccard >= 0.9 of the original
    # when the original is long (on a 47-char doc the suffix IS a big
    # edit — correctly not a near-dup)
    seeds = day0.orderBy(F.length("text").desc(), "doc_id").limit(30)

    def fresh(day: int):
        # unique text per (day, seed): survives every layer, and its
        # hex-token grams make next day's clones die + score stale
        return seeds.select(
            (F.col("doc_id") + 100_000 * day + 40_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit(f"day {day} fresh dispatch exclusive:"),
                F.md5(F.concat(F.col("text"), F.lit(f"salt{day}a"))),
                F.md5(F.concat(F.col("text"), F.lit(f"salt{day}b"))),
                F.md5(F.concat(F.col("text"), F.lit(f"salt{day}c"))),
            ).alias("text"),
        )

    for day in (1, 2, 3):
        delta = (
            # exact re-crawls of the indexed snapshot -> ckey layer kills
            seeds.select((F.col("doc_id") + 100_000 * day + 10_000).alias("doc_id"), "text")
            .unionByName(
                # light edits of snapshot docs -> LSH layer kills
                seeds.select(
                    (F.col("doc_id") + 100_000 * day + 20_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" re-crawl edition")).alias("text"),
                )
            )
            .unionByName(fresh(day))
        )
        if day > 1:
            # clones of YESTERDAY'S accepted docs: only the fold-back
            # appends can kill these — the incremental proof
            delta = delta.unionByName(
                fresh(day - 1).select(
                    (F.col("doc_id") + 5_000).alias("doc_id"), "text"
                )
            )
        n_delta = delta.count()
        # perplexity triage against the STORED LM: re-crawls are
        # in-distribution, the fresh hex dispatches are OOD gibberish
        # (unseen bigrams take the add-one floor) — the signal a
        # quality gate thresholds on. NOTE the gap is small on THIS
        # corpus: synthetic word salad pairs common prefixes with
        # near-unique successors, so even in-distribution bigrams score
        # ~ln(2/(c1+V)), barely above the unseen floor ln(1/V); real
        # prose separates by whole nats (the smoothing floors
        # themselves are pinned exactly in tests/test_pipeline_ops.py)
        lp = text.score_against_lm(delta, lm)
        lp_recrawl = (
            lp.filter(
                (F.col("id") >= 100_000 * day + 10_000)
                & (F.col("id") < 100_000 * day + 20_000)
            )
            .agg(F.avg("avg_logprob")).first()[0]
        )
        lp_fresh = (
            lp.filter(F.col("id") >= 100_000 * day + 40_000)
            .agg(F.avg("avg_logprob")).first()[0]
        )
        assert lp_recrawl > lp_fresh, (lp_recrawl, lp_fresh)
        surv = di.dedup_against_index(delta, idx, threshold=0.9)
        n_surv = surv.count()
        assert n_surv == 30, f"day {day}: expected the 30 fresh docs, got {n_surv}"
        nov = di.novelty_against_index(surv, idx)
        n_novel = nov.filter(F.col("novelty") > 0.7).count()
        assert n_novel == 30, f"day {day}: all fresh docs must triage novel, got {n_novel}"
        di.append_dedup_index(surv, idx)
        di.append_gram_layer(surv, idx)
        absorbed = di.dedup_against_index(delta, idx, threshold=0.9).count()
        assert absorbed == 0, f"day {day}: fold-back must absorb the whole delta"
        print(
            f"day {day}: {n_delta}-doc delta -> {n_surv} survive "
            f"(re-crawls die in the stored exact layer, edits in the LSH "
            f"layer{', yesterday-clones in the fold-back appends' if day > 1 else ''}), "
            f"{n_novel} high-novelty by the gram layer; stored-LM triage "
            f"logprob re-crawls {lp_recrawl:.2f} vs fresh {lp_fresh:.2f}; "
            f"re-probe after fold-back = {absorbed}"
        )
    # 12. the r11 trained-filter + vector-stream additions:
    #   (a) hashed n-gram NB classifier (fastText/CCNet/GPT-3 shape) —
    #       train = ONE groupBy, model <= buckets x classes rows, score
    #       = broadcast join. The driver corpus's labels are
    #       deliberately uncorrelated with its synthetic text
    #       (SCALING.md r11 measures it), so the demo teaches on a
    #       separable two-vocabulary set and must get every held-out
    #       doc right.
    #   (b) streaming embedding ingest into a MANIFEST-committed IVF
    #       index: exact re-sends die against the standing index, the
    #       fold commits inverted-list pointers + replay watermark in
    #       ONE manifest publish.
    from traceframe_spark.operators import classifier as clf
    from traceframe_spark.operators import similarity as sim
    from traceframe_spark.streaming import manifest_store as MS
    from traceframe_spark.streaming.embeddings import (
        read_indexed_vectors,
        stream_embed_ingest,
    )

    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["zeta", "eta", "theta", "iota", "kappa"]
    teach = spark.createDataFrame(
        [
            (
                i,
                "A" if i % 2 == 0 else "B",
                " ".join((a_words if i % 2 == 0 else b_words)[(i + j) % 5]
                         for j in range(5 + i % 7)),
            )
            for i in range(100)
        ],
        ["doc_id", "label", "text"],
    )
    nb_store = tempfile.mkdtemp(prefix="curation_nb_") + "/nb"
    clf.write_nb_classifier(
        teach.filter("doc_id < 80"), nb_store, "label",
        n_buckets=4096, protocol="manifest",
    )
    pred = clf.score_against_nb(teach.filter("doc_id >= 80"), nb_store)
    hits = pred.join(
        teach.select(F.col("doc_id").alias("id"), "label"), "id"
    ).filter(F.col("pred_label") == F.col("label")).count()
    assert hits == 20, f"separable held-out set must classify 20/20, got {hits}"
    print(
        f"classifier: NB trained on 80 labeled docs (manifest-committed store), "
        f"held-out 20/20 correct, min margin "
        f"{pred.agg(F.min('margin')).first()[0]:.1f} nats"
    )

    ivf = tempfile.mkdtemp(prefix="curation_ivf_") + "/ivf"
    sim.write_ivf_index(
        emb, ivf, "vec_id", "embedding", n_centroids=16, protocol="manifest"
    )
    n0 = read_indexed_vectors(spark, ivf).count()
    feed = tempfile.mkdtemp(prefix="curation_ivf_feed_")
    rows = emb.limit(150).collect()
    import json as _json

    with open(f"{feed}/b0.jsonl", "w") as f:
        for r in rows[:100]:  # 100 fresh (value-shifted)
            f.write(_json.dumps({
                "vec_id": int(r["vec_id"]) + 5_000_000,
                "embedding": [x + 0.91 for x in r["embedding"]],
            }) + "\n")
        for r in rows[100:150]:  # 50 exact re-sends of indexed vectors
            f.write(_json.dumps({
                "vec_id": int(r["vec_id"]) + 9_000_000,
                "embedding": list(r["embedding"]),
            }) + "\n")
    q = stream_embed_ingest(
        spark.readStream.schema("vec_id long, embedding array<float>").json(feed),
        ivf, feed + "_ckpt", near_threshold=0.9999, nprobe=4,
        trigger_available_now=True,
    )
    q.awaitTermination()
    n1 = read_indexed_vectors(spark, ivf).count()
    wm = MS.manifest_last_batch(spark, ivf, feed + "_ckpt")
    assert n1 == n0 + 100, f"50 exact re-sends must die: {n0} -> {n1}"
    print(
        f"embed stream: {n0}-vector manifest IVF index, one micro-batch of "
        f"150 (100 fresh + 50 exact re-sends) -> {n1 - n0} landed, re-sends "
        f"died against the standing lists, replay watermark batch={wm} "
        f"committed atomically with the fold"
    )

    # 11. the r12 compressed tier + SemDeDup keep, end to end on the
    # same vectors: PQ codes + ADC through a persisted manifest IVF-PQ
    # index with the exact re-rank head (a non-truncating shortlist
    # must recover cosine_topk exactly — the refinement guarantee),
    # and the SemDeDup election reducing the corpus to kept rows.
    from traceframe_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nv = emb.count()
    cb = sim.pq_sample_codebooks(emb, "vec_id", "embedding")
    ivfpq = tempfile.mkdtemp(prefix="demo_ivfpq_") + "/idx"
    sim.write_ivf_index(
        emb, ivfpq, "vec_id", "embedding", n_centroids=8,
        protocol="manifest", pq_samples=cb,
    )
    probes = emb.filter(F.col("vec_id") < 3)
    reranked = sorted(
        (r["qid"], r["cid"], r["rn"]) for r in sim.ivf_adc_topk_over_index(
            spark, ivfpq, probes, "vec_id", "embedding",
            k=nv, nprobe=8, rerank_k=3,
        ).collect()
    )
    exact = sorted(
        (r["qid"], r["cid"], r["rn"]) for r in
        sim.cosine_topk(emb, probes, "vec_id", "embedding", k=3).collect()
    )
    assert reranked == exact, "full-shortlist ADC re-rank must equal exact"
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    n_kept = sim.semdedup_keep(
        emb, cents, "vec_id", "embedding", min_cos_q=3000
    ).count()
    assert 0 < n_kept <= nv
    print(
        f"compressed tier: {nv} vectors -> 8-byte PQ codes in a manifest "
        f"IVF-PQ index; ADC shortlist + exact re-rank reproduces "
        f"cosine_topk for 3 probes; semdedup keep (cos>=0.30) retains "
        f"{n_kept}/{nv}"
    )

    # 12. the r13 wave: TRAINED per-subspace k-means codebooks (the
    # production default — measurably tighter quantization than the
    # sampled twin), ADC recall as an instrument, id-level
    # exactly-once for a replayed feed with the near stage OFF, and
    # the SemDeDup keep decision against the PERSISTED quantizer.
    trained = sim.pq_train_codebooks(emb, "vec_id", "embedding")
    import numpy as _np

    samp_rows = emb.limit(256).collect()
    x = _np.array([r["embedding"] for r in samp_rows], dtype=_np.float64)

    def _mse(book):
        b = _np.array(book, dtype=_np.float64)
        d = x.shape[1] // 8
        tot = 0.0
        for s in range(8):
            sub, sc = x[:, s * d:(s + 1) * d], b[:, s * d:(s + 1) * d]
            tot += ((sub[:, None, :] - sc[None, :, :]) ** 2).sum(2).min(1).sum()
        return tot / len(x)

    m_s, m_t = _mse(cb), _mse(trained)
    assert m_t <= m_s, "trained books must not quantize worse"
    agree = sim.ann_adc_agreement(
        emb, emb.filter(F.col("vec_id") < 20), "vec_id", "embedding", trained
    ).agg(F.avg("agree")).first()[0]
    idg = tempfile.mkdtemp(prefix="demo_idg_") + "/idx"
    sim.write_ivf_index(
        emb, idg, "vec_id", "embedding", n_centroids=8, protocol="manifest"
    )
    n0 = read_indexed_vectors(spark, idg).count()
    feed2 = tempfile.mkdtemp(prefix="demo_idg_feed_")
    with open(f"{feed2}/b0.jsonl", "w") as f:
        for r in samp_rows[:30]:  # exact id re-sends, near stage OFF
            f.write(_json.dumps({
                "vec_id": int(r["vec_id"]),
                "embedding": list(r["embedding"]),
            }) + "\n")
        f.write(_json.dumps({
            "vec_id": 7_700_000,
            "embedding": [x_ + 1.37 for x_ in samp_rows[0]["embedding"]],
        }) + "\n")
    q = stream_embed_ingest(
        spark.readStream.schema("vec_id long, embedding array<float>").json(feed2),
        idg, feed2 + "_ckpt", trigger_available_now=True,  # no near stage
    )
    q.awaitTermination()
    n1 = read_indexed_vectors(spark, idg).count()
    assert n1 == n0 + 1, f"id guard must drop 30 id re-sends: {n0} -> {n1}"
    kept_idx = sim.semdedup_keep_over_index(
        spark, ivfpq, emb, "vec_id", "embedding", min_cos_q=3000
    ).count()
    assert 0 < kept_idx <= nv
    print(
        f"r13: trained codebooks cut quantization MSE {m_s:.2f} -> {m_t:.2f}; "
        f"ADC recall@1 instrument = {agree:.2f} on 20 probes; id-guard "
        f"stream (near stage OFF) dropped 30/31 id re-sends via the "
        f"ids_bloom sidecar; semdedup-over-the-persisted-quantizer keeps "
        f"{kept_idx}/{nv}"
    )

    # 13. the r14 wave: the URL pass a crawl runs BEFORE any text is
    # read, perceptual image dedup through the shared banding engine,
    # the second tokenizer family (unigram-LM), and OPQ rotation on
    # the compressed ANN tier.
    from traceframe_spark.operators import multimodal as mm
    from traceframe_spark.operators import unigram as ug
    from traceframe_spark.operators import web
    from traceframe_spark.plans.pipeline import _synth_url, _URL_BLOCKLIST

    urls = web.with_url_norm(
        docs.select("doc_id", "source", _synth_url().alias("url"))
    )
    n_urls = urls.filter(F.col("domain").isNotNull()).count()
    capped = web.domain_cap(web.domain_gate(urls, _URL_BLOCKLIST), cap=5)
    n_cap = capped.count()
    assert 0 < n_cap < n_urls

    media = mm.synthesize_png_media(docs.filter(F.col("doc_id") < 60), "doc_id")
    n_fp = mm.image_dhash(media).count()
    n_imgpairs = mm.image_near_dup_pairs(media, max_hamming=8).count()
    assert n_fp == 60 and n_imgpairs > 0

    vocab = ug.learn_unigram(docs, seed_size=16, n_rounds=2)
    uni_store = tempfile.mkdtemp(prefix="demo_uni_") + "/uni"
    ug.write_unigram_model(spark, vocab, uni_store, protocol="manifest")
    enc = ug.encode_against_unigram(docs.limit(100), uni_store)
    mean_toks = enc.agg(F.avg("n_tokens")).first()[0]
    mean_words = docs.limit(100).select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    ).agg(F.avg("n")).first()[0]
    assert mean_toks >= mean_words  # subword pieces >= whitespace words

    opq_idx = tempfile.mkdtemp(prefix="demo_opq_") + "/opq"
    sim.write_ivf_index(
        emb, opq_idx, "vec_id", "embedding", n_centroids=8,
        protocol="manifest", pq_samples=16, opq_rotate=True,
    )
    probes = emb.filter(F.col("vec_id") < 3)
    opq_top = sim.ivf_adc_topk_over_index(
        spark, opq_idx, probes, "vec_id", "embedding",
        k=nv, nprobe=8, rerank_k=3,
    ).collect()
    want_top = sim.cosine_topk(emb, probes, "vec_id", "embedding", k=3).collect()
    assert sorted((r["qid"], r["cid"], r["rn"]) for r in opq_top) == sorted(
        (r["qid"], r["cid"], r["rn"]) for r in want_top
    ), "OPQ re-rank head must equal exact cosine"
    print(
        f"r14: URL pass (normalize -> blocklist -> cap 5/domain) keeps "
        f"{n_cap}/{n_urls} attributable rows without reading text; "
        f"image dHash fingerprints 60/60 PNGs, {n_imgpairs} perceptual "
        f"near-dup pairs through the shared banding engine; stored "
        f"unigram tokenizer ({len(vocab)} pieces) averages "
        f"{mean_toks:.1f} tokens/doc vs {mean_words:.1f} words; "
        f"OPQ-rotated IVF-PQ re-rank reproduces exact cosine top-3 "
        f"for 3 probes"
    )
    spark.stop()


if __name__ == "__main__":
    main()
