"""Round-14 volume oracle sweep at the 100x copy
(/tmp/sparktrace_scale100; 500k documents / 200k vectors), same
comparison semantics as tools/check_oracle.py and the r08-r13 sweeps.
Covers every r14 newcomer with an oracle:

- ``url_normalize_vol`` / ``domain_gate_vol`` / ``domain_cap_vol`` /
  ``web_curation_flow_vol``: registry VERBATIM — the URL synthesis is
  closed-form over doc_id/source, so all 500k rows (every scale copy)
  run the full regex/string normalization, the blocklist anti-join,
  and the per-domain capped window in BOTH engines with zero bound
  surgery. The cap's value at volume: ~500k rows collapse to 5 per
  domain, the head-domain skew the window is built to absorb.
- ``image_dhash_vol`` / ``image_near_dup_vol``: the registry bound
  (doc_id < 200 → copy 0 only at the scale dir) swaps to
  ``doc_id % 1e9 < 20`` — 2,000 synthesized PNGs across every copy
  (each copy's ids shift the closed-form pixels, so these are 2,000
  DISTINCT images), decoded through the real codec, block-mean
  dHashed, and banded; pair mass at hamming ≤ 8 is ~100x the sf0.01
  row's.
- ``unigram_vocab_vol``: registry VERBATIM — trains on all 500k
  documents (the word-frequency table, not the corpus, is the working
  set: ~232 distinct words regardless of volume — the scale claim),
  both hard-EM rounds replayed by DuckDB's chained-CTE Viterbi.
- ``unigram_encode_lens_vol``: training VERBATIM at volume, the
  encode slice widened to ``doc_id % 1e9 < 50`` (5,000 docs across
  every copy) — per-doc token counts value-matched.
- ``perplexity_buckets_sampled_vol`` / ``ppl_bucket_agree_vol``: the
  registry bound widens to ``doc_id % 1e9 < 300`` — 30,000 docs, and
  the dominant language (en, 11,600 docs) EXCEEDS sample_k = 4096, so
  the md5 bottom-k cutoff derivation genuinely subsamples at volume
  (at sf0.01 the sample is the full population); the whole sampled
  chain AND the exact-vs-sampled agreement replay in DuckDB.

``ann_opq_adc`` is deliberately absent: it is the rows-only rotated
tier whose behavior is pinned by parity tests
(tests/test_pq.py::test_opq_*) and priced by
tools/bench_opq_recall_r14.py — the SQL-replayable unrotated chain
(``ann_ivfpq_adc``, r12 sweep) is the oracle surface.

Usage: python tools/oracle_volume_r14.py \
    [--sf /tmp/sparktrace_scale100] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from traceframe_spark.plans.catalog import TABLES  # noqa: E402

MOD = 1_000_000_000


def build_queries():
    from pyspark.sql import functions as F

    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans.catalog import load_table

    def q_image_dhash_vol(spark, sf_dir):
        from traceframe_spark.operators import multimodal

        d = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % MOD < 20
        )
        media = multimodal.synthesize_png_media(d, "doc_id")
        return multimodal.image_dhash(media)

    def q_image_near_dup_vol(spark, sf_dir):
        from traceframe_spark.operators import multimodal

        d = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % MOD < 20
        )
        media = multimodal.synthesize_png_media(d, "doc_id")
        return multimodal.image_near_dup_pairs(media, max_hamming=8).select(
            "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
        )

    def q_unigram_encode_lens_vol(spark, sf_dir):
        from traceframe_spark.operators import unigram

        d = load_table(spark, sf_dir, "documents")
        vocab = unigram.learn_unigram(
            d, seed_size=P._UNI_SEED, max_piece_len=P._UNI_PLEN,
            n_rounds=P._UNI_ROUNDS,
        )
        enc = unigram.encode_unigram(
            d.filter(F.col("doc_id") % MOD < 50), vocab,
            max_piece_len=P._UNI_PLEN,
        )
        return enc.select(F.col("id").alias("doc_id"), "n_tokens", "cost_q")

    def q_ppl_sampled_vol(spark, sf_dir):
        from traceframe_spark.operators import text as T
        from traceframe_spark.plans.catalog import tmp_store

        d = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % MOD < 300
        )
        path = tmp_store("ppl_s_vol_") + "/lm"
        T.write_bigram_lm(d, path)
        return T.perplexity_buckets(d, path, lang_col="lang", method="sampled")

    def q_ppl_agree_vol(spark, sf_dir):
        from traceframe_spark.operators import text as T
        from traceframe_spark.plans.catalog import tmp_store

        d = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % MOD < 300
        )
        path = tmp_store("ppl_ag_vol_") + "/lm"
        T.write_bigram_lm(d, path)
        return T.perplexity_bucket_agreement(d, path, lang_col="lang")

    qs = {
        "url_normalize_vol": P.q_url_normalize,
        "domain_gate_vol": P.q_domain_gate,
        "domain_cap_vol": P.q_domain_cap,
        "web_curation_flow_vol": P.q_web_curation_flow,
        "image_dhash_vol": q_image_dhash_vol,
        "image_near_dup_vol": q_image_near_dup_vol,
        "unigram_vocab_vol": P.q_unigram_vocab,
        "unigram_encode_lens_vol": q_unigram_encode_lens_vol,
        "perplexity_buckets_sampled_vol": q_ppl_sampled_vol,
        "ppl_bucket_agree_vol": q_ppl_agree_vol,
    }

    def swap(sql: str, old: str, new: str) -> str:
        assert old in sql, f"bound {old!r} not found in oracle SQL"
        return sql.replace(old, new)

    sql = {
        "url_normalize_vol": P.SQL_URL_NORMALIZE,
        "domain_gate_vol": P.SQL_DOMAIN_GATE,
        "domain_cap_vol": P.SQL_DOMAIN_CAP,
        "web_curation_flow_vol": P.SQL_WEB_CURATION_FLOW,
        "image_dhash_vol": swap(
            P.SQL_IMAGE_DHASH, "WHERE doc_id < 200",
            f"WHERE doc_id % {MOD} < 20",
        ),
        "image_near_dup_vol": swap(
            P.SQL_IMAGE_NEAR_DUP, "WHERE doc_id < 200",
            f"WHERE doc_id % {MOD} < 20",
        ),
        "unigram_vocab_vol": P.SQL_UNIGRAM_VOCAB,
        "unigram_encode_lens_vol": swap(
            P.SQL_UNIGRAM_ENCODE_LENS, "WHERE doc_id < 200",
            f"WHERE doc_id % {MOD} < 50",
        ),
        "perplexity_buckets_sampled_vol": swap(
            P.SQL_PERPLEXITY_BUCKETS_SAMPLED, "WHERE doc_id < 300",
            f"WHERE doc_id % {MOD} < 300",
        ),
        "ppl_bucket_agree_vol": swap(
            P.SQL_PPL_BUCKET_AGREE, "WHERE doc_id < 300",
            f"WHERE doc_id % {MOD} < 300",
        ),
    }
    return qs, sql


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparktrace_scale100")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from tools.check_oracle import _canon  # same comparison semantics

    from traceframe_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-volume-r14", master="local[16]", shuffle_partitions=64
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, sql = build_queries()
    names = args.queries or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            odf = con.sql(sql[name]).df()
            ok = (
                sorted(sdf.columns) == sorted(odf.columns)
                and _canon(sdf) == _canon(odf)
            )
            status = "PASS" if ok else "FAIL"
            if not ok:
                failures.append(name)
            print(
                f"{name:34s} {len(sdf):>8} rows ({time.time() - t0:.1f}s)  {status}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:34s} ERROR ({time.time() - t0:.1f}s): {exc}", flush=True)
    print()
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all volume queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
