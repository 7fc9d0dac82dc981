"""Round-13 volume oracle sweep at the 100x copy
(/tmp/sparktrace_scale100; 500k documents / 200k vectors), same
comparison semantics as tools/check_oracle.py — closing the r12
record gap (bpe_store_encode and ann_ivfpq_rerank missed the r12
sweep) and covering the r13 newcomers:

- ``bpe_store_encode_vol``: registry VERBATIM — train the 10 merges
  over all 500k docs, commit the merge list as a manifest artifact,
  encode every doc AGAINST THE STORE; per-doc token counts matched
  against DuckDB's replay of the identical merge chain. The store
  roundtrip must preserve the merge list exactly or counts drift.
- ``ann_ivfpq_rerank_vol``: registry VERBATIM — the two-tier probe
  (ADC shortlist from the persisted manifest IVF-PQ index, exact
  quantized-cosine re-rank of the shortlist) with BOTH tiers replayed
  by the oracle at 200k vectors.
- ``ann_adc_agree_vol``: the r13 recall instrument, registry VERBATIM
  — exact-vs-ADC top-1 argmaxes off ONE scored-pair table for 25
  queries against all 200k candidates.
- ``snapshot_diff_vol``: re-pinned after the r13 NULL-content fix
  (presence flags + null-safe hash compare in BOTH engines); same
  %MOD id-bound widening as the r12 sweep so every scale copy
  contributes rows, including the fixture's NULL texts.

The trained-codebook path (``pq_train_codebooks``) is deliberately
absent: it is the rows-only production default whose behavior is
pinned by unit parity tests and priced by tools/bench_pq_recall_r13.py
— the SQL-replayable sampled twin above is the oracle surface.

Usage: python tools/oracle_volume_r13.py \
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

    def q_snapshot_diff_vol(spark, sf_dir):
        from traceframe_spark.operators.profile import snapshot_diff

        d = load_table(spark, sf_dir, "documents")
        old = d.filter(F.col("doc_id") % MOD < 400)
        new = d.filter(
            (F.col("doc_id") % MOD >= 100) & (F.col("doc_id") % MOD < 500)
        ).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")).alias("text"),
        )
        out = snapshot_diff(old, new, "doc_id", "text")
        return out.select(F.col("id").alias("doc_id"), "status")

    def q_semdedup_index_keep_vol(spark, sf_dir):
        """semdedup_keep_over_index under clone MASS (20 base ids x
        ~100 near-copies — the r12 semdedup_keep_vol geometry, since
        occupancy-squared pair cost is the operator's own contract),
        with the quantizer resolved from a freshly built manifest IVF
        store instead of a DataFrame argument."""
        from traceframe_spark.operators import similarity
        from traceframe_spark.plans.catalog import tmp_store

        e = load_table(spark, sf_dir, "embeddings").filter(
            (F.col("vec_id") % MOD) < 20
        )
        cents = [
            [float(x) for x in r["embedding"]]
            for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        path = tmp_store("semdedup_idx_vol_") + "/ivf"
        similarity.write_ivf_index(
            e, path, "vec_id", "embedding", centroids=cents, protocol="manifest"
        )
        kept = similarity.semdedup_keep_over_index(
            spark, path, e, "vec_id", "embedding", min_cos_q=3000
        )
        return kept.select(
            "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
        )

    def q_perplexity_buckets_vol(spark, sf_dir):
        from traceframe_spark.operators import text as T
        from traceframe_spark.plans.catalog import tmp_store

        d = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % MOD < 300
        )
        path = tmp_store("ppl_lm_vol_") + "/lm"
        T.write_bigram_lm(d, path)
        return T.perplexity_buckets(d, path, lang_col="lang")

    from traceframe_spark.plans import mlprep as M

    qs = {
        # registry VERBATIM — the r12 record gap, closed
        "bpe_store_encode_vol": P.q_bpe_store_encode,
        "ann_ivfpq_rerank_vol": P.q_ann_ivfpq_rerank,
        # registry VERBATIM — the r13 recall instrument
        "ann_adc_agree_vol": P.q_ann_adc_agree,
        # %MOD-widened ids; NULL-content rows now classify by presence
        "snapshot_diff_vol": q_snapshot_diff_vol,
        # registry VERBATIM — membership guard chain over 200k vectors
        "ivf_id_membership_vol": P.q_ivf_id_membership,
        # registry VERBATIM — cluster-balanced cap over 200k vectors
        "cluster_cap_vol": M.q_cluster_cap,
        # %MOD-widened ids (the registry's doc_id<300 would hit copy 0
        # only): 30k docs train the LM and land in per-lang terciles
        "perplexity_buckets_vol": q_perplexity_buckets_vol,
        # clone-cluster bound (the r12 semdedup_keep_vol geometry)
        "semdedup_index_keep_vol": q_semdedup_index_keep_vol,
    }
    # Same planner surgery as the r12 sweep: pre-filter the `ad`
    # assignment relation to the query vectors before the 8 per-
    # subspace lookup joins (algebraically identical — only query rows
    # can survive the l{s}.vec_id = ... join keys — but DuckDB
    # otherwise materializes the 25.6M-row relation per join).
    agree = P.SQL_ANN_ADC_AGREE.replace(
        "cw AS (",
        "lutq AS (\n    SELECT vec_id, s, c, d2 FROM ad WHERE vec_id < 25\n),\ncw AS (",
        1,
    ).replace("JOIN ad l", "JOIN lutq l")
    assert "lutq" in agree and "JOIN ad " not in agree
    sql = {
        "bpe_store_encode_vol": P.PIPELINE_ORACLE_SQL["bpe_store_encode"],
        "ann_ivfpq_rerank_vol": P.SQL_ANN_IVFPQ_RERANK,
        "ann_adc_agree_vol": agree,
        "snapshot_diff_vol": P.SQL_SNAPSHOT_DIFF.replace(
            "WHERE doc_id < 400", f"WHERE doc_id % {MOD} < 400"
        ).replace(
            "WHERE doc_id >= 100 AND doc_id < 500",
            f"WHERE doc_id % {MOD} >= 100 AND doc_id % {MOD} < 500",
        ),
        "ivf_id_membership_vol": P.SQL_IVF_ID_MEMBERSHIP,
        "cluster_cap_vol": M.SQL_CLUSTER_CAP,
        "perplexity_buckets_vol": P.SQL_PERPLEXITY_BUCKETS.replace(
            "WHERE doc_id < 300", f"WHERE doc_id % {MOD} < 300"
        ),
        "semdedup_index_keep_vol": M.SQL_SEMDEDUP_KEEP.replace(
            "FROM embeddings e CROSS JOIN cent c",
            f"FROM (SELECT * FROM embeddings WHERE vec_id % {MOD} < 20) e "
            "CROSS JOIN cent c",
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
        app_name="oracle-volume-r13", master="local[16]", shuffle_partitions=64
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
                f"{name:28s} {len(sdf)} vs {len(odf)} rows "
                f"({time.time() - t0:.1f}s)  {status}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — sweep must report all rows
            failures.append(name)
            print(f"{name:28s} ERROR ({time.time() - t0:.1f}s): {e}", flush=True)
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all volume rows match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
