"""Round-12 volume oracle sweep: the r12 operators value-checked at the
100x copy (/tmp/sparktrace_scale100), same comparison semantics as
tools/check_oracle.py and the r08-r11 sweeps.

Every row except ``semdedup_keep_vol`` runs the registry entry
VERBATIM — the operators carry no doc/vector bound, so the 100x rows
exercise exactly the plans the sf0.01 gate verifies, at 500k
documents / 200k vectors:

- ``gopher_repetition_vol``: duplicate-line and duplicated-n-gram char
  coverage over every planted document — the explode-heavy profile
  (lines + 2-grams + 5-grams per doc) replayed in DuckDB with the same
  window/unnest relational plan at ~100M gram rows.
- ``gopher_quality_vol``: the published Gopher composition gate
  (word counts, mean word length, symbol/alpha ratios, stop-word
  presence, keep verdict) value-matched on all 500k docs.
- ``c4_filter_vol``: C4 line cleaning with the poison plants
  (every 7th doc an injected 'javascript' line, every 11th a
  'lorem ipsum' page flag) — kept text and page verdict string-matched
  at volume.
- ``pq_codes_vol``: PQ encoding of all 200k vectors with the portable
  md5-bottom-16 sampled codebooks — per-vector 8-byte codes matched
  code-for-code (the compressed representation the 100 TB ADC scan
  stores instead of float vectors).
- ``pq_adc_topk_vol``: ADC top-5 for the 10 base queries against all
  200k candidate codes — the ranking (not just counts) replayed from
  DuckDB's own lookup-table joins, so the 8-lookups-plus-7-adds scoring
  is bit-matched at volume.
- ``ann_ivfpq_adc_vol``: the composed, PERSISTED manifest IVF-PQ index
  (codes + codebooks + centroids in one atomic commit) probed at
  nprobe = n_centroids; full probe makes candidate generation the whole
  corpus, so the result must EQUAL the exhaustive ADC oracle — the
  store roundtrip and the probe machinery pinned by value at 200k
  vectors.
- ``ann_ivfpq_residual_vol``: the residual IVFADC chain — codes
  quantize r = x − c(list), so the oracle replays the QUANTIZER too —
  registry-verbatim over all 200k vectors.
- ``semdedup_keep_vol``: the keep election under clone MASS (20 base
  ids x ~100 near-copies → 100-deep transitive components); bounded
  because occupancy² pair cost is the operator's own documented
  contract.
- ``knn_label_vol``: k-NN weak labeling, registry-verbatim — 10
  probes elect from exact top-5 over all 200k labeled candidates.

Usage: python tools/oracle_volume_r12.py \
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

    from traceframe_spark.plans import mlprep as M
    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans import quality as QR
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

    def q_semdedup_keep_vol(spark, sf_dir):
        """semdedup_keep over 20 base ids x ~100 near-copies (~2,000
        vectors in heavy clone clusters — the shape the election
        exists for: big transitive components per cluster), centroids
        the copy-0 vec_id<8 rows as in the registry entry."""
        from traceframe_spark.operators.similarity import semdedup_keep

        e = load_table(spark, sf_dir, "embeddings").filter(
            (F.col("vec_id") % MOD) < 20
        )
        centroids = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        kept = semdedup_keep(e, centroids, "vec_id", "embedding", min_cos_q=3000)
        return kept.select(
            "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
        )

    qs = {
        # registry VERBATIM: no bounds anywhere in the r12 set
        "gopher_repetition_vol": QR.q_gopher_repetition,
        "gopher_quality_vol": QR.q_gopher_quality,
        "c4_filter_vol": QR.q_c4_filter,
        "pq_codes_vol": P.q_pq_codes,
        "pq_adc_topk_vol": P.q_pq_adc_topk,
        "ann_ivfpq_adc_vol": P.q_ann_ivfpq_adc,
        # registry VERBATIM: the residual chain (assignment-dependent
        # codes) replayed over all 200k vectors
        "ann_ivfpq_residual_vol": P.q_ann_ivfpq_residual,
        # clone-cluster bound: occupancy² pair cost is the operator's
        # own documented contract, so the volume row stresses clone
        # MASS (100-deep components), not raw corpus width
        "semdedup_keep_vol": q_semdedup_keep_vol,
        # registry VERBATIM: 10 probes elect from exact top-5 over all
        # 200k labeled candidates
        "knn_label_vol": M.q_knn_label,
        # id-bound swapped from <400 to %MOD<400 (copy-0-only otherwise:
        # the scale copies shift ids by 1e9): an 80k-row diff where all
        # four statuses occur across every copy
        "snapshot_diff_vol": q_snapshot_diff_vol,
    }
    # The registry's ADC oracle joins the full `ad` assignment relation
    # (corpus x subspaces x codewords — 25.6M rows here) EIGHT times as
    # the per-subspace lookup tables; every join already filters to
    # l{s}.vec_id = q.vec_id, but at this volume DuckDB materializes
    # the unfiltered relation per join and spilled >70 GB of temp. Give
    # the planner the algebraically identical pre-filtered table — only
    # the 10 query vectors' rows (10 x 8 x 16 = 1,280) can ever
    # survive those joins — so the volume run prices the ADC scan, not
    # a planner blind spot. Values are untouched: same rows, same sums.
    adc = P.SQL_PQ_ADC_TOPK.replace(
        "cw AS (",
        "lutq AS (\n    SELECT vec_id, s, c, d2 FROM ad WHERE vec_id < 10\n),\ncw AS (",
        1,
    ).replace("JOIN ad l", "JOIN lutq l")
    assert "lutq" in adc and "JOIN ad " not in adc
    sql = {
        "gopher_repetition_vol": QR.SQL_GOPHER_REPETITION,
        "gopher_quality_vol": QR.SQL_GOPHER_QUALITY,
        "c4_filter_vol": QR.SQL_C4_FILTER,
        "pq_codes_vol": P.SQL_PQ_CODES,
        "pq_adc_topk_vol": adc,
        "ann_ivfpq_adc_vol": adc,
        # the residual oracle's reused CTEs are MATERIALIZED in the
        # registry SQL itself, so no lutq surgery is needed: qlut is
        # already query-bounded and evaluated once
        "ann_ivfpq_residual_vol": P.SQL_ANN_IVFPQ_RESIDUAL,
        "knn_label_vol": M.SQL_KNN_LABEL,
        "snapshot_diff_vol": P.SQL_SNAPSHOT_DIFF.replace(
            "WHERE doc_id < 400", f"WHERE doc_id % {MOD} < 400"
        ).replace(
            "WHERE doc_id >= 100 AND doc_id < 500",
            f"WHERE doc_id % {MOD} >= 100 AND doc_id % {MOD} < 500",
        ),
        "semdedup_keep_vol": M.SQL_SEMDEDUP_KEEP.replace(
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
        app_name="oracle-volume-r12", master="local[16]", shuffle_partitions=64
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
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} FAIL spark error: {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        try:
            ddf = con.sql(sql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} FAIL oracle error: {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            bad = [
                f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                for c in sorted(sdf.columns)
                if str(sdf[c].dtype) != str(ddf[c].dtype)
            ]
            if bad:
                problems.append("dtype mismatch " + "; ".join(bad))
        if not problems and _canon(sdf) != _canon(ddf):
            sc, dc = _canon(sdf), _canon(ddf)
            diff = next((i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), None)
            problems.append(
                f"values differ (first diff at sorted row {diff}: "
                f"spark={sc[diff] if diff is not None else None} "
                f"duck={dc[diff] if diff is not None else None})"
            )
        dt = time.time() - t0
        if problems:
            print(f"{name:28s} {len(sdf)} rows ({dt:.1f}s)  FAIL " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"{name:28s} {len(sdf)} rows ({dt:.1f}s)  PASS")
    spark.stop()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("volume sweep: all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
