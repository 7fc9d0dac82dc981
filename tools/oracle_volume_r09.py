"""Round-9 volume oracle sweep: the r09 portable operators value-checked
at the 100x copy, same comparison semantics as tools/check_oracle.py
and the r08 sweep.

- ``simhash_portable_pairs_vol``: the registry bound (doc_id < 250,
  copy 0 only at the scale dir) swaps to ``doc_id % 1e9 < 30`` — every
  copy of the first 30 base docs: 3 000 docs in ~100-deep near-copy
  clusters, so the md5 vote bits, sign fingerprints, pigeonhole block
  join, and exact hamming verify all run against real clone mass in
  BOTH engines.
- ``ann_lsh_portable_vol``: the registry entry VERBATIM against the
  scale dir — its corpus side is the unbounded embeddings table, which
  is 200 000 vectors there (100x), so the integer sign-dot signatures,
  band bucket join, and quantized-cosine re-rank are exercised at
  volume with no bound surgery at all.
- ``ann_lsh_multiprobe_vol``: the registry entry VERBATIM — the
  1-bit probe expansion (multi-probe LSH) joined against all 200 000
  corpus signatures, answer value-matched including the recall gain.
- ``bitext_mine_vol``: the registry bounds swap to ``vec_id % 1e9``
  over the first 8 src / 8 tgt base ids — 800 x 800 vectors across
  every copy (near-parallel scaled clones: the worst hubness case, a
  dense block of cosine ~1.0 neighbors), so the margin normalization,
  quantized means, and argmax tie-breaks are value-checked exactly
  where raw cosine ranking would be most degenerate.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/oracle_volume_r09.py \
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

    from traceframe_spark.operators import dedup
    from traceframe_spark.plans import catalog_oracle_sql, catalog_queries
    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans.catalog import load_table

    def swap(sql: str, old: str, new: str) -> str:
        assert old in sql, f"bound {old!r} not found in oracle SQL"
        return sql.replace(old, new)

    def q_simhash_portable_pairs_vol(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % MOD) < 30
        )
        return dedup.simhash_near_dup_pairs(
            d, "doc_id", "text", max_hamming=14, portable=True
        ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))

    def q_lm_store_score_vol(spark, sf_dir):
        from traceframe_spark.operators import text as T
        from traceframe_spark.plans.catalog import qint, tmp_store

        d = load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % MOD) < 300
        )
        path = tmp_store("bigram_lm_vol_") + "/lm"
        T.write_bigram_lm(d, path)
        out = T.score_against_lm(d, path)
        return out.select(
            F.col("id").alias("doc_id"),
            qint(F.col("avg_logprob"), 4).alias("logprob_q"),
        )

    def q_bitext_mine_vol(spark, sf_dir):
        from traceframe_spark.operators import similarity

        e = load_table(spark, sf_dir, "embeddings")
        base = F.col("vec_id") % MOD
        src = e.filter(base < 8)
        tgt = e.filter((base >= 100) & (base < 108))
        return similarity.bitext_mine_best(src, tgt, "vec_id", "embedding", k=4)

    reg_q, reg_sql = catalog_queries(), catalog_oracle_sql()
    qs = {
        "simhash_portable_pairs_vol": q_simhash_portable_pairs_vol,
        "ann_lsh_portable_vol": reg_q["ann_lsh_portable"],
        "ann_lsh_multiprobe_vol": reg_q["ann_lsh_multiprobe"],
        "bitext_mine_vol": q_bitext_mine_vol,
        "lm_store_score_vol": q_lm_store_score_vol,
    }
    sql = {
        "simhash_portable_pairs_vol": swap(
            P.SQL_SIMHASH_PORTABLE_PAIRS, "doc_id < 250", f"doc_id % {MOD} < 30"
        ),
        "ann_lsh_portable_vol": reg_sql["ann_lsh_portable"],
        "ann_lsh_multiprobe_vol": reg_sql["ann_lsh_multiprobe"],
        "lm_store_score_vol": swap(
            P.SQL_DOC_BIGRAM_LOGPROB, "doc_id < 300", f"doc_id % {MOD} < 300"
        ),
        "bitext_mine_vol": swap(
            swap(P.SQL_BITEXT_MINE, "s.vec_id < 25", f"s.vec_id % {MOD} < 8"),
            "t.vec_id >= 100 AND t.vec_id < 125",
            f"t.vec_id % {MOD} >= 100 AND t.vec_id % {MOD} < 108",
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
        app_name="oracle-volume-r09", master="local[16]", shuffle_partitions=64
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
    sys.exit(main())
