"""Round-10 volume oracle sweep: the r10 operators value-checked at the
100x copy, same comparison semantics as tools/check_oracle.py and the
r08/r09 sweeps.

- ``bitext_mine_ann_vol``: the ANN-tier bitext composition
  (portable multi-probe hyperplane LSH per direction + the margin
  algebra) with the registry bounds swapped to ``vec_id % 1e9`` over
  the first 8 src / 8 tgt base ids — 800 x 800 vectors across every
  copy. This is the WORST case twice over: a dense near-parallel hub
  block (cosine ~1.0 everywhere, margins degenerate without the kNN
  normalization) AND a clone-heavy LSH load (every copy of a base
  vector signs identically, so the band buckets carry ~100-deep clone
  masses and the candidate join + re-rank run at real volume). The
  DuckDB oracle replays the whole approximate chain — md5 plane
  derivation, integer sign dots, band keys, 1-bit probe expansion per
  direction, quantized re-rank, margins — so the 100x answer is
  value-matched INCLUDING every recall effect.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/oracle_volume_r10.py \
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

    from traceframe_spark.operators import similarity
    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans.catalog import load_table

    def swap(sql: str, old: str, new: str) -> str:
        assert old in sql, f"bound {old!r} not found in oracle SQL"
        return sql.replace(old, new)

    def q_bitext_mine_ann_vol(spark, sf_dir):
        e = load_table(spark, sf_dir, "embeddings")
        base = F.col("vec_id") % MOD
        src = e.filter(base < 8)
        tgt = e.filter((base >= 100) & (base < 108))
        return similarity.bitext_mine_ann(
            src, tgt, "vec_id", "embedding", k=4, tier="lsh",
            n_planes=16, bands=4, portable=True, multiprobe=True,
        )

    def q_bitext_ann_agree_vol(spark, sf_dir):
        e = load_table(spark, sf_dir, "embeddings")
        base = F.col("vec_id") % MOD
        src = e.filter(base < 8)
        tgt = e.filter((base >= 100) & (base < 108))
        return similarity.bitext_ann_agreement(
            src, tgt, "vec_id", "embedding", k=4, tier="lsh",
            n_planes=16, bands=4, portable=True, multiprobe=True,
        )

    def q_bitext_mine_ann_ivf_vol(spark, sf_dir):
        """The persisted-IVF tier at 100x, full-probe: with nprobe ==
        n_centroids every inverted list is probed, so retrieval is
        complete and the mined pairs must equal the EXACT tier's — the
        exact-tier SQL therefore value-verifies the whole IVF
        composition plumbing (two index writes, two probe directions,
        partition-pruned candidate joins, shared margin algebra) at
        volume. The recall-lossy operating points are instrumented by
        bitext_ann_agreement (SCALING.md lever table), not this row."""
        import shutil

        from traceframe_spark.plans.catalog import tmp_store

        e = load_table(spark, sf_dir, "embeddings")
        base = F.col("vec_id") % MOD
        src = e.filter(base < 8)
        tgt = e.filter((base >= 100) & (base < 108))
        root = tmp_store("bitext_ivf_vol_")
        si, ti = f"{root}/src", f"{root}/tgt"
        similarity.write_ivf_index(src, si, "vec_id", "embedding", n_centroids=4)
        similarity.write_ivf_index(tgt, ti, "vec_id", "embedding", n_centroids=4)
        out = similarity.bitext_mine_ann(
            src, tgt, "vec_id", "embedding", k=4, tier="ivf_index",
            src_index_path=si, tgt_index_path=ti, nprobe=4,
        ).localCheckpoint()  # pin before the tmp indexes are reclaimed
        shutil.rmtree(root, ignore_errors=True)
        return out

    qs = {
        "bitext_mine_ann_vol": q_bitext_mine_ann_vol,
        "bitext_ann_agree_vol": q_bitext_ann_agree_vol,
        "bitext_mine_ann_ivf_vol": q_bitext_mine_ann_ivf_vol,
    }

    def swap_bounds(sql: str) -> str:
        # order matters: the compound tgt bound contains the bare
        # `vec_id >= 100` substring, so it swaps first; the remaining
        # bare occurrences (tkeys/cand_f/e_pairs) swap after
        sql = swap(
            sql,
            "vec_id >= 100 AND vec_id < 125",
            f"(vec_id % {MOD}) >= 100 AND (vec_id % {MOD}) < 108",
        )
        sql = swap(sql, "vec_id < 25", f"vec_id % {MOD} < 8")
        return swap(sql, "vec_id >= 100", f"vec_id % {MOD} >= 100")

    sql_exact = swap(
        swap(P.SQL_BITEXT_MINE, "s.vec_id < 25", f"s.vec_id % {MOD} < 8"),
        "t.vec_id >= 100 AND t.vec_id < 125",
        f"t.vec_id % {MOD} >= 100 AND t.vec_id % {MOD} < 108",
    )
    sql = {
        "bitext_mine_ann_vol": swap_bounds(P.SQL_BITEXT_MINE_ANN),
        "bitext_ann_agree_vol": swap_bounds(P.SQL_BITEXT_ANN_AGREE),
        # full probe == complete retrieval == the exact tier's answer
        "bitext_mine_ann_ivf_vol": sql_exact,
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
        app_name="oracle-volume-r10", master="local[16]", shuffle_partitions=64
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
