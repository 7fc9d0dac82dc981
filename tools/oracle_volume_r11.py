"""Round-11 volume oracle sweep: the r11 operators value-checked at the
100x copy (/tmp/sparktrace_scale100), same comparison semantics as
tools/check_oracle.py and the r08-r10 sweeps.

- ``dedup_index_manifest_vol``: the MANIFEST-protocol persistent-index
  probe (the round's headline store change) with the registry's
  ``_index_split`` bounds swapped to ``doc_id % 1e9`` over the first 30
  base ids — ~3,000 documents in ~100-deep near-copy clusters, plus the
  split's seeded exact/near clones. The full portable LSH chain
  (shingles → md5-affine minima → value-keyed band buckets → bucket
  join → agreeing-position estimate ≥ 0.9 → anti-join) replays in
  DuckDB against what the MANIFEST store served back, so the layer
  commit + snapshot read roundtrip is value-verified at real clone
  mass, not just at the sf0.01 gate.
- ``lm_manifest_score_vol``: the manifest-protocol stored LM trained on
  30,000 docs across every copy (one atomic commit of both count
  layers + |V|), read back and scored against — the r09
  ``lm_store_score_vol`` row re-proven under the new commit protocol.
- ``percentiles_sampled_vol``: the registry entry VERBATIM — the md5
  bottom-k sampled quantile runs over the unbounded lineitem table
  (60,000,000 rows here), so the deterministic sample selection and
  the interpolated percentiles over it are value-matched at 100x with
  zero bound surgery: the k=4096 sample is the whole point (bounded
  memory no matter the group size), and the oracle replays the exact
  same keys, bottom-k, and interpolation.

Late-r11 additions (the round's second wave of operators):

- ``nb_predict_vol``: the NB classifier registry entry VERBATIM — train
  on the even half of all 500k documents, predict the odd 250k; the
  model stays ``buckets × classes`` rows no matter the corpus (the
  scale claim), and the oracle replays hashing/smoothing/floors/argmax/
  margins over the full volume.
- ``ann_ivf_manifest_vol``: the manifest-protocol IVF registry entry
  VERBATIM — the stored index holds all 200k vectors, full-probe top-k
  must equal DuckDB brute force (protocol + machinery pinned by value
  at volume).
- ``dup_span_removal_vol``: duplicated-substring REMOVAL over 3 base
  ids × ~100 near-copies — nearly every 8-token window is
  corpus-duplicated, so the cut must remove almost everything except
  the canonical occurrences (worst-case duplication mass), and the
  oracle replays election/coverage/reassembly string-for-string.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/oracle_volume_r11.py \
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

    from traceframe_spark.plans import advanced as A
    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans import catalog as C
    from traceframe_spark.plans.catalog import load_table, qint, tmp_store

    def swap(sql: str, old: str, new: str) -> str:
        assert old in sql, f"bound {old!r} not found in oracle SQL"
        return sql.replace(old, new)

    def q_dedup_index_manifest_vol(spark, sf_dir):
        from traceframe_spark.operators import dedup_index as di

        d = load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % MOD) < 30
        )
        ref = d.filter(F.col("doc_id") % 2 == 0)
        seeded = ref.filter((F.col("doc_id") % MOD) < 15)
        delta = (
            d.filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", "text")
            .unionByName(
                seeded.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
            )
            .unionByName(
                seeded.select(
                    (F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" the end")).alias("text"),
                )
            )
        )
        path = tmp_store("dedup_index_man_vol_") + "/idx"
        di.write_dedup_index(ref, path, portable=True, protocol="manifest")
        return di.dedup_against_index(delta, path, threshold=0.9).select("doc_id")

    def q_lm_manifest_score_vol(spark, sf_dir):
        from traceframe_spark.operators import text as T

        d = load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % MOD) < 300
        )
        path = tmp_store("bigram_lm_man_vol_") + "/lm"
        T.write_bigram_lm(d, path, protocol="manifest")
        out = T.score_against_lm(d, path)
        return out.select(
            F.col("id").alias("doc_id"),
            qint(F.col("avg_logprob"), 4).alias("logprob_q"),
        )

    def q_dup_span_removal_vol(spark, sf_dir):
        from traceframe_spark.operators import dedup as D

        d = load_table(spark, sf_dir, "documents").filter(
            (F.col("doc_id") % MOD) < 3
        )
        out = D.remove_duplicated_substrings(d, "doc_id", "text", window_tokens=8)
        return out.select(
            "doc_id",
            F.col("text_dedup"),
            F.size(
                F.filter(
                    F.split(F.trim("text_dedup"), r"\s+"), lambda t: t != F.lit("")
                )
            ).cast("long").alias("n_kept"),
        )

    from traceframe_spark.plans import mlprep as M

    qs = {
        "dedup_index_manifest_vol": q_dedup_index_manifest_vol,
        "lm_manifest_score_vol": q_lm_manifest_score_vol,
        # registry VERBATIM: the bounded-memory sample is the claim
        "percentiles_sampled_vol": A.q_percentiles_sampled,
        # registry VERBATIM: no doc/vec bounds in the query — train on
        # the even half of all 500k docs, predict the odd 250k; the
        # model stays buckets x classes no matter the corpus (the claim)
        "nb_predict_vol": M.q_nb_predict,
        # registry VERBATIM: manifest-protocol IVF index over all 200k
        # vectors, full-probe == brute force (protocol + machinery
        # pinned at volume by the exact SQL)
        "ann_ivf_manifest_vol": P.q_ann_ivf_manifest,
        # 3 base ids x ~100 near-copies: nearly every 8-token window is
        # corpus-duplicated, so removal must cut almost everything
        # except the canonical occurrences — worst-case dup mass
        "dup_span_removal_vol": q_dup_span_removal_vol,
    }

    # bound surgery on SQL_DEDUP_INDEX_DELTA, most-specific first (the
    # seeded-clone bound contains the bare ref bound as a substring)
    sql_index = P.SQL_DEDUP_INDEX_DELTA
    sql_index = sql_index.replace(
        "WHERE doc_id % 2 = 0 AND doc_id < 50",
        f"WHERE doc_id % 2 = 0 AND doc_id % {MOD} < 30 AND doc_id % {MOD} < 15",
    )
    sql_index = sql_index.replace(
        "WHERE doc_id % 2 = 0", f"WHERE doc_id % 2 = 0 AND doc_id % {MOD} < 30"
    )
    sql_index = sql_index.replace(
        "WHERE doc_id % 2 = 1", f"WHERE doc_id % 2 = 1 AND doc_id % {MOD} < 30"
    )
    sql = {
        "dedup_index_manifest_vol": sql_index,
        "lm_manifest_score_vol": swap(
            P.SQL_DOC_BIGRAM_LOGPROB, "doc_id < 300", f"doc_id % {MOD} < 300"
        ),
        "percentiles_sampled_vol": A.SQL_PERCENTILES_SAMPLED,
        "nb_predict_vol": M.SQL_NB_PREDICT,
        "ann_ivf_manifest_vol": C.SQL_ANN_COSINE_TOPK,
        "dup_span_removal_vol": swap(
            P.SQL_DUP_SPAN_REMOVAL, "doc_id < 300", f"doc_id % {MOD} < 3"
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
        app_name="oracle-volume-r11", master="local[16]", shuffle_partitions=64
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
