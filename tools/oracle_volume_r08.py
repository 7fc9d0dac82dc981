"""Round-8 volume oracle sweep: the r06-r08 operators with fresh
float/hash arithmetic, run at the 100x copy so the VOLUME is real —
bounded registry queries re-bounded to keep the DuckDB side tractable,
unbounded ones (ngram_novelty, embed_drift, hll_distinct,
hll_daily_users, priority_sample, corpus_report) verbatim.

The registry pins `doc_id < cap` subsets for oracle tractability at
sf0.01; at the 100x copy (`tools/make_scale_data.py`, copies shifted by
1e9) that literal bound selects only copy 0 — no volume. This sweep
swaps the bound for `doc_id % 1e9 < cap` (every copy of the first
`cap` base docs: 100x the rows, WITH the clone/near-copy structure the
scale-up builds), runs the same operator on Spark and the same
adapted SQL on DuckDB, and compares exactly like tools/check_oracle.py.

containment caps drop to 30 base docs: near-copy structure multiplies
posting lists by 100, so the DuckDB self-join side grows ~10^4x — 30
base docs keeps the ORACLE inside minutes while the volume (3 000
docs, 100-deep clone clusters) still stresses the engine's hash/FP
arithmetic at a scale sf0.01 never reaches.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/oracle_volume_r08.py \
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


def _mod_filter(cap: int):
    from pyspark.sql import functions as F

    return (F.col("doc_id") % MOD) < cap


def build_queries():
    """(name → spark fn, name → sql): mod-bounded volume twins of the
    four bounded registry queries, SQL adapted from the registry
    constants by swapping the WHERE bound (the computation itself is
    byte-identical to the driver-green sf0.01 oracles)."""
    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup, sampling, text
    from traceframe_spark.plans import pipeline as P
    from traceframe_spark.plans.catalog import load_table, qint

    def swap(sql: str, old: str, new: str) -> str:
        assert old in sql, f"bound {old!r} not found in oracle SQL"
        return sql.replace(old, new)

    def q_containment_pairs_vol(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(_mod_filter(30))
        pairs = dedup.containment_pairs(d, "doc_id", "text", threshold=0.6)
        return pairs.select(
            "id_sub", "id_super", qint(F.col("containment"), 4).alias("containment_q")
        )

    def q_containment_pipeline_vol(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(_mod_filter(30))
        doubled = d.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + 500_000_000)
        )
        pairs = dedup.containment_pipeline(doubled, "doc_id", "text", threshold=0.6)
        return pairs.select(
            "id_sub", "id_super", qint(F.col("containment"), 4).alias("containment_q")
        )

    def q_line_dedup_vol(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(_mod_filter(400))
        lines = text.chunk_documents(d, chunk_tokens=8, overlap=0).select(
            "doc_id",
            F.col("chunk_id").alias("line_no"),
            F.col("chunk_text").alias("line"),
        )
        kept = text.dedup_lines(lines, min_occurrences=2)
        docs = text.reassemble_lines(kept)
        return docs.select("doc_id", "n_lines", F.md5("text").alias("text_md5"))

    def q_dsir_importance_vol(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(_mod_filter(400))
        w = sampling.dsir_importance(
            d, is_target=F.col("lang") == "en", buckets=4096
        )
        return w.select(
            "doc_id", "n_grams", qint(F.col("logweight"), 4).alias("logweight_q")
        )

    def q_dedup_index_delta_vol(spark, sf_dir):
        # the portable-MinHash probe at clone volume: ref = even docs of
        # the first 200 base ids across ALL 100 copies (20k docs with
        # the near-copy structure), delta = the odd ones + seeded exact
        # clones and suffix edits of the first 50 base evens — the
        # registry split's shape with real volume behind it
        import tempfile

        from traceframe_spark.operators import dedup_index as di

        d = load_table(spark, sf_dir, "documents")
        base = F.col("doc_id") % MOD
        ref = d.filter((F.col("doc_id") % 2 == 0) & (base < 200))
        seeds = ref.filter(base < 50)
        delta = (
            d.filter((F.col("doc_id") % 2 == 1) & (base < 200))
            .select("doc_id", "text")
            .unionByName(
                seeds.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
            )
            .unionByName(
                seeds.select(
                    (F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" the end")).alias("text"),
                )
            )
        )
        path = tempfile.mkdtemp(prefix="dedup_index_vol_") + "/idx"
        di.write_dedup_index(ref, path, portable=True)
        return di.dedup_against_index(delta, path, threshold=0.9).select("doc_id")

    def q_dedup_index_exact_vol(spark, sf_dir):
        import tempfile

        from traceframe_spark.operators import dedup_index as di

        d = load_table(spark, sf_dir, "documents")
        base = F.col("doc_id") % MOD
        ref = d.filter((F.col("doc_id") % 2 == 0) & (base < 200))
        seeds = ref.filter(base < 50)
        delta = (
            d.filter((F.col("doc_id") % 2 == 1) & (base < 200))
            .select("doc_id", "text")
            .unionByName(
                seeds.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
            )
            .unionByName(
                seeds.select(
                    (F.col("doc_id") + 200000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" the end")).alias("text"),
                )
            )
        )
        path = tempfile.mkdtemp(prefix="dedup_index_vol_") + "/idx"
        di.write_dedup_index(ref, path, with_near=False)
        return di.dedup_against_index(delta, path, near_dup=False).select("doc_id")

    def q_minhash_portable_pairs_vol(spark, sf_dir):
        from traceframe_spark.operators.dedup_index import _band_entries
        from traceframe_spark.operators import dedup
        from traceframe_spark.plans.catalog import qint

        d = load_table(spark, sf_dir, "documents").filter(_mod_filter(50))
        sigs = dedup.minhash_signatures(
            d, "doc_id", "text", portable=True
        ).persist()
        be = _band_entries(sigs.select("id", "sig"), 16, 4, portable=True)
        cand = (
            be.alias("a")
            .join(be.alias("b"), ["band", "bh"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        pairs = dedup.jaccard_verify(cand, sigs, 0.9)
        out = pairs.select(
            "id_a", "id_b", qint(F.col("jaccard"), 4).alias("jaccard_q")
        )
        from traceframe_spark.operators.dedup import _unpersist_with

        return _unpersist_with(out, sigs)

    qs = {
        "containment_pairs_vol": q_containment_pairs_vol,
        "containment_pipeline_vol": q_containment_pipeline_vol,
        "line_dedup_vol": q_line_dedup_vol,
        "dsir_importance_vol": q_dsir_importance_vol,
        "dedup_index_delta_vol": q_dedup_index_delta_vol,
        "dedup_index_exact_vol": q_dedup_index_exact_vol,
        "minhash_portable_pairs_vol": q_minhash_portable_pairs_vol,
    }

    # The other r06/r07 operators with fresh float/hash arithmetic
    # (ngram_novelty, embed_drift, hll_distinct, hll_daily_users,
    # priority_sample, corpus_report) are UNBOUNDED over their tables,
    # so their volume twins are the registry entries verbatim against
    # the 100x dir — no bound swap needed; the sweep just points both
    # engines at the scaled parquet.
    from traceframe_spark.plans import catalog_oracle_sql, catalog_queries

    reg_q, reg_sql = catalog_queries(), catalog_oracle_sql()
    for reg_name in (
        "ngram_novelty",
        "embed_drift",
        "hll_distinct",
        "hll_daily_users",
        "priority_sample",
        "corpus_report",
        "index_novelty",
        "index_contamination",
        "hll_weekly_users",
    ):
        qs[f"{reg_name}_vol"] = reg_q[reg_name]
    sql = {
        "containment_pairs_vol": swap(
            P.SQL_CONTAINMENT_PAIRS, "doc_id < 150", f"doc_id % {MOD} < 30"
        ),
        # one swap covers all three bound occurrences (canon UNION x2 +
        # docs join filter); the clone shift moves clear of the 100-copy
        # id space (copies live at doc_id + i*1e9, bases < 1e9)
        "containment_pipeline_vol": swap(
            P.SQL_CONTAINMENT_PIPELINE.replace("doc_id + 100000", "doc_id + 500000000"),
            "doc_id < 150",
            f"doc_id % {MOD} < 30",
        ),
        "line_dedup_vol": swap(
            P.SQL_LINE_DEDUP, "doc_id < 400", f"doc_id % {MOD} < 400"
        ),
        "dsir_importance_vol": swap(
            P.SQL_DSIR_IMPORTANCE, "doc_id < 400", f"doc_id % {MOD} < 400"
        ),
        # both % 2 splits gain the base-id bound (the seed arms pick it
        # up via the even split, then their own bound swaps to mod form
        # — even AND base<200 AND base<50 ≡ even AND base<50)
        "dedup_index_delta_vol": swap(
            swap(
                P.SQL_DEDUP_INDEX_DELTA,
                "doc_id % 2 = 0",
                f"doc_id % 2 = 0 AND doc_id % {MOD} < 200",
            ),
            "doc_id % 2 = 1",
            f"doc_id % 2 = 1 AND doc_id % {MOD} < 200",
        ).replace("AND doc_id < 50", f"AND doc_id % {MOD} < 50"),
        "dedup_index_exact_vol": swap(
            swap(
                P.SQL_DEDUP_INDEX_EXACT,
                "doc_id % 2 = 0",
                f"doc_id % 2 = 0 AND doc_id % {MOD} < 200",
            ),
            "doc_id % 2 = 1",
            f"doc_id % 2 = 1 AND doc_id % {MOD} < 200",
        ).replace("AND doc_id < 50", f"AND doc_id % {MOD} < 50"),
        "minhash_portable_pairs_vol": swap(
            P.SQL_MINHASH_PORTABLE_PAIRS,
            "doc_id < 250",
            f"doc_id % {MOD} < 50",
        ),
    }
    for reg_name in (
        "ngram_novelty",
        "embed_drift",
        "hll_distinct",
        "hll_daily_users",
        "priority_sample",
        "corpus_report",
        "index_novelty",
        "index_contamination",
        "hll_weekly_users",
    ):
        sql[f"{reg_name}_vol"] = reg_sql[reg_name]
    return qs, sql


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparktrace_scale100")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from tools.check_oracle import _canon  # same comparison semantics

    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="oracle-volume-r08", master="local[16]", shuffle_partitions=64)
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
