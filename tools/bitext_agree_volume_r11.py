"""Sampled bitext agreement at the 100x corpus — exercising the
documented scale story of `bitext_ann_agreement` ("run the exact side
on a src SAMPLE") exactly where it's needed: a 100-vector src sample
instrumented against the FULL ~190k-vector tgt side, per ANN tier, at
its production operating point.

The exact side broadcasts the src sample and scores 100 x 190k pairs
once (the sample, not the corpora, bounds the cross scoring — the
affordability argument in the docstring); the ANN side runs the real
tier. Agreement = fraction of src vectors whose mined tgt equals the
exact tier's. Wall times are per-tier, one session, measured around
the agreement aggregation (index builds reported separately — they are
one-shot).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/bitext_agree_volume_r11.py
Prints one JSON line; numbers recorded in SCALING.md r11.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOD = 1_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from traceframe_spark.operators import similarity
    from traceframe_spark.plans.catalog import load_table, tmp_store
    from traceframe_spark.session import get_spark

    spark = get_spark(
        app_name="bitext-agree-volume", master="local[16]", shuffle_partitions=64
    )
    sf = "/tmp/sparktrace_scale100"
    e = load_table(spark, sf, "embeddings")
    base, copy = F.col("vec_id") % MOD, (F.col("vec_id") / MOD).cast("long")
    # 100-vector src sample: 25 base vectors x 4 copies (clone-heavy by
    # construction — the corpus's worst case); tgt = the FULL disjoint
    # side, every copy of every base id >= 100 (~190k vectors)
    src = e.filter((base < 25) & (copy < 4)).localCheckpoint()
    tgt = e.filter(base >= 100).localCheckpoint()
    n_src, n_tgt = src.count(), tgt.count()

    out = {"src": n_src, "tgt": n_tgt}

    def agree(tier_name, **kw):
        t0 = time.time()
        rows = similarity.bitext_ann_agreement(
            src, tgt, "vec_id", "embedding", k=4, **kw
        ).agg(
            F.avg("agree").alias("agreement"), F.count("*").alias("n")
        ).first()
        out[tier_name] = {
            "agreement": round(float(rows["agreement"]), 4),
            "n_src_rows": int(rows["n"]),
            "seconds": round(time.time() - t0, 1),
        }
        print(tier_name, out[tier_name], flush=True)

    # LSH tier at the lever table's production point (portable
    # multiprobe, 16 planes / 4 bands — the 0.88-agreement point at
    # sf0.1; clone mass makes the 100x block denser)
    agree(
        "lsh_multiprobe",
        tier="lsh", n_planes=16, bands=4, portable=True, multiprobe=True,
    )

    # IVF tier: per-side persisted indexes (the one-shot build reported
    # separately), nprobe=8 of 64 centroids on the corpus side
    root = tmp_store("bitext_agree_vol_")
    try:
        si, ti = f"{root}/src", f"{root}/tgt"
        t0 = time.time()
        similarity.write_ivf_index(src, si, "vec_id", "embedding", n_centroids=4)
        similarity.write_ivf_index(tgt, ti, "vec_id", "embedding", n_centroids=64)
        out["ivf_index_build_seconds"] = round(time.time() - t0, 1)
        for nprobe in (8, 32):
            agree(
                f"ivf_nprobe{nprobe}",
                tier="ivf_index", src_index_path=si, tgt_index_path=ti,
                nprobe=nprobe,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
