"""A/B the IVF-PQ encode-width spread (_assigned_with_code spread_key).

Side A monkeypatches spread to identity (pre-change behaviour); side B
runs the tree as-is. Fresh session per invocation, same row order:
build+probe of the OPQ chain then the plain IVF-PQ chain, N repeats
each, fresh store path per repeat.

Usage: python tools/ab_encode_spread_r14.py {A|B} [--repeats 5]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["A", "B"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    if args.side == "A":
        import traceframe_spark.operators.dedup as D

        D.spread = lambda df, key, cpu=False: df  # type: ignore[assignment]

    from pyspark.sql import functions as F

    from traceframe_spark.operators import similarity as S
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name=f"ab-encode-spread-{args.side}")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    emb.write.format("noop").mode("overwrite").save()  # warm scan

    def one(tag: str, opq: bool) -> None:
        times = []
        for i in range(args.repeats):
            root = tempfile.mkdtemp(prefix=f"ab_{tag}_")
            path = root + "/idx"
            t0 = time.time()
            S.write_ivf_index(
                emb, path, "vec_id", "embedding", n_centroids=8,
                protocol="manifest", pq_samples=16, opq_rotate=opq,
            )
            q = emb.filter(F.col("vec_id") < 10)
            top = S.ivf_adc_topk_over_index(
                spark, path, q, "vec_id", "embedding", k=5, nprobe=8
            )
            top.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            shutil.rmtree(root, ignore_errors=True)
        print(
            f"{tag} side={args.side}: "
            + " ".join(f"{t:.2f}" for t in times)
            + f"  best={min(times):.2f} median={sorted(times)[len(times)//2]:.2f}"
        )

    one("opq", True)
    one("ivfpq", False)


if __name__ == "__main__":
    main()
