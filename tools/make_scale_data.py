"""Synthesize an N-fold scale-up of the driver testdata for local
scaling experiments.

The driver provides sf0.001/0.01/0.1; judging the 100 TB story needs
evidence that per-query cost grows ~linearly past that. This script
multiplies the big tables K times with key shifts (joins keep matching:
orders and lineitem shift orderkeys together), leaves the dimension
tables alone (as TPC-H scaling does), and perturbs text/embedding
payloads only by id-derived prefixes so dedup finds realistic clone
clusters (a deliberate LSH-bucket stress: every source doc gains K-1
near-copies).

Usage: python tools/make_scale_data.py [--src /root/testdata/sf0.1]
       [--out /tmp/sparktrace_scale] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

KEY_SHIFT = 1_000_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sparktrace_scale")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--exact-clones",
        action="store_true",
        help="copy document text UNCHANGED across the K copies (byte-"
        "identical clones, only doc_id shifted) instead of the default "
        "id-prefix perturbation that makes NEAR-copies: the stress shape "
        "for dedup_pipeline's exact stage (crawl snapshots / mirrors)",
    )
    ap.add_argument(
        "--unique-text",
        action="store_true",
        help="suffix every WORD of copies 1..k-1 with the copy index so "
        "no shingle survives across copies: k-times the DISTINCT content "
        "(copy 0 unchanged). The shape for measuring reference-side scan "
        "cost (an already-DEDUPED 100x snapshot — the dedup-index loop "
        "invariant) without the near-dup candidate blowup the default "
        "perturbation manufactures",
    )
    args = ap.parse_args()

    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="make-scale-data")
    os.makedirs(args.out, exist_ok=True)

    def multiply(name: str, shifts: dict[str, str], perturb=None) -> None:
        base = spark.read.parquet(f"{args.src}/{name}.parquet")
        parts = []
        for i in range(args.k):
            d = base
            for col, kind in shifts.items():
                if kind == "key":
                    d = d.withColumn(col, F.col(col) + F.lit(i * KEY_SHIFT))
                elif kind == "user":
                    # keep per-user event counts constant: new user space per copy
                    d = d.withColumn(col, F.col(col) + F.lit(i * 1_000_000))
            if perturb is not None:
                d = perturb(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
        print(f"{name}: x{args.k}")

    # dims copied as-is
    for name in ("region", "nation", "customer", "supplier", "part"):
        src = f"{args.src}/{name}.parquet"
        dst = f"{args.out}/{name}.parquet"
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
        print(f"{name}: copied")

    multiply("orders", {"o_orderkey": "key"})
    multiply("lineitem", {"l_orderkey": "key"})
    multiply("events", {"event_id": "key", "user_id": "user"})
    if args.exact_clones:
        doc_perturb = None
    elif args.unique_text:
        doc_perturb = lambda d, i: d.withColumn(
            "text",
            F.col("text")
            if i == 0
            else F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda w: F.concat(w, F.lit(f"_{i}")),
                ),
                " ",
            ),
        )
    else:
        doc_perturb = lambda d, i: d.withColumn(
            "text", F.concat(F.lit(f"copy{i} edition {i} "), F.col("text"))
        )
    multiply("documents", {"doc_id": "key"}, perturb=doc_perturb)
    multiply(
        "embeddings",
        {"vec_id": "key"},
        perturb=lambda d, i: d.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x * (1.0 + i * 1e-3)),
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
