#!/usr/bin/env python
"""Clone-stress run of RAW minhash near-dup pairs with the
max_pairs_per_bucket safety valve — the SCALING.md evidence that the
documented k=100 JVM-exhaustion boundary is closed for raw usage too
(dedup_pipeline remains the production path).

Without the cap, the k=100 corpus (every doc ~100 near-copies) makes the
candidate set quadratic in clone-cluster size (~2.5 M verified pairs)
and the verify join exhausts a single 48 GB JVM. With the cap, each LSH
bucket keeps only C(m_keep,2) <= cap pairs' worth of members, output is
bands x cap per cluster, and truncation is logged explicitly.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_minhash_cap.py \
           [--sf /tmp/sparktrace_scale100] [--cap 100]
Prints one JSON line with wall time, pair count, and the truncation
report captured from the operator's log.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparktrace_scale100")
    ap.add_argument("--cap", type=int, default=100)
    ap.add_argument("--threshold", type=float, default=0.7)
    args = ap.parse_args()

    from traceframe_spark.operators import dedup
    from traceframe_spark.plans.catalog import load_table
    from traceframe_spark.session import get_spark

    # capture the operator's truncation report
    records: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logging.getLogger("traceframe_spark.dedup").addHandler(_Capture())
    logging.getLogger("traceframe_spark.dedup").setLevel(logging.WARNING)

    spark = get_spark(app_name="stress-minhash-cap")
    docs = load_table(spark, args.sf, "documents")
    n_docs = docs.count()

    t0 = time.time()
    pairs = dedup.minhash_dedup_pairs(
        docs,
        "doc_id",
        "text",
        threshold=args.threshold,
        max_pairs_per_bucket=args.cap,
    )
    n_pairs = pairs.count()
    dt = time.time() - t0

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "docs": n_docs,
                "cap": args.cap,
                "verified_pairs": n_pairs,
                "seconds": round(dt, 2),
                "truncation_report": records[:3],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(0 if main() is None else 0)
