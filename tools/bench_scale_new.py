"""Measure the ML-prep suite at sf0.1 vs the 10x synthetic copy
(tools/make_scale_data.py) — the SCALING.md evidence rows for the
queries added after the r04 full-suite measurement.

Usage: python tools/bench_scale_new.py [--ten /tmp/sparktrace_scale]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NEW = [
    "embed_quantize",
    "ann_hamming_topk",
    "kmeans_assign",
    "label_outliers",
    "tfidf_topk",
    "pmi_bigrams",
    "inflight_concurrency",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="/root/testdata/sf0.1")
    ap.add_argument("--ten", default="/tmp/sparktrace_scale")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("queries", nargs="*", help="override the default NEW list")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.plans import catalog_queries
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-new")
    spark.range(1_000_000).select(F.sum("id")).collect()
    qs = catalog_queries()

    out: dict[str, dict[str, float]] = {}
    for name in (args.queries or NEW):
        row = {}
        for label, sf_dir in (("1x", args.one), ("10x", args.ten)):
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
        row["factor"] = round(row["10x"] / row["1x"], 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
