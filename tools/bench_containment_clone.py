"""Clone-stress for containment_pipeline — the SCALING.md evidence that
its cost follows CANDIDATE MASS, not corpus²: on an exact-clone corpus
(tools/make_scale_data.py --exact-clones; every text appears k times),
the pipeline's stage-1 collapse removes the clone mass before the
inverted index exists, so 10x/100x clone volume should cost ~the
collapse scan, while the raw containment_pairs operator multiplies
every posting list by k and emits k² pairs per content pair.

Raw is measured on a BOUNDED subset (``--raw-cap`` base docs, clone
structure preserved via ``doc_id % 1e9 < cap``) at 1x and clone10
only: full-corpus raw already costs ~366 s at plain sf0.1, and clone10
multiplies its candidate mass ~100x (every posting list x10 → k² pairs
per content pair) — ~10 hours, not a number worth printing when the
subset shows the same k² factor in minutes. The pipeline arm runs on
the FULL corpora, clone100 included: its stage-1 collapse removes the
clone mass, so its cost should track the linear collapse scan.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_containment_clone.py \
      [--one /root/testdata/sf0.1] [--ten /tmp/sparktrace_clone10] \
      [--hundred /tmp/sparktrace_clone100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="/root/testdata/sf0.1")
    ap.add_argument("--ten", default="/tmp/sparktrace_clone10")
    ap.add_argument("--hundred", default="/tmp/sparktrace_clone100")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--raw-cap", type=int, default=500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup
    from traceframe_spark.plans import load_table
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-containment-clone")
    spark.range(1_000_000).select(F.sum("id")).collect()

    def run(fn, sf_dir: str, repeats: int, cap: int | None = None) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            docs = load_table(spark, sf_dir, "documents")
            if cap is not None:
                docs = docs.filter(F.col("doc_id") % 1_000_000_000 < cap)
            fn(docs).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    pipeline = lambda docs: dedup.containment_pipeline(
        docs, "doc_id", "text", threshold=args.threshold
    )
    raw = lambda docs: dedup.containment_pairs(
        docs, "doc_id", "text", threshold=args.threshold
    )

    out: dict[str, dict[str, float]] = {}
    for label, sf_dir, with_raw, repeats in (
        ("1x", args.one, True, args.repeats),
        ("clone10", args.ten, True, args.repeats),
        ("clone100", args.hundred, False, 1),
    ):
        row = {"pipeline": run(pipeline, sf_dir, repeats)}
        if with_raw:
            row["raw_pairs_capped"] = run(raw, sf_dir, 1, cap=args.raw_cap)
        out[label] = row
        print(label, row, flush=True)
    out["pipeline_100x_factor"] = round(
        out["clone100"]["pipeline"] / out["1x"]["pipeline"], 2
    )
    out["raw_clone10_factor"] = round(
        out["clone10"]["raw_pairs_capped"] / out["1x"]["raw_pairs_capped"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
