"""Operator-level 100x scale points for the curation operators whose
REGISTRY queries are bounded subsets (bounded so their SQL oracles stay
tractable) and therefore constant-size at any corpus scale:

- `dedup_pipeline` runs on the FULL documents table, 1x (sf0.1) vs the
  100x exact-clone corpus (`make_scale_data.py --exact-clones --k 100`)
  — the crawl-snapshot shape the composed operator exists for: the
  exact stage must collapse 100x clone mass with a narrow (id, md5)
  shuffle before LSH runs.
- `media_dedup` (synthesize -> media_exact_dedup -> decode) runs over
  200 payloads at 1x vs 20,000 at 100x (`doc_id % KEY_SHIFT < 200` on
  the perturbed copy widens the same slice to every clone copy).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_scale_curation.py \
    [--clone100 /tmp/sparktrace_clone100] [--scale100 /tmp/sparktrace_scale100]
Prints one JSON line per row then a summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY_SHIFT = 1_000_000_000  # make_scale_data.py's per-copy id shift


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="/root/testdata/sf0.1")
    ap.add_argument("--clone100", default="/tmp/sparktrace_clone100")
    ap.add_argument("--scale100", default="/tmp/sparktrace_scale100")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup, multimodal
    from traceframe_spark.plans.catalog import load_table
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-curation")
    spark.range(1_000_000).select(F.sum("id")).collect()

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {}

    def dedup_full(sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return lambda: dedup.dedup_pipeline(docs, "doc_id", "text", threshold=0.9, bands=16)

    row = {"1x": timed(dedup_full(args.one)), "100x": timed(dedup_full(args.clone100))}
    row["factor"] = round(row["100x"] / row["1x"], 2)
    out["dedup_pipeline_full(exact-clone 100x)"] = row
    print("dedup_pipeline_full", row, flush=True)

    def media(sf_dir, widened):
        d = load_table(spark, sf_dir, "documents")
        key = (F.col("doc_id") % KEY_SHIFT) if widened else F.col("doc_id")
        d = d.filter(key < 200)
        m = multimodal.synthesize_png_media(
            d.select((key % 40).alias("img_key")), "img_key"
        )
        return lambda: multimodal.decode_image_meta(multimodal.media_exact_dedup(m))

    row = {
        "1x": timed(media(args.one, widened=False)),
        "100x": timed(media(args.scale100, widened=True)),
    }
    row["factor"] = round(row["100x"] / row["1x"], 2)
    out["media_dedup_full(100x payloads)"] = row
    print("media_dedup_full", row, flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
