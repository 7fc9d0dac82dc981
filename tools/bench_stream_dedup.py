"""Streaming dedup ingest throughput (streaming/documents.py): replay
the documents table through `stream_dedup_ingest` one parquet slice per
micro-batch — every batch probed against the growing persistent index
(exact + LSH layers), survivors landed and folded back.

The SCALING.md claim under test: per-batch cost is the batch's own
shingle/hash work plus the NARROW index rows (ckey/band/sig) — never
the accepted corpus text — so the same command at 10x the feed volume
should hold its per-doc cost (docs/s rises ~linearly with batch size,
as the rollup store's events/s does).

Also prices the ``within_batch_near=True`` arm (the in-batch LSH
collapse for bursts of near-copies arriving in one batch) against the
default, so the per-batch overhead of the extra pipeline stages is a
measured number, not a guess — and the ``store_protocol="manifest"``
arm (r11: atomic manifest commits for the fold-back + corpus landing
instead of parquet appends + marker files), so the protocol's
per-batch bill is a measured ratio too. Survivor counts are asserted
equal across arms: the protocol must change commits, never answers.

Usage: python tools/bench_stream_dedup.py [--sf DIR] [--batches 16]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup_index as di
    from traceframe_spark.plans.catalog import load_table
    from traceframe_spark.session import get_spark
    from traceframe_spark.streaming.documents import read_ingested, stream_dedup_ingest

    spark = get_spark(app_name="bench-stream-dedup")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    work = tempfile.mkdtemp(prefix="stream_dedup_bench_")
    feed = os.path.join(work, "feed")
    idx = os.path.join(work, "idx")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    try:
        d = load_table(spark, args.sf, "documents").select("doc_id", "text")
        n_docs = d.count()
        # snapshot index: the first 10% of ids (the pre-existing corpus);
        # the stream replays the WHOLE table, so ~10% of the feed dies in
        # the exact layer and near-copies (scale10's id-prefix perturbed
        # clones) die in the LSH layer — both layers priced, every batch
        tenth = d.filter(F.col("doc_id") % 10 == 0)
        di.write_dedup_index(tenth, idx)
        d.repartition(args.batches).write.parquet(feed)

        arms = {}
        for arm, kw in (
            ("default", {}),
            ("within_batch_near", {"within_batch_near": True}),
            ("manifest", {"store_protocol": "manifest"}),
        ):
            arm_idx = os.path.join(work, f"idx_{arm}")
            if arm == "manifest":
                # same snapshot content, manifest-protocol store (the
                # build is setup, not timed — matching the other arms)
                di.write_dedup_index(tenth, arm_idx, protocol="manifest")
            else:
                shutil.copytree(idx, arm_idx)
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )
            t0 = time.time()
            q = stream_dedup_ingest(
                stream, arm_idx, os.path.join(work, f"out_{arm}"),
                os.path.join(work, f"ckpt_{arm}"),
                threshold=args.threshold, trigger_available_now=True, **kw,
            )
            assert q.awaitTermination(3600), "stream timed out"
            dt = time.time() - t0
            survivors = read_ingested(
                spark, os.path.join(work, f"out_{arm}")
            ).count()
            arms[arm] = {
                "survivors": survivors,
                "seconds": round(dt, 2),
                "docs_per_sec": int(n_docs / dt),
            }
            print(arm, arms[arm], flush=True)
        assert arms["manifest"]["survivors"] == arms["default"]["survivors"], (
            "commit protocol changed the survivor set"
        )
        print(
            json.dumps(
                {
                    "sf_dir": args.sf,
                    "docs": n_docs,
                    "batches": args.batches,
                    **{f"{a}_{k}": v for a, row in arms.items() for k, v in row.items()},
                    "within_batch_overhead": round(
                        arms["within_batch_near"]["seconds"]
                        / arms["default"]["seconds"],
                        2,
                    ),
                    "manifest_vs_default": round(
                        arms["manifest"]["seconds"]
                        / arms["default"]["seconds"],
                        2,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
