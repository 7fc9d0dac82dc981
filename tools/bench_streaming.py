"""Streaming throughput bench: replay the events table through a file
stream into ``stream_to_rollup`` and report end-to-end events/s — the
SCALING.md streaming evidence row.

The replay is honest continuous-aggregate maintenance, not a toy source:
the events table is split into N parquet files, streamed one file per
micro-batch, and every batch folds its delta into the standing rollup
store via dynamic partition overwrite (the same path a production ingest
pays). Throughput therefore includes the batch scheduling, the delta
groupBy, the standing-store re-merge for touched hours, and the parquet
rewrite. Default feed order is time-sorted slices (production ingest:
each batch touches only its own hours); ``--shuffled`` replays in random
order instead, making every batch all-late-data against every hour of
the store — the worst-case merge stress.

Usage: python tools/bench_streaming.py [--sf DIR] [--batches 16]
Prints one JSON line {"sf_dir": ..., "events": N, "seconds": S,
"events_per_sec": R, "batches": B}.
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
    ap.add_argument(
        "--shuffled",
        action="store_true",
        help="randomly distribute events across micro-batches instead of "
        "time-ordered slices: EVERY batch then touches EVERY hour of the "
        "standing store — the worst-case all-late-data stress, not the "
        "production ingest shape",
    )
    ap.add_argument(
        "--stage-threshold",
        type=lambda s: s if s == "auto" else int(s),
        default=None,
        help="enable late-delta staging: hours whose per-batch delta has "
        "fewer partial rows than this are appended to staging and folded "
        "in bulk every --compact-every batches (plus a final compaction "
        "after the drain) instead of re-merging the store every batch; "
        "'auto' re-derives the measured sizing rule per batch (5x the "
        "all-late per-hour mean) so the same command stays sized at any "
        "volume",
    )
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument(
        "--hll",
        action="store_true",
        help="bench the streaming HLL register store (per-day distinct "
        "user_id sketches via stream_to_hll_store) instead of the sum "
        "rollup -- register MAX merge makes late data free, so the "
        "shuffled feed should cost the same as the ordered one",
    )
    ap.add_argument(
        "--max-hot-hours",
        type=int,
        default=None,
        help="size-free staging knob: merge at most this many (heaviest) "
        "hours per batch, stage the rest -- no row-threshold re-sizing "
        "needed when batch volume changes",
    )
    ap.add_argument(
        "--manifest",
        action="store_true",
        help="use the manifest-pointer committed store "
        "(stream_to_rollup_manifest) instead of the rename-swap store: "
        "same fold semantics, object-store-safe commits + snapshot "
        "isolation -- this flag prices the protocol difference",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import rollup as R
    from traceframe_spark.plans.catalog import load_table
    from traceframe_spark.session import get_spark
    from traceframe_spark.streaming.spans import (
        compact_rollup_store,
        stream_to_hll_store,
        stream_to_rollup,
    )

    spark = get_spark(app_name="bench-streaming")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warmup

    work = tempfile.mkdtemp(prefix="stream_bench_")
    feed = os.path.join(work, "feed")
    store = os.path.join(work, "rollup")
    ckpt = os.path.join(work, "ckpt")
    try:
        e = load_table(spark, args.sf, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        n_events = e.count()
        if args.shuffled:
            e.repartition(args.batches).write.parquet(feed)
        else:
            # time-ordered replay: each micro-batch is a contiguous time
            # slice, so a batch's standing-store merge touches only its
            # own hours (plus boundary stragglers) — the shape real
            # ingest has, and the shape the per-batch cost model assumes
            e.repartitionByRange(args.batches, "ts").sortWithinPartitions(
                "ts"
            ).write.parquet(feed)

        stream = (
            spark.readStream.schema("event_id long, ts long, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        t0 = time.time()
        if args.hll:
            # sketch event_id: every event is distinct, so the summed
            # estimate has a known truth (n_events) for the sanity assert
            q = stream_to_hll_store(
                stream, store, ckpt, "event_id", trigger_available_now=True
            )
            q.awaitTermination()
            dt = time.time() - t0
            from traceframe_spark.operators import sketch

            est = sketch.hll_estimate_by(
                spark.read.parquet(store), ["day"]
            ).agg(F.sum("est")).first()[0]
            # every event_id is distinct: summed estimate ~= n_events
            assert abs(est - n_events) / n_events < 0.1, (est, n_events)
            print(
                json.dumps(
                    {
                        "sf_dir": args.sf,
                        "mode": "hll_store",
                        "events": n_events,
                        "seconds": round(dt, 2),
                        "events_per_sec": int(n_events / dt),
                        "batches": args.batches,
                        "order": "shuffled" if args.shuffled else "time",
                        "est_total": int(est),
                    }
                )
            )
            return
        if args.manifest:
            if args.stage_threshold is not None or args.max_hot_hours is not None:
                raise SystemExit(
                    "--manifest does not implement late-delta staging; "
                    "drop --stage-threshold/--max-hot-hours (a row printed "
                    "with those knobs would mislabel the measurement)"
                )
            from traceframe_spark.streaming.manifest_store import (
                read_manifest_store,
                stream_to_rollup_manifest,
            )

            q = stream_to_rollup_manifest(
                stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
                trigger_available_now=True,
            )
            q.awaitTermination()
            dt = time.time() - t0
            total = read_manifest_store(spark, store).agg(F.sum("n")).first()[0]
        else:
            q = stream_to_rollup(
                stream,
                store,
                ckpt,
                R.MINUTE_NS,
                ["event_type"],
                "value",
                trigger_available_now=True,
                late_stage_threshold=args.stage_threshold,
                compact_every=args.compact_every,
                max_hot_hours=args.max_hot_hours,
            )
            q.awaitTermination()
            if args.stage_threshold is not None or args.max_hot_hours is not None:
                # final compaction makes the store exact after the drain; its
                # cost belongs in the measured wall time
                compact_rollup_store(spark, store, ["event_type"])
            dt = time.time() - t0
            total = spark.read.parquet(store).agg(F.sum("n")).first()[0]

        # sanity: the maintained rollup accounts for every replayed event
        assert total == n_events, (total, n_events)

        print(
            json.dumps(
                {
                    "sf_dir": args.sf,
                    "commit": "manifest" if args.manifest else "rename_swap",
                    "events": n_events,
                    "seconds": round(dt, 2),
                    "events_per_sec": int(n_events / dt),
                    "batches": args.batches,
                    "order": "shuffled" if args.shuffled else "time",
                    "stage_threshold": args.stage_threshold,
                    "max_hot_hours": args.max_hot_hours,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
