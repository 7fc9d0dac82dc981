"""Persistent-dedup-index A/B — the SCALING.md evidence that a daily
delta probe costs O(delta + narrow index rows), not O(snapshot):

- **fly**: `cross_near_dup_subtract(delta, ref)` — re-shingles and
  re-minhashes the whole reference snapshot on every call (what every
  non-indexed pipeline pays daily).
- **probe**: `dedup_against_index(delta, stored_index)` — the snapshot
  was indexed ONCE (`write_dedup_index`, also timed); the daily call
  reads only the stored narrow layers (ckey/bands/sigs).

Fixed delta (sf0.1 documents, ~5 k docs; even = exact re-crawls, odd =
light edits) against a 1× and a 100× DISTINCT-content snapshot
(make_scale_data --unique-text — the loop invariant: only dedup
survivors are ever appended, so a real index holds no near-dup
clusters): fly should scale ~linearly with the snapshot (it re-shingles
it), probe should stay near-flat (narrow stored rows only), and the
one-off build amortizes after `build / (fly - probe)` deltas.

Usage:
  python tools/bench_dedup_index.py [--one /root/testdata/sf0.1] \
      [--big /tmp/sparktrace_scale100u] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="/root/testdata/sf0.1")
    # the scaled snapshot must be DISTINCT content (make_scale_data
    # --unique-text): the index's loop invariant is that only dedup
    # SURVIVORS are ever appended, so a real index never holds near-dup
    # clusters. Pointing this at the default near-copy corpus measures
    # a different regime — candidate mass explodes for BOTH arms (see
    # SCALING.md r08) — not the reference-scan cost this A/B isolates.
    ap.add_argument("--big", default="/tmp/sparktrace_scale100u")
    ap.add_argument("--big-label", default="ref_100x")
    ap.add_argument("--delta", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--workdir", default="/tmp/sparktrace_dedup_index_bench")
    args = ap.parse_args()

    from traceframe_spark.operators import dedup, dedup_index as di
    from traceframe_spark.plans import load_table
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-dedup-index")
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()

    # the daily-delta shape: even docs are byte-identical re-crawls
    # (killed by the exact layer), odd docs are light edits of the
    # indexed copy (survive exact, killed by the LSH layer) — both
    # stored layers do real work every probe
    delta = load_table(spark, args.delta, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(F.col("text"), F.lit(" re-crawl edition")),
        ).otherwise(F.col("text")),
    )

    def timed(fn, repeats: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out: dict[str, dict[str, float]] = {}
    for label, sf_dir in (("ref_1x", args.one), (args.big_label, args.big)):
        ref = load_table(spark, sf_dir, "documents")
        idx = f"{args.workdir}/{label}"
        shutil.rmtree(idx, ignore_errors=True)

        fly = timed(
            lambda: dedup.cross_near_dup_subtract(
                delta, ref, "doc_id", "text", threshold=args.threshold
            ).write.format("noop").mode("overwrite").save(),
            args.repeats,
        )
        build = timed(lambda: di.write_dedup_index(ref, idx), 1)
        probe = timed(
            lambda: di.dedup_against_index(
                delta, idx, threshold=args.threshold
            ).write.format("noop").mode("overwrite").save(),
            args.repeats,
        )
        surv = di.dedup_against_index(delta, idx, threshold=args.threshold).count()
        row = {
            "fly": fly,
            "build_once": build,
            "probe": probe,
            "survivors": surv,
            "amortize_after_deltas": (
                round(build / (fly - probe), 1) if fly > probe else None
            ),
        }
        out[label] = row
        print(label, row, flush=True)

    out["fly_big_over_1x"] = round(
        out[args.big_label]["fly"] / out["ref_1x"]["fly"], 2
    )
    out["probe_big_over_1x"] = round(
        out[args.big_label]["probe"] / out["ref_1x"]["probe"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
