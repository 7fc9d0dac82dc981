"""Strong-scaling (cores) curve: the same queries on the same data at
4/16/32 local cores (configurable) — the scale-OUT evidence for the 100 TB story.
Data-scaling (SCALING.md's 10x/100x tables) shows cost grows ~linearly
with input; this shows the other axis: that the plans actually convert
added parallelism into wall-clock, i.e. nothing serializes on the
driver or on a single partition.

Each core count needs its own JVM (master can't change in-session), so
this tool re-execs itself per configuration.

Usage: python tools/bench_cores.py [--sf /tmp/sparktrace_scale]
       [--cores 4,16,32] [queries...]
Prints one JSON line per core count plus a merged summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "tpch_q3",
    "tpch_q9",
    "tpch_q21",
    "group_agg",
    "doc_dedup_exact",
    "cms_heavy_hitters",
]


def run_one_config(sf: str, names: list[str], repeats: int) -> None:
    from pyspark.sql import functions as F

    from traceframe_spark.plans import catalog_queries
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-cores")
    spark.range(1_000_000).select(F.sum("id")).collect()
    qs = catalog_queries()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(
        json.dumps(
            {"cores": os.environ.get("SPARK_GRAFT_CPUS", "default"), "times": out}
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparktrace_scale")
    ap.add_argument("--cores", default="4,16,32")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT

    if args.child:
        run_one_config(args.sf, names, args.repeats)
        return

    merged: dict[str, dict[str, float]] = {}
    for c in (x.strip() for x in args.cores.split(",")):
        env = dict(os.environ, SPARK_GRAFT_CPUS=c, SPARK_GRAFT_SHUFFLE=c)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", "--sf", args.sf,
             "--repeats", str(args.repeats), *names],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        merged[c] = json.loads(line)["times"]
        print(line, flush=True)
    print(json.dumps({"sf": args.sf, "by_cores": merged}))


if __name__ == "__main__":
    main()
