"""Profile one registry query: per-job / per-stage wall time from the
Spark event log, so optimization targets the phase that actually costs.

Usage: python tools/profile_query.py <query> [--repeats 2] [--sf DIR]

Runs QUERIES[name] through the noop sink like bench.py, with event
logging on, then prints each job (submission→completion, description)
and the heaviest stages. The FIRST repeat includes store-build setup
jobs issued at plan-construction time; later repeats show steady state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="profile_ev_")
    from traceframe_spark.plans import catalog_queries
    from traceframe_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{args.query}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()  # warm JVM
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    queries = catalog_queries()
    marks = []
    for i in range(args.repeats):
        t0 = time.time()
        df = queries[args.query](spark, args.sf)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        marks.append((t0, t1, t2))
        print(f"repeat {i}: build {t1-t0:.2f}s  exec {t2-t1:.2f}s  total {t2-t0:.2f}s")
    spark.stop()

    # parse event log
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    logfiles = []
    for root, _dirs, files in os.walk(evdir):
        logfiles += [os.path.join(root, f) for f in files if "appstatus" not in f]
    for fn in logfiles:
        with open(fn) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"] / 1000.0,
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    jobs.setdefault(ev["Job ID"], {})["t1"] = (
                        ev["Completion Time"] / 1000.0
                    )
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    if "Submission Time" in si and "Completion Time" in si:
                        stages[si["Stage ID"]] = {
                            "dur": (si["Completion Time"] - si["Submission Time"])
                            / 1000.0,
                            "name": si.get("Stage Name", ""),
                            "tasks": si.get("Number of Tasks", 0),
                        }

    base = marks[0][0]
    print(f"\n--- jobs (t offsets from first repeat start; repeats at "
          f"{[round(m[0]-base,2) for m in marks]}) ---")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j or "t0" not in j:
            continue
        dur = j["t1"] - j["t0"]
        if dur < 0.05:
            continue
        sdur = {
            sid: stages[sid]["dur"] for sid in j.get("stages", []) if sid in stages
        }
        print(
            f"job {jid:3d} @{j['t0']-base:7.2f}s  {dur:6.2f}s  "
            f"stages={ {k: round(v, 2) for k, v in sorted(sdur.items())} }  "
            f"{j['desc'][:60]}"
        )
    print("\n--- heaviest stages ---")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["dur"])[:12]:
        print(f"stage {sid:3d}  {s['dur']:6.2f}s  tasks={s['tasks']:3d}  {s['name'][:90]}")
    print(f"\nevent log dir: {evdir}")


if __name__ == "__main__":
    main()
