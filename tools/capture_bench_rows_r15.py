"""Capture .explain("formatted") for the bench-only split rows
(`dedup_index_probe`, `search_traces`) -> plans/r15/.

These rows exist only inside bench.py's main() (standing-store probes),
so tools/capture_plans_r15.py cannot reach them through the registry.
This mirrors bench.py's construction exactly: same store build (untimed
setup), same probe call.

Usage: python tools/capture_bench_rows_r15.py [--suffix before|after]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="after")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from traceframe_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture-bench-rows-r15")

    import bench
    from traceframe_spark import sinks
    from traceframe_spark.operators import dedup_index as di
    from traceframe_spark.plans.pipeline import _index_split

    # search_traces: partitioned span store, then the Jaeger-UI search
    store = tempfile.mkdtemp(prefix="cap_span_store_")
    try:
        sinks.write_spans(
            bench.synthetic_spans(spark, args.sf), store, mode="overwrite"
        )
        plan = _plan(bench.bench_search_traces(spark, store))
        with open(os.path.join(out_dir, f"search_traces_{args.suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("search_traces captured", flush=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)

    # dedup_index_probe: standing near-dup store, then one probe
    root = tempfile.mkdtemp(prefix="cap_dedup_idx_")
    try:
        ref, delta = _index_split(spark, args.sf)
        dpath = root + "/near"
        di.write_dedup_index(ref, dpath)
        plan = _plan(di.dedup_against_index(delta, dpath, threshold=0.9))
        with open(
            os.path.join(out_dir, f"dedup_index_probe_{args.suffix}.txt"), "w"
        ) as fh:
            fh.write(plan)
        print("dedup_index_probe captured", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
