"""Capture .explain("formatted") for declared queries → plans/r15/.

Usage: python tools/capture_plans_r15.py [--suffix before|after] [query ...]

With no query args, captures every registry query named in bench.py's
HEADLINE list (the driver-benched surface). Store-building queries run
their setup jobs at plan-construction time — that is the cost of getting
a real physical plan, paid once per capture.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from traceframe_spark.plans import catalog_queries
    from traceframe_spark.session import get_spark

    queries = catalog_queries()
    if args.queries:
        names = args.queries
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in queries]
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-capture-r15")
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"CAPTURE ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {time.time() - t0:.1f}s -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
