#!/usr/bin/env python
"""Coverage ledger: which registered queries have a driver-recorded row?

The driver's per-round correctness gate (`CORRECTNESS_r{N}.json`) records
only the first 50 entries of `catalog_queries()`.  This tool diffs the
full registry against the union of every committed CORRECTNESS file and
prints, per query:

  - recorded rounds (which r* files contain a row for it)
  - oracle-backed vs rows-only (from `catalog_oracle_sql()`)
  - the NEVER-RECORDED set (registry entries with no driver row in any round)

Use it before reordering the registry head: rotation should be driven by
this ledger, not memory.  Exit code 0 always (informational tool).

Usage:
    python tools/coverage_ledger.py          # summary + never-recorded set
    python tools/coverage_ledger.py --all    # full per-query table
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_recorded():
    """name -> sorted list of round labels that recorded it."""
    recorded = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        label = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        names = data.keys() if isinstance(data, dict) else [
            row.get("name") for row in data if isinstance(row, dict)
        ]
        for name in names:
            if name:
                recorded.setdefault(name, []).append(label)
    return recorded


def main():
    from traceframe_spark.plans import catalog_queries, catalog_oracle_sql

    registry = list(catalog_queries().keys())
    oracles = set(catalog_oracle_sql())
    recorded = load_recorded()

    never = [n for n in registry if n not in recorded]
    show_all = "--all" in sys.argv

    print(f"registry: {len(registry)} queries "
          f"({sum(1 for n in registry if n in oracles)} oracle-backed, "
          f"{sum(1 for n in registry if n not in oracles)} rows-only)")
    print(f"recorded at least once: {len(registry) - len(never)}")
    print(f"never recorded: {len(never)}")
    if never:
        print("\nNEVER-RECORDED (rotate these into the registry head-50):")
        for n in never:
            kind = "oracle" if n in oracles else "rows-only"
            print(f"  {n:32s} [{kind}]  head-pos={registry.index(n) + 1}")
    if show_all:
        print("\nFULL LEDGER:")
        for i, n in enumerate(registry, 1):
            kind = "oracle" if n in oracles else "rows-only"
            rounds = ",".join(recorded.get(n, [])) or "-"
            print(f"  {i:3d} {n:32s} [{kind:9s}] {rounds}")
    # head-50 composition check: the driver records only this prefix
    head = registry[:50]
    head_never = [n for n in head if n not in recorded]
    print(f"\nhead-50: {len(head_never)} never-recorded, "
          f"{sum(1 for n in head if n in oracles)} oracle-backed, "
          f"{sum(1 for n in head if n not in oracles)} rows-only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
