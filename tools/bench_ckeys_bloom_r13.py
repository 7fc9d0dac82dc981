"""Probe-cost A/B for the r13 exact-layer Bloom sidecar at the
100-append state — the SCALING.md evidence row.

One EXACT-ONLY manifest dedup index (with_near=False — the content-key
registry shape, where the exact layer IS the store) takes N
`append_dedup_index` folds of --docs-per-append docs each, so the ckey
layer holds hundreds of thousands of md5-width rows across N+1 live
directories — the state where a point probe's layer read actually
costs something (at toy layer sizes the prefilter's fixed overhead — a
words read + k broadcast joins + one delta-bounded materialization —
exceeds the layer read it avoids; that regime is measured and reported
too, it is WHY the sidecar only pays at scale). Two probe deltas:

- ``fresh`` (20 docs, zero hits) — the healthy-feed steady state the
  prefilter exists for: every ckey misses the Bloom, the exact layer
  is PROVEN hit-free without reading it;
- ``mixed`` (20 fresh + 5 clones) — the prefilter narrows the exact
  join to probable members but still pays the layer read.

Each delta probes (a) with ``bloom_prefilter=True`` and (b) with the
default ``False``, at the uncompacted (between-cadence) AND compacted
(steady-state) store. Answers are asserted identical first, then each
arm times ``--probes`` runs. Prints one JSON line. The measured
verdict at this scale is that the prefilter does NOT pay (0.5-0.7x):
its ~3 fixed bounded jobs cost more than the 210k-row ckey read they
avoid — which is WHY dedup_against_index defaults it off; the filter
stays n_bits/32 rows while the layer grows linearly, so the crossover
sits where the exact scan dominates the probe (tens of millions of
stored keys).

Usage: python tools/bench_ckeys_bloom_r13.py [--appends 100] [--probes 5]
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

from traceframe_spark.operators import dedup_index as di  # noqa: E402
from traceframe_spark.session import get_spark  # noqa: E402
from traceframe_spark.streaming import manifest_store as MS  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=50)
    ap.add_argument("--docs-per-append", type=int, default=4000)
    ap.add_argument("--snapshot", type=int, default=10000)
    ap.add_argument("--probes", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="ckb_ab_")
    idx = f"{root}/idx"
    di.write_dedup_index(
        _docs(spark, [(i, f"snapshot doc {i} " * 12) for i in range(args.snapshot)]),
        idx, n_hashes=32, bands=8, protocol="manifest", with_near=False,
    )
    dpa = args.docs_per_append
    for b in range(args.appends):
        di.append_dedup_index(
            _docs(spark, [(1_000_000 + b * dpa + j, f"fold {b} doc {j} " * 12)
                          for j in range(dpa)]),
            idx,
        )
    man = MS._latest_manifest(spark, idx)

    fresh = _docs(
        spark, [(90000 + i, f"probe-only text {i} " * 12) for i in range(20)]
    )
    mixed = fresh.unionByName(
        _docs(spark, [(95000 + j, f"fold 7 doc {j} " * 12) for j in range(5)])
    )

    def run(delta, m, bloom):
        return sorted(
            r["doc_id"]
            for r in di.dedup_against_index(
                delta, idx, near_dup=False, man=m, bloom_prefilter=bloom
            ).collect()
        )

    out = {
        "appends": args.appends,
        "stored_ckeys": args.snapshot + args.appends * dpa,
        "live_dirs_exact": len(man["layers"]["exact"]),
        "states": {},
    }

    def measure(state, man_state):
        rows = {}
        for name, delta in (("fresh", fresh), ("mixed", mixed)):
            assert run(delta, man_state, True) == run(delta, man_state, False), name
            row = {}
            for arm, bloom in (("bloom", True), ("no_bloom", False)):
                ts = []
                for _ in range(args.probes):
                    t0 = time.time()
                    run(delta, man_state, bloom)
                    ts.append(time.time() - t0)
                row[arm] = round(sum(ts) / len(ts), 3)
            row["speedup"] = round(row["no_bloom"] / row["bloom"], 2)
            rows[name] = row
        out["states"][state] = rows

    # uncompacted: N+1 live dirs per layer (between-cadence worst case)
    measure("uncompacted", man)
    # compacted: the steady state the r12 compact_every cadence holds a
    # long-running stream near (one dir per layer, bloom OR-folded)
    MS.compact_manifest_layers(spark, idx)
    measure("compacted", MS._latest_manifest(spark, idx))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
