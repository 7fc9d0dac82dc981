"""Listing-cost A/B for the r12 streaming compaction cadence: how much
does a probe pay when a manifest store's layer lists have accumulated
~100 append commits, and what does `compact_every` buy back?

Two stores, both fed by the SAME append primitives the streaming loops
use (the stream machinery itself is bypassed — micro-batch scheduling
adds constant overhead that would only blur the listing signal):

- dedup index (manifest protocol): N x `append_curation_layers` of
  small doc deltas -> each layer's live directory list grows by one
  per append; probe = `dedup_against_index` of a fixed 20-doc delta.
- IVF index (manifest protocol): N x `append_to_ivf_index` of vector
  deltas steered into every list -> each list's directory list grows
  by one per append; probe = `ivf_topk_over_index`, full probe.

Each store is probed (a) uncompacted at ~N live dirs/layer and
(b) after `compact_manifest_layers` at 1 dir/layer — the state the
`compact_every` cadence holds a long-running stream near. Probe
answers are asserted identical across states (compaction must change
listing cost, never answers). Prints one JSON line with per-state
mean probe seconds and live-dir counts; the SCALING.md row cites it.

Usage: python tools/bench_compaction_r12.py [--appends 100] [--probes 5]
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


def _probe_time(fn, probes):
    times = []
    for _ in range(probes):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return sum(times) / len(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--appends", type=int, default=100)
    ap.add_argument("--probes", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup_index as di
    from traceframe_spark.operators import similarity as sim
    from traceframe_spark.session import get_spark
    from traceframe_spark.streaming import manifest_store as MS

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="bench_compaction_")
    out: dict = {"metric": "compaction_listing_ab", "appends": args.appends}

    try:
        # ---- dedup index arm -------------------------------------------
        def doc(i: int) -> tuple[int, str]:
            words = " ".join(f"w{i}_{j}" for j in range(30))
            return (i, f"doc {i} {words}")

        snap = spark.createDataFrame([doc(i) for i in range(100)], "doc_id long, text string")
        idx = f"{work}/idx"
        di.write_dedup_index(snap, idx, n_hashes=32, bands=8, protocol="manifest")
        for b in range(args.appends):
            delta = spark.createDataFrame(
                [doc(1000 + b * 5 + j) for j in range(5)], "doc_id long, text string"
            )
            di.append_curation_layers(delta, idx)
        probe_docs = spark.createDataFrame(
            [doc(50 + j) for j in range(10)] + [doc(10_000 + j) for j in range(10)],
            "doc_id long, text string",
        )

        def probe_dedup():
            return sorted(
                r["doc_id"]
                for r in di.dedup_against_index(probe_docs, idx).collect()
            )

        man = MS._latest_manifest(spark, idx)
        out["dedup_live_dirs_uncompacted"] = max(
            len(d) for d in man["layers"].values()
        )
        want = probe_dedup()
        out["dedup_probe_s_uncompacted"] = round(
            _probe_time(probe_dedup, args.probes), 3
        )
        MS.compact_manifest_layers(spark, idx)
        MS.vacuum_manifest_store(spark, idx, keep_manifests=2)
        man = MS._latest_manifest(spark, idx)
        out["dedup_live_dirs_compacted"] = max(len(d) for d in man["layers"].values())
        assert probe_dedup() == want, "compaction changed dedup answers"
        out["dedup_probe_s_compacted"] = round(
            _probe_time(probe_dedup, args.probes), 3
        )

        # ---- IVF index arm ---------------------------------------------
        def vecs(ids):
            import hashlib

            def v(i):
                return [
                    float(
                        int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16)
                        % 1999 - 999
                    )
                    for j in range(8)
                ]

            return spark.createDataFrame(
                [(i, v(i)) for i in ids], "vec_id long, embedding array<float>"
            )

        ivf = f"{work}/ivf"
        sim.write_ivf_index(
            vecs(range(200)), ivf, "vec_id", "embedding",
            n_centroids=8, protocol="manifest",
        )
        for b in range(args.appends):
            sim.append_to_ivf_index(
                vecs(range(1000 + b * 10, 1000 + b * 10 + 10)),
                ivf, "vec_id", "embedding",
            )
        q = vecs(range(5))

        def probe_ivf():
            return sorted(
                map(tuple, sim.ivf_topk_over_index(
                    spark, ivf, q, "vec_id", "embedding", k=5, nprobe=8
                ).collect())
            )

        man = MS._latest_manifest(spark, ivf)
        out["ivf_live_dirs_uncompacted"] = max(len(d) for d in man["layers"].values())
        want_ivf = probe_ivf()
        out["ivf_probe_s_uncompacted"] = round(_probe_time(probe_ivf, args.probes), 3)
        MS.compact_manifest_layers(spark, ivf)
        MS.vacuum_manifest_store(spark, ivf, keep_manifests=2)
        man = MS._latest_manifest(spark, ivf)
        out["ivf_live_dirs_compacted"] = max(len(d) for d in man["layers"].values())
        assert probe_ivf() == want_ivf, "compaction changed IVF answers"
        out["ivf_probe_s_compacted"] = round(_probe_time(probe_ivf, args.probes), 3)

        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
