"""A/B the sig_d pinning form in dedup_against_index (r15 item 1).

The r14 verdict flagged dedup_index_probe 1.80 -> 3.01 s: the eager
localCheckpoint of the delta signatures is a serializing barrier on the
standing-store probe path. Candidates (TF_AB_SIGD):

- ckpt_eager: r14 form — eager localCheckpoint (barrier, truncated plan)
- ckpt_lazy:  localCheckpoint(eager=False) — truncated plan, first
  consumer materializes, concurrent broadcast builds share blocks via
  BlockInfoManager write locks (no barrier)
- persist:    lazy persist, same sharing, full lineage kept
- none:       no pin — racing broadcast builds recompute concurrently
              (the r13 accidental behavior)

Each run is ONE fresh session, same order: standing store built once
(untimed), then best-of-5 probes through the noop sink — the bench row's
methodology — plus best-of-5 of the registry's derived `.select(doc_id)`
form (persist keepalive sensitivity).

Usage: TF_AB_SIGD=<mode> python tools/ab_probe_r15.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    mode = os.environ.get("TF_AB_SIGD", "ckpt_eager")
    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup_index as di
    from traceframe_spark.plans.pipeline import _index_split
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name=f"ab-probe-{mode}")
    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = tempfile.mkdtemp(prefix=f"ab_probe_{mode}_")
    try:
        ref, delta = _index_split(spark, sf)
        dpath = root + "/near"
        di.write_dedup_index(ref, dpath)

        def best_of(thunk, n=5):
            ts = []
            for _ in range(n):
                t0 = time.time()
                thunk().write.format("noop").mode("overwrite").save()
                ts.append(round(time.time() - t0, 3))
            return ts

        from traceframe_spark.operators import dedup

        def _derived():
            out = di.dedup_against_index(delta, dpath, threshold=0.9)
            return dedup.carry_cache(out.select("doc_id"), out)

        direct = best_of(lambda: di.dedup_against_index(delta, dpath, threshold=0.9))
        derived = best_of(_derived)
        print(
            f"RESULT mode={mode} direct={direct} best={min(direct)} "
            f"derived={derived} best={min(derived)}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
