"""Phase breakdown of the dedup_index_delta / _manifest registry rows
(r15 item 5): store build vs probe plan construction vs execution.

Mirrors q_dedup_index_delta exactly, one timed iteration after a warmup,
printing per-phase wall times. Run with SPARK_GRAFT_SF_DIR set.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from traceframe_spark.operators import dedup as dd
    from traceframe_spark.operators import dedup_index as di
    from traceframe_spark.plans.pipeline import _index_split, tmp_store
    from traceframe_spark.session import get_spark

    protocol = sys.argv[1] if len(sys.argv) > 1 else "append"
    spark = get_spark(app_name=f"profile-delta-{protocol}")
    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for rep in range(3):
        ref, delta = _index_split(spark, sf_dir)
        path = tmp_store("prof_delta_") + "/idx"
        t0 = time.time()
        if protocol == "manifest":
            di.write_dedup_index(ref, path, portable=True, protocol="manifest")
        else:
            di.write_dedup_index(ref, path, portable=True)
        t1 = time.time()
        out = di.dedup_against_index(delta, path, threshold=0.9)
        res = dd.carry_cache(out.select("doc_id"), out)
        t2 = time.time()
        res.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(
            f"rep{rep}: build={t1 - t0:.2f}s  probe_plan={t2 - t1:.2f}s  "
            f"exec={t3 - t2:.2f}s  total={t3 - t0:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
