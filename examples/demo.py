"""End-to-end tour of the engine on the reference's 100-trace capture.

Run: python examples/demo.py [path-to-jaeger.json]

Walks the full surface a reference user would migrate to:
ingest → canonical tables → error triage → critical-path analytics →
service graph → operation stats → partitioned store roundtrip.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import traceframe_spark as tfs
from pyspark.sql import functions as F


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test/jaeger.json"
    spark = tfs.get_spark(app_name="traceframe-demo", master="local[4]", shuffle_partitions=4)

    # 1. ingest: one file → both canonical tables (lazy plans)
    dfT = tfs.traces_from_jaeger_file(spark, fixture)
    dfS = tfs.spans_from_jaeger_file(spark, fixture)
    print(f"traces={dfT.count()} spans={dfS.count()}")

    # 2. error triage (the reference's flagship notebook view)
    print("\n== error traces, latest first ==")
    dfT.filter("iserror").orderBy(F.col("startTime").desc()).select(
        "traceID", "traceName", "nspans", "errspans", "duration"
    ).show(5, truncate=False)

    # 3. critical path for EVERY trace, then the corpus-level breakdown
    print("== where does the wall-clock go (critical-path share) ==")
    tfs.critical_path_breakdown(dfS).show(5, truncate=False)

    # 4. service dependency graph
    print("== service call graph ==")
    tfs.service_dependencies(dfS).orderBy(F.col("n_calls").desc()).show(8, truncate=False)

    # 5. per-operation latency profile
    print("== slowest operations by p95 ==")
    tfs.operation_stats(dfS).orderBy(F.col("p95_us").desc()).select(
        "service", "operationName", "n_spans", "p95_us", "error_rate"
    ).show(5, truncate=False)

    # 6. single-trace drill-down (reference traceWithSpans/showSingleTrace)
    tid = dfT.filter("iserror").first()["traceID"]
    trace = tfs.trace_with_spans(dfT, dfS, tid)
    fig = tfs.viz.show_single_trace(trace)
    print(
        f"== drill-down {tid}: {trace['nspans']} spans, "
        f"{len(fig['critical'])} critical segments =="
    )

    # 7. partitioned store roundtrip (the 100 TB layout, in miniature)
    with tempfile.TemporaryDirectory() as d:
        tfs.sinks.write_spans(dfS, f"{d}/spans")
        back = tfs.sinks.read_spans(spark, f"{d}/spans")
        print(f"store roundtrip: {back.count()} spans")

    # 8. the other open trace formats land in the SAME canonical tables
    import json as _json

    from traceframe_spark.sources import spans_from_zipkin_file

    with tempfile.TemporaryDirectory() as d:
        zk = [
            {"traceId": "beef00000000cafe", "id": "aa001", "name": "/checkout",
             "timestamp": 1_700_000_000_000_000, "duration": 9000,
             "localEndpoint": {"serviceName": "frontend"}},
            {"traceId": "beef00000000cafe", "id": "aa002", "parentId": "aa001",
             "name": "charge", "timestamp": 1_700_000_000_002_000, "duration": 4000,
             "localEndpoint": {"serviceName": "payments"}},
        ]
        p = f"{d}/zipkin.json"
        with open(p, "w") as fh:
            _json.dump(zk, fh)
        z = spans_from_zipkin_file(spark, p)
        segs = tfs.critical_path_segments(z)
        print(
            f"zipkin ingest: {z.count()} spans -> {segs.count()} critical segments "
            "(same tables, same kernels)"
        )

    spark.stop()


if __name__ == "__main__":
    main()
