"""Scale-shape checks: the bench's synthetic span generator at sf0.001
(~6k lineitem children + 1.5k roots) through the critical-path kernel,
validating global invariants in aggregate — the same assertions that hold
for 420 fixture spans must hold for every generated trace."""

from __future__ import annotations

from pyspark.sql import functions as F

from bench import synthetic_spans
from traceframe_spark.operators.critical_path import critical_path_segments

SF = "/root/testdata/sf0.001"


def test_synthetic_spans_critical_path_invariants(spark):
    spans = synthetic_spans(spark, SF)
    n_traces = spans.filter(F.col("parent") == "").count()
    segs = critical_path_segments(spans)

    roots = spans.filter(F.col("parent") == "").select(
        "traceID",
        F.col("startTime").alias("root_start"),
        F.col("duration").alias("root_dur"),
    )
    per_trace = (
        segs.groupBy("traceID")
        .agg(
            F.count("*").alias("nsegs"),
            F.sum("seg_duration").alias("crit_total"),
            F.min("seg_start").alias("first_start"),
            F.max(F.col("seg_start") + F.col("seg_duration")).alias("last_end"),
        )
        .join(roots, "traceID")
    )
    bad = per_trace.filter(
        (F.col("nsegs") < 1)
        | (F.col("crit_total") > F.col("root_dur"))
        | (F.col("first_start") != F.col("root_start"))
        | (F.col("last_end") > F.col("root_start") + F.col("root_dur"))
    ).count()
    assert bad == 0
    assert per_trace.count() == n_traces

    # nested children ⇒ segments exactly partition each root's duration
    mismatch = per_trace.filter(F.col("crit_total") != F.col("root_dur")).count()
    assert mismatch == 0
