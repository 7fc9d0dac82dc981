"""Gap-based sessionization on Spark's native ``session_window``.

The batch catalog already sessionizes with the lag + cumulative-sum
window idiom (``plans/advanced.py::q_sessionize``) — the portable ANSI
formulation every engine can run. This module is the Spark-native form:
``F.session_window`` keeps the grouping inside one hash aggregation
(state-store backed under streaming) instead of a sort window followed
by two aggregations, and it is the ONLY form that works incrementally
over an unbounded stream.

Boundary semantics (pinned in tests): a session's window ``[ts,
ts+gap]`` is CLOSED on the right — an event arriving at exactly
``prev + gap`` merges into the session; only a strictly larger gap
splits. That is identical to the lag idiom's ``> gap`` split rule, so
the two formulations agree row-for-row and the catalog query's DuckDB
oracle is the same lag-idiom SQL.

Scale notes (100 TB): one shuffle on the grouping keys; streaming state
is bounded by the watermark (sessions older than watermark close and
evict). No Python in the loop — session assignment is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rows from an events frame whose ``ts_col`` is long
    nanoseconds (the engine's events contract): one row per
    (user, session) with start/end/size.

    Works identically on a batch DataFrame and on a streaming source
    (add ``withWatermark`` upstream for state eviction — see
    :func:`sessionize_stream`).
    """
    ev = events.withColumn("_tstamp", F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return (
        ev.groupBy(user_col, F.session_window("_tstamp", gap).alias("session"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.unix_micros(F.col("session.start")).alias("session_start_us"),
            F.unix_micros(F.col("session.end")).alias("session_end_us"),
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: watermarked ``session_window`` over an
    unbounded event feed. A session closes (emits, state evicted) once
    the watermark passes its end — late events inside the watermark
    still merge into their session; later ones are dropped, the
    standard lateness contract."""
    ev = events.withColumn("_tstamp", F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return (
        ev.withWatermark("_tstamp", watermark)
        .groupBy(user_col, F.session_window("_tstamp", gap).alias("session"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.unix_micros(F.col("session.start")).alias("session_start_us"),
            F.unix_micros(F.col("session.end")).alias("session_end_us"),
            "n_events",
        )
    )
