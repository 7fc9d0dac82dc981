"""Event-analytics plans: funnel conversion, cohort retention, running
totals — the product-analytics layer a trace/event store is queried with
(reference scope: the events the reference models as spans/logs; these
queries extend §2.D windows/aggregations to ordered-behavior analysis).

Every query is oracle-backed. ``events.ts`` arrives as long *nanoseconds*
in Spark (``spark.sql.legacy.parquet.nanosAsLong``, see
``catalog.load_table``) and as TIMESTAMP in DuckDB; day arithmetic
bridges via ``floor(ts / 86400e9)`` vs ``floor(epoch(ts) / 86400)``.

Scale notes (100 TB):

- The funnel computes all three stage timestamps with *unbounded* window
  aggregates over one ``partitionBy(user_id)`` — a single hash shuffle;
  the three Window nodes reuse the same exchange (no sort needed for
  unbounded min). The final stage-count rollup is a map-side partial
  aggregation down to one row.
- Cohort retention is two aggregations sharing the user_id shuffle
  (per-user first-day, then per-user-day distinct activity), then a
  low-cardinality (cohort_day, day_offset) rollup — the classic shape
  that survives any row count because output cardinality is bounded by
  days², not users.
- The running total is one window per user; skewed users are bounded by
  their own event counts, and AQE handles hot partitions. Output is
  capped by predicate, not collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark.plans.catalog import load_table, qint

NS_PER_DAY = 86_400 * 1_000_000_000


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel: a user converts a stage
    only with an event at-or-after their previous stage's first event.
    One row: users entering each stage."""
    # stage thresholds compare at us precision — the oracle's TIMESTAMP
    # resolution — so a same-us event with a smaller ns fraction still
    # clears its stage on both engines
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000")
    )
    w = Window.partitionBy("user_id")
    t_v = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t_view", t_v)
    t_c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_c)
    t_p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_p)
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view_users"),
        F.count("t_click").alias("n_click_users"),
        F.count("t_purchase").alias("n_purchase_users"),
    )


SQL_FUNNEL_CONVERSION = """
WITH staged AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
    FROM events
),
staged2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
                  OVER (PARTITION BY user_id) AS t_click
    FROM staged
),
staged3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
                  OVER (PARTITION BY user_id) AS t_purchase
    FROM staged2
),
per_user AS (
    SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
           max(t_purchase) AS t_purchase
    FROM staged3 GROUP BY user_id
)
SELECT count(t_view) AS n_view_users,
       count(t_click) AS n_click_users,
       count(t_purchase) AS n_purchase_users
FROM per_user
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: users grouped by first-activity
    day; for each cohort, how many were active again N days later
    (offsets 0-7). Two aggregations share the user_id shuffle; the final
    rollup's cardinality is bounded by days x offsets, not users."""
    e = load_table(spark, sf_dir, "events")
    # integer div, not floor(ts/day): double division of ~1.7e18 ns
    # loses bits past 2^53 and can misbucket near day boundaries
    days = e.select(
        "user_id", F.expr(f"ts div {NS_PER_DAY}").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    with_cohort = days.withColumn("cohort_day", F.min("day").over(w))
    return (
        with_cohort.withColumn("day_offset", (F.col("day") - F.col("cohort_day")))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
    FROM events
),
with_cohort AS (
    SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
    FROM days
)
SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
FROM with_cohort
WHERE day - cohort_day <= 7
GROUP BY cohort_day, day - cohort_day
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user spend: running-sum window in (ts, event_id)
    order. Both engines add left-to-right over the same deterministic
    order, so the IEEE double sums agree bit-for-bit before quantizing."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        # order at us precision: the oracle's TIMESTAMP ordering; raw-ns
        # order could sum same-us ties in a different order than DuckDB
        .withColumn("ts_us", F.expr("ts div 1000"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        qint(F.sum("value").over(w), 2).alias("run_total_c"),
    )


SQL_RUNNING_TOTAL = """
SELECT user_id, event_id,
       CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) * 100 + 0.5) AS BIGINT)
           AS run_total_c
FROM events
WHERE user_id < 20
"""


EVENTS_QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "running_total": q_running_total,
}

EVENTS_ORACLE_SQL = {
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "cohort_retention": SQL_COHORT_RETENTION,
    "running_total": SQL_RUNNING_TOTAL,
}
