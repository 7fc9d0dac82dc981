"""Temporal join + distinct-agg coverage: as-of join, banded range join,
lag/lead gap analysis, exact distinct aggregation, grouping sets.

These close the remaining SURVEY §2.D/§2.E gaps the reference's category
audit names but the first catalog pass did not exercise: the as-of /
range join family ("custom operators Spark lacks" — implemented as
compositions of built-in ops, per the §7.3 custom-vs-built-in rule),
lag/lead analytics (§2.E class 12), COUNT(DISTINCT) and GROUPING SETS
(§2.D aggregations).

Scale stance (100 TB):

- The as-of join is the union-and-window formulation: ONE shuffle on the
  partition key (user_id), no inequality join, no per-row probe. This is
  the formulation that survives a 1000-executor scale-up — an
  inequality-condition join would degenerate to a broadcast nested loop
  over the full fact table.
- The range join is *banded*: the interval side is small (a generated
  window dimension), so Spark plans a broadcast nested-loop join whose
  inner side is O(windows); each event row tests against a constant-size
  broadcast list. For interval×interval at scale, band both sides by
  floor(ts / band) and equi-join on the band key first (the idiom is in
  ``operators/skew.py``'s bucketing notes).
- Events ``ts`` is TIMESTAMP(NANOS) parquet, read as long nanoseconds on
  the Spark side (``spark.sql.legacy.parquet.nanosAsLong``) and as
  TIMESTAMP by DuckDB; every derived time quantity is therefore aligned
  to integer *microseconds* on both sides before comparison.

Reference scope note: the reference has no temporal joins at all
(SURVEY §2.D "joins: only degenerate forms", traceframe.py:462,702-703);
this module is part of the beyond-parity §2.D surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark import api
from traceframe_spark.plans.catalog import load_table, qint, tmp_store

NS_PER_US = 1_000
NS_PER_DAY = 86_400 * 1_000_000_000
# 2024-01-01T00:00:00Z in nanoseconds since epoch — the events table's
# 30-day January 2024 window (TESTDATA.md).
JAN1_NS = 1_704_067_200 * 1_000_000_000


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every ``purchase`` event, the most recent ``click``
    by the same user at-or-before the purchase timestamp.

    Union-and-window formulation: tag both sides, union, and within each
    user sweep in time order carrying the last click forward with
    ``last(..., ignorenulls=True)``. Ordering key ``(ts, side, event_id)``
    with clicks first at equal ts makes the result total-order
    deterministic (same-ts click is visible to the purchase; the
    largest-event_id click wins a same-ts tie among clicks).
    """
    e = load_table(spark, sf_dir, "events")  # ts: long nanoseconds
    # Truncate to µs FIRST (integer div — double division of ~1.7e18 ns
    # loses low bits past 2^53): the oracle's TIMESTAMP is µs precision,
    # so both ordering and arithmetic must happen on the truncated value.
    ts_us = F.expr("ts div 1000").alias("ts_us")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", ts_us, "event_id", F.lit(0).alias("side")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", ts_us, "event_id", F.lit(1).alias("side")
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_id = F.when(F.col("side") == 0, F.col("event_id"))
    click_ts = F.when(F.col("side") == 0, F.col("ts_us"))
    swept = tagged.select(
        "user_id",
        "ts_us",
        "event_id",
        "side",
        F.last(click_id, ignorenulls=True).over(w).alias("click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("click_ts_us"),
    )
    return swept.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    )


SQL_ASOF_JOIN = """
WITH tagged AS (
    SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'
),
swept AS (
    SELECT user_id, ts, event_id, side,
           last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER w AS click_id,
           last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER w AS click_ts
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, click_id,
       date_diff('microsecond', click_ts, ts) AS gap_us
FROM swept WHERE side = 1
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: 3-day windows sliding by 1 day over January
    2024, joined to events on interval containment; per-window event
    count and value sum.

    The window dimension is generated (30 rows) and broadcast, so the
    inequality join is a broadcast nested loop whose inner side is O(30)
    — the correct physical plan when one side is tiny. Events outside
    every window are dropped (inner join), windows with no events are
    absent, matching the oracle.
    """
    e = load_table(spark, sf_dir, "events")
    windows = spark.range(30).select(
        F.col("id").alias("win_id"),
        (F.lit(JAN1_NS) + F.col("id") * NS_PER_DAY).alias("start_ns"),
        (F.lit(JAN1_NS) + (F.col("id") + 3) * NS_PER_DAY).alias("end_ns"),
    )
    joined = e.join(
        F.broadcast(windows),
        (e.ts >= windows.start_ns) & (e.ts < windows.end_ns),
    )
    return joined.groupBy("win_id").agg(
        F.count("*").alias("n_events"),
        qint(F.sum("value"), 2).alias("value_sum"),
    )


SQL_RANGE_JOIN = """
WITH windows AS (
    SELECT w.win_id,
           TIMESTAMP '2024-01-01' + w.win_id * INTERVAL 1 DAY AS start_ts,
           TIMESTAMP '2024-01-01' + (w.win_id + 3) * INTERVAL 1 DAY AS end_ts
    FROM (SELECT unnest(generate_series(0, 29)) AS win_id) w
)
SELECT w.win_id, count(*) AS n_events,
       CAST(floor(sum(e.value) * 100 + 0.5) AS BIGINT) AS value_sum
FROM events e JOIN windows w ON e.ts >= w.start_ts AND e.ts < w.end_ts
GROUP BY w.win_id
"""


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (§2.E class 12): per-user inter-event gaps —
    the trace-analytics "time since previous span" idiom — aggregated to
    per-user mean/max gap and next-event lookahead count."""
    e = load_table(spark, sf_dir, "events").withColumn(
        # µs truncation before differencing, matching the oracle's
        # TIMESTAMP precision (see q_asof_join note on integer div).
        "ts_us",
        F.expr("ts div 1000"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    with_gaps = e.select(
        "user_id",
        "event_type",
        gap_us.alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return with_gaps.groupBy("user_id").agg(
        qint(F.avg("gap_us"), 0).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum(
            F.when((F.col("event_type") == "error") & (F.col("next_type") == "error"), 1)
            .otherwise(0)
        ).alias("error_bursts"),
    )


SQL_EVENT_GAPS = """
WITH g AS (
    SELECT user_id, event_type,
           date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(floor(avg(gap_us) + 0.5) AS BIGINT) AS avg_gap_us,
       max(gap_us) AS max_gap_us,
       CAST(sum(CASE WHEN event_type = 'error' AND next_type = 'error'
                     THEN 1 ELSE 0 END) AS BIGINT) AS error_bursts
FROM g
GROUP BY user_id
"""


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (§2.D aggregations): per event type,
    distinct users and distinct active days. Spark plans multi-distinct
    via EXPAND (one pass, partial aggregation preserved) — at 100 TB this
    is the exact path; `approx_count_distinct` (HLL) is the cheap
    alternative when ±2% suffices (exercised in tests, not oracle-
    comparable across engines)."""
    e = load_table(spark, sf_dir, "events")
    # integer div, not floor(ts/day): double division of ~1.7e18 ns loses
    # bits past 2^53 and can misbucket near day boundaries
    day = F.expr(f"ts div {NS_PER_DAY}").alias("day")
    return (
        e.select("event_type", "user_id", day)
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct("day").alias("n_days"),
            F.count("*").alias("n_events"),
        )
    )


SQL_COUNT_DISTINCT = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS n_days,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (§2.D aggregations beyond rollup/cube): explicit
    grouping combinations in one pass over lineitem (Spark EXPAND — each
    input row fans out once per set, partial aggs still map-side)."""
    # the ONE query text runs on both engines (the SQL facade makes the
    # grouping-sets class literally engine-portable); a drifted copy
    # here would silently diverge from the oracle
    return api.sql(spark, sf_dir, SQL_GROUPING_SETS)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(floor(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS qty_c
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew path under the correctness gate: two-phase salted
    aggregation (operators/skew.salted_agg) must produce EXACTLY the
    plain GROUP BY result — the oracle is the unsalted SQL. At scale the
    salt splits a hot key across n_salts reducers; decomposable
    aggregates (count/sum/min/max) merge losslessly."""
    from traceframe_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("l_orderkey", "count"),
            "max_qty": ("l_quantity", "max"),
            "min_ship": ("l_shipdate", "min"),
        },
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        "n",
        qint(F.col("max_qty"), 2).alias("max_qty_q"),
        F.col("min_ship").cast("date").cast("string").alias("min_ship_d"),
    )


SQL_SALTED_GROUP_AGG = """
SELECT l_returnflag, count(l_orderkey) AS n,
       CAST(floor(max(l_quantity) * 100 + 0.5) AS BIGINT) AS max_qty_q,
       CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS min_ship_d
FROM lineitem
GROUP BY l_returnflag
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join under the correctness gate: salting the big
    side and replicating the small side (operators/skew.salted_join)
    must produce EXACTLY the plain join — the oracle is the unsalted
    SQL. Quantities go through integer cents before the sum so the
    group totals are order-independent and hash-portable."""
    from traceframe_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), qint(F.col("l_quantity"), 2).alias("qty_c")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, on=["okey"], n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("qty_c").alias("qty_c_sum"))
    )


SQL_SALTED_JOIN = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c_sum
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: events pre-aggregate into
    1-minute buckets (count + sum + min/max), and the hourly answer is
    computed FROM THE ROLLUP, never from raw rows. The oracle aggregates
    raw events directly at the hour — the query proves the two-level
    rollup is lossless for decomposable aggregates.

    At 100 TB this is the pattern that keeps dashboards off the raw
    table: the 1-minute layer is ~raw/1000 rows, written once (ideally
    by the streaming path), and every coarser resolution derives from it
    map-side. Bucketing is integer division on the long-ns timestamp —
    no timezone, no UDF, stays in codegen.
    """
    from traceframe_spark.operators import rollup as R

    e = load_table(spark, sf_dir, "events")
    rollup_1m = R.rollup_events(e, R.MINUTE_NS, ["event_type"], "value")
    hourly = R.coarsen(rollup_1m, R.HOUR_NS, ["event_type"], from_bucket_ns=R.MINUTE_NS)
    return hourly.select(
        F.expr("bucket_ns div 1000").alias("hour_us"),
        "event_type",
        F.col("n").alias("n_events"),
        qint(F.col("value_sum"), 2).alias("value_sum_q"),
        qint(F.col("value_min"), 4).alias("value_min_q"),
        qint(F.col("value_max"), 4).alias("value_max_q"),
    )


SQL_TIME_ROLLUP = """
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
       event_type,
       count(value) AS n_events,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS value_sum_q,
       CAST(floor(min(value) * 10000 + 0.5) AS BIGINT) AS value_min_q,
       CAST(floor(max(value) * 10000 + 0.5) AS BIGINT) AS value_max_q
FROM events
GROUP BY 1, 2
"""


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (SURVEY §2.B12, the oracle-checkable form of the tag-column
    pivot): per-user event counts, one column per event type. The pivot
    values are ENUMERATED — Spark's ``pivot(col)`` without values runs an
    extra distinct job and makes the schema data-dependent, which is the
    same unbounded-width trap as the reference's tag pivot; at 100 TB the
    column set must be declared."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count("event_id"))
    )
    # null → 0 and stable names on both sides
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly 20 documents per
    language, chosen by hash order — the reproducible, engine-portable
    form of ``sampleBy`` (whose RNG can't match across engines). The
    hash is md5 because the oracle engine lacks xxhash64; in production
    prefer ``F.xxhash64`` (cheaper, same idiom). One window pass; at
    scale this is the standard per-stratum top-N shuffle, no driver
    involvement."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("rn"))
    )


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, rn FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
WHERE rn <= 20
"""


def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event_type: events whose value sits
    ≥ 3 sample standard deviations from their type's mean. The
    trace-analytics use is identical (latency anomalies per operation);
    here it runs on the oracle-checkable events table. One windowed
    aggregation — no self-join of the stats back onto the rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        e.select("event_id", "event_type", "value", qint(z, 4).alias("z_q"))
        .filter((F.col("z_q") >= 30000) | (F.col("z_q") <= -30000))
    )


SQL_VALUE_ANOMALIES = """
SELECT event_id, event_type, value,
       CAST(floor((value - avg(value) OVER w) / stddev_samp(value) OVER w * 10000 + 0.5) AS BIGINT) AS z_q
FROM events
WINDOW w AS (PARTITION BY event_type)
QUALIFY z_q >= 30000 OR z_q <= -30000
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width latency-style histogram: per event_type, bucket the
    value column at width 5 and count + sum per bucket. The aggregation
    is fully map-side-combinable (bucket count is bounded)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 5.0).cast("long")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), qint(F.sum("value"), 2).alias("sum_q"))
    )


SQL_VALUE_HISTOGRAM = """
SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_q
FROM events
GROUP BY 1, 2
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON access: extract props.k (a JSON text column)
    per event and aggregate per event_type — the engine-side pattern for
    property bags that aren't worth a typed column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_JSON_PROPS = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-event moving average of value per event_type — the
    rolling-window frame (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    the ranking/session queries don't cover. Values go through integer
    cents before the avg so the frame sum is exact and both engines
    divide the same integer — double summation order inside a window
    frame is NOT portable (Spark sums in frame order, DuckDB uses a
    segment tree). One window shuffle on event_type; at scale this is
    the per-key sorted scan Spark's WindowExec already streams."""
    # frame order at us precision (the oracle's TIMESTAMP resolution):
    # raw-ns order could frame same-us ties differently than DuckDB
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    cents = qint(F.col("value"), 2)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        qint(F.avg(cents).over(w) / 100.0, 4).alias("ma_q"),
    )


SQL_MOVING_AVG = """
SELECT event_id, event_type,
       CAST(floor(avg(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  / 100.0 * 10000 + 0.5) AS BIGINT) AS ma_q
FROM events
"""


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: each source kept at its own rate
    (cycling 1.0 / 0.5 / 0.25 / 0.1 by source index), hash-ordered so
    the sample is deterministic and engine-portable. The rate-based
    sibling of q_stratified_sample's fixed-N."""
    from traceframe_spark.operators.sampling import weighted_domain_sample

    d = load_table(spark, sf_dir, "documents")
    cycle = [1.0, 0.5, 0.25, 0.1]
    # derive the rate table from the sources actually present (a bounded
    # dimension discovery, like the tag-key scan) — a hardcoded src0..19
    # dict would silently default any NEW source to rate 1.0 while the
    # oracle derives its rate from the source index
    sources = [r["source"] for r in d.select("source").distinct().collect()]
    # validate the src<N> shape explicitly: the oracle hard-fails on a
    # non-numeric CAST too, so a null/misnamed source must be a CLEAR
    # error here, not a ValueError out of int() at plan-build time
    import re

    bad = [s for s in sources if s is None or not re.fullmatch(r"src(\d+)", s)]
    if bad:
        raise ValueError(
            f"domain_mix requires 'src<N>' source names; found {bad!r} — "
            "pass an explicit rate table via weighted_domain_sample for "
            "non-conforming corpora"
        )
    rates = {s: cycle[int(s[3:]) % 4] for s in sources}
    return weighted_domain_sample(d, rates).select("doc_id", "source")


SQL_DOMAIN_MIX = """
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS n,
           CASE CAST(substr(source, 4) AS INT) % 4
                WHEN 0 THEN CAST(1.0 AS DOUBLE) WHEN 1 THEN CAST(0.5 AS DOUBLE)
                WHEN 2 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.1 AS DOUBLE) END AS rate
    FROM documents
)
SELECT doc_id, source FROM ranked WHERE rn <= ceil(rate * n)
"""


def q_p95_from_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-but-deterministic p95 from mergeable histogram
    partials: events bin into a 1-minute × unit-width histogram rollup,
    partials merge per event_type, and the quantile is the first bin
    whose running count clears 95% — error ≤ bin width, identical
    across engines and refreshes (unlike probabilistic sketches). The
    oracle bins raw events directly, proving the rollup→merge→quantile
    chain is lossless."""
    from traceframe_spark.operators import rollup as R

    e = load_table(spark, sf_dir, "events")
    hist = R.histogram_rollup(e, R.MINUTE_NS, ["event_type"], "value", bin_width=1.0)
    q = R.quantile_from_histogram(hist, ["event_type"], 0.95, bin_width=1.0)
    return q.select("event_type", qint(F.col("q95_upper"), 4).alias("q95_upper_q"))


SQL_P95_FROM_ROLLUP = """
WITH bins AS (
    SELECT event_type, CAST(floor(value / 1.0) AS BIGINT) AS bin, count(*) AS n
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, bin,
           sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           sum(n) OVER (PARTITION BY event_type) AS total
    FROM bins
)
SELECT event_type,
       CAST(floor((min(bin) + 1) * 1.0 * 10000 + 0.5) AS BIGINT) AS q95_upper_q
FROM ranked
WHERE cum >= 0.95 * total
GROUP BY event_type
"""




def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture (operators/sampling.py::
    temperature_domain_sample, T=0.5, budget 300): the multilingual-
    training recipe that flattens the natural domain distribution
    toward uniform. The oracle replays counts → sqrt-weights →
    normalization → per-domain quota → md5 hash-rank selection."""
    from traceframe_spark.operators.sampling import temperature_domain_sample

    d = load_table(spark, sf_dir, "documents")
    return temperature_domain_sample(d, budget=300, temperature=0.5).select(
        "doc_id", "source"
    )


def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via GROUPED HyperLogLog (sketch.hll_bucket_rho
    grouped on (day, bucket) + hll_estimate_by) next to the exact
    count — the classic fixed-memory uniques rollup: per-day registers
    are ≤1024 rows each and merge losslessly into weekly/monthly
    uniques (union+max) without re-reading events. The oracle rebuilds
    the identical registers and lands on the identical estimate."""
    from traceframe_spark.operators import sketch

    e = load_table(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000").alias("day")
    b, r = sketch.hll_bucket_rho(F.col("user_id"), p=10)
    regs = (
        e.select(day, b.alias("bucket"), r.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    est = sketch.hll_estimate_by(regs, ["day"], p=10)
    exact = e.groupBy(F.expr("ts div 86400000000000").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "day").select(
        "day", "n_nonempty", "n_empty", qint(F.col("est"), 2).alias("est_q"),
        "exact_distinct",
    )


SQL_HLL_DAILY_USERS = """
WITH keyed AS (
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(user_id AS VARCHAR) AS k
    FROM events
),
regs AS (
    SELECT day, ('0x' || substr(md5(k), 1, 8))::BIGINT % 1024 AS bucket,
           max(CASE WHEN v = 0 THEN 41 ELSE 41 - length(bin(v)) END) AS rho_max
    FROM (SELECT day, k,
                 ('0x' || substr(md5('rho' || '#' || k), 1, 10))::BIGINT AS v
          FROM keyed)
    GROUP BY 1, 2
),
agg AS (
    SELECT day, CAST(count(*) AS BIGINT) AS n_nonempty,
           sum(power(2.0, -rho_max)) AS inv_sum
    FROM regs GROUP BY day
),
est AS (
    SELECT day, n_nonempty, CAST(1024 - n_nonempty AS BIGINT) AS n_empty,
           (0.7213 / (1.0 + 1.079 / 1024)) * 1024.0 * 1024.0
               / (inv_sum + (1024 - n_nonempty)) AS raw
    FROM agg
),
ex AS (
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY 1
)
SELECT e.day, e.n_nonempty, e.n_empty,
       CAST(floor(CASE WHEN e.raw <= 2560.0 AND e.n_empty > 0
                       THEN 1024.0 * ln(1024.0 / e.n_empty)
                       ELSE e.raw END * 100 + 0.5) AS BIGINT) AS est_q,
       ex.exact_distinct
FROM est e JOIN ex ON ex.day = e.day
"""


def q_hll_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users from STORED daily HLL registers — the
    register-merge headline made a query: daily (day, bucket, rho_max)
    registers are written to a parquet store (the exact shape
    streaming/spans.stream_to_hll_store maintains continuously), read
    BACK, and folded into Monday-aligned weeks with the same
    union+grouped-max merge (operators/sketch.hll_merge's fold, grouped
    by week) — the events table is never re-read for the weekly
    estimate. Cost at any corpus size: ≤ 2^p rows per stored day.

    Week id is pure integer arithmetic on the epoch-day number —
    ``(day + 3) div 7`` (epoch day 0 is a Thursday, so +3 aligns weeks
    to Mondays) — identical in Spark and DuckDB, no date-function
    semantics to diverge on. The oracle rebuilds the registers grouped
    by (week, bucket) directly: max is associative, so daily-then-weekly
    equals weekly-direct REGISTER-exactly, and the dyadic 2^-rho sum
    makes the estimate itself engine-exact (see hll_estimate).

    The exact per-week distinct count rides along as the accuracy
    column, read from events ONCE (the same scan that built the daily
    store; a production pipeline already has it)."""
    from traceframe_spark.operators import sketch

    e = load_table(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000").alias("day")
    b, r = sketch.hll_bucket_rho(F.col("user_id"), p=10)
    daily = (
        e.select(day, b.alias("bucket"), r.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    # the store roundtrip is the point of the query: weekly estimates
    # must derive from PERSISTED daily registers, not the events scan
    store = tmp_store("hll_daily_store_") + "/regs"
    daily.repartition("day").write.mode("overwrite").partitionBy("day").parquet(store)
    stored = spark.read.parquet(store)
    weekly = (
        stored.withColumn("week", F.expr("(day + 3) div 7"))
        .groupBy("week", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    est = sketch.hll_estimate_by(weekly, ["week"], p=10)
    exact = e.groupBy(
        F.expr("(ts div 86400000000000 + 3) div 7").alias("week")
    ).agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    return est.join(exact, "week").select(
        "week",
        "n_nonempty",
        "n_empty",
        qint(F.col("est"), 2).alias("est_q"),
        "exact_distinct",
    )


SQL_HLL_WEEKLY_USERS = """
WITH keyed AS (
    SELECT CAST(floor((floor(epoch(ts) / 86400) + 3) / 7) AS BIGINT) AS week,
           CAST(user_id AS VARCHAR) AS k
    FROM events
),
regs AS (
    SELECT week, ('0x' || substr(md5(k), 1, 8))::BIGINT % 1024 AS bucket,
           max(CASE WHEN v = 0 THEN 41 ELSE 41 - length(bin(v)) END) AS rho_max
    FROM (SELECT week, k,
                 ('0x' || substr(md5('rho' || '#' || k), 1, 10))::BIGINT AS v
          FROM keyed)
    GROUP BY 1, 2
),
agg AS (
    SELECT week, CAST(count(*) AS BIGINT) AS n_nonempty,
           sum(power(2.0, -rho_max)) AS inv_sum
    FROM regs GROUP BY week
),
est AS (
    SELECT week, n_nonempty, CAST(1024 - n_nonempty AS BIGINT) AS n_empty,
           (0.7213 / (1.0 + 1.079 / 1024)) * 1024.0 * 1024.0
               / (inv_sum + (1024 - n_nonempty)) AS raw
    FROM agg
),
ex AS (
    SELECT CAST(floor((floor(epoch(ts) / 86400) + 3) / 7) AS BIGINT) AS week,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY 1
)
SELECT e.week, e.n_nonempty, e.n_empty,
       CAST(floor(CASE WHEN e.raw <= 2560.0 AND e.n_empty > 0
                       THEN 1024.0 * ln(1024.0 / e.n_empty)
                       ELSE e.raw END * 100 + 0.5) AS BIGINT) AS est_q,
       ex.exact_distinct
FROM est e JOIN ex ON ex.week = e.week
"""


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement
    (operators/sampling.priority_sample): top-100 documents by
    Efraimidis-Spirakis priority ``u^(1/n_chars)`` with the md5-keyed
    deterministic draw — longer documents proportionally likelier,
    reproducible across engines and runs. Ordering happens on the full
    doubles; the reported priority is quantized for the value hash."""
    from traceframe_spark.operators.sampling import priority_sample

    d = load_table(spark, sf_dir, "documents")
    out = priority_sample(d, k=100, weight_col="n_chars")
    return out.select(
        "doc_id",
        qint(F.col("priority"), 6).alias("priority_q"),
        F.col("rank"),
    )


SQL_PRIORITY_SAMPLE = """
WITH pri AS (
    SELECT doc_id,
           power((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT::DOUBLE + 1.0)
                     / 4294967296.0,
                 1.0 / n_chars::DOUBLE) AS priority
    FROM documents WHERE n_chars > 0
),
ranked AS (
    SELECT doc_id, priority,
           CAST(row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS BIGINT) AS rank
    FROM pri
)
SELECT doc_id,
       CAST(floor(priority * 1000000 + 0.5) AS BIGINT) AS priority_q,
       rank
FROM ranked WHERE rank <= 100
"""


SQL_TEMPERATURE_MIX = """
WITH cnt AS (
    SELECT source, count(*) AS n FROM documents GROUP BY source
),
-- N-free normalization (identical formula to the engine):
-- w_s / Z = sqrt(n_s) / sum_t sqrt(n_t)
wt AS (
    SELECT source, n, sqrt(n::DOUBLE) AS w FROM cnt
),
z AS (SELECT sum(w) AS Z FROM wt),
quota AS (
    SELECT source,
           least(CAST(ceil(w / Z * 300.0) AS BIGINT), n) AS keep_n
    FROM wt CROSS JOIN z
),
ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
SELECT r.doc_id, r.source
FROM ranked r JOIN quota q ON q.source = r.source
WHERE r.rn <= q.keep_n
"""


TEMPORAL_QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "event_gaps": q_event_gaps,
    "count_distinct": q_count_distinct,
    "grouping_sets": q_grouping_sets,
    "salted_group_agg": q_salted_group_agg,
    "salted_join": q_salted_join,
    "time_rollup": q_time_rollup,
    "pivot_events": q_pivot_events,
    "stratified_sample": q_stratified_sample,
    "value_anomalies": q_value_anomalies,
    "value_histogram": q_value_histogram,
    "json_props": q_json_props,
    "moving_avg": q_moving_avg,
    "domain_mix": q_domain_mix,
    "temperature_mix": q_temperature_mix,
    "priority_sample": q_priority_sample,
    "hll_daily_users": q_hll_daily_users,
    "hll_weekly_users": q_hll_weekly_users,
    "p95_from_rollup": q_p95_from_rollup,
}

TEMPORAL_ORACLE_SQL = {
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "event_gaps": SQL_EVENT_GAPS,
    "count_distinct": SQL_COUNT_DISTINCT,
    "grouping_sets": SQL_GROUPING_SETS,
    "salted_group_agg": SQL_SALTED_GROUP_AGG,
    "salted_join": SQL_SALTED_JOIN,
    "time_rollup": SQL_TIME_ROLLUP,
    "pivot_events": SQL_PIVOT_EVENTS,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "value_anomalies": SQL_VALUE_ANOMALIES,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "json_props": SQL_JSON_PROPS,
    "moving_avg": SQL_MOVING_AVG,
    "domain_mix": SQL_DOMAIN_MIX,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "priority_sample": SQL_PRIORITY_SAMPLE,
    "hll_daily_users": SQL_HLL_DAILY_USERS,
    "hll_weekly_users": SQL_HLL_WEEKLY_USERS,
    "p95_from_rollup": SQL_P95_FROM_ROLLUP,
}
