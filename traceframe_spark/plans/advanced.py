"""Advanced relational coverage: set ops, cube, exact percentiles,
sessionization, and SQL-subquery forms (via the engine's SQL facade).

Every query here is oracle-backed. Percentile queries use exact
interpolating percentiles (Spark ``percentile`` ≡ DuckDB
``quantile_cont``), quantized like every float in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traceframe_spark import api
from traceframe_spark.plans.catalog import load_table, qint


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both a finished and an open order (INTERSECT)."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust)


SQL_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with finished orders but no open ones (EXCEPT — set
    semantics: distinct, any match on the right removes the row)."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_cust.subtract(o_cust)


SQL_EXCEPT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority: all 4 grouping combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        qint(F.sum("o_totalprice"), 2).alias("total"),
    )


SQL_CUBE_AGG = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median and p90 of quantity per return flag.

    SCALE CAVEAT — oracle-parity form only: Spark's exact ``percentile``
    buffers EVERY group value in the aggregation buffer, so on a 100 TB
    lineitem each of the 3-4 return-flag groups would hold billions of
    doubles on one executor and OOM it. Production paths use
    :func:`q_percentiles_approx` (t-digest ``approx_percentile``,
    bounded memory, mergeable partials) or the deterministic histogram
    rollup (``p95_from_rollup``, error ≤ bin width). This exact form
    exists because the DuckDB oracle computes ``quantile_cont`` and the
    gate hash-compares values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qint(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        qint(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        qint(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50_price"),
    )


def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of :func:`q_percentiles`: ``approx_percentile``
    with accuracy 10000 — constant-size mergeable sketch per group, so
    memory stays bounded no matter how many rows a group holds. Columns
    mirror the exact form; ``tests/test_temporal.py`` pins agreement
    with the exact percentiles within the sketch's rank-error bound.
    Rows-only at the gate (the sketch's interpolation is
    engine-specific), value-pinned against the exact twin in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qint(F.expr("approx_percentile(l_quantity, 0.5, 10000)"), 4).alias("p50_qty"),
        qint(F.expr("approx_percentile(l_quantity, 0.9, 10000)"), 4).alias("p90_qty"),
        qint(F.expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).alias(
            "p50_price"
        ),
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_qty,
       CAST(floor(quantile_cont(l_quantity, 0.9) * 10000 + 0.5) AS BIGINT) AS p90_qty,
       CAST(floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) AS BIGINT) AS p50_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_percentiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PORTABLE bounded-memory quantile twin — closing the one gap
    in the portable-twin program (``percentiles_approx`` stayed
    rows-only through r10): Spark's ``approx_percentile`` sketch
    (QuantileSummaries) is ORDER-SENSITIVE — its compress/merge steps
    depend on insertion order and the partition merge tree — so unlike
    minhash/simhash/LSH (order-independent min/xor/sign folds) its
    exact chain fundamentally cannot be replayed in set-oriented SQL.
    The portable twin therefore pins a quantile estimator of the same
    OPERATIONAL shape (bounded memory per group, mergeable,
    deterministic) that IS order-independent: a deterministic uniform
    sample via md5 bottom-k — each row keyed by
    ``md5('pq|orderkey|linenumber')``, the k=4096 lexicographically
    smallest keys per group selected (a min-k fold: order-independent,
    mergeable exactly like MinHash), and the exact interpolated
    percentile computed over the sample (rank error O(1/sqrt(k)) with
    high probability — Vitter-style hash sampling). The oracle replays
    the ENTIRE chain: same md5 keys, same bottom-k, same
    ``quantile_cont`` interpolation (already pinned engine-equal by
    ``percentiles``), so sampling effects are value-verified, not
    assumed. ``approx_percentile`` remains the production fast path
    (same fast/portable split as minhash_pairs/minhash_portable_pairs);
    agreement between the two estimators is pinned in pytest.

    100 TB shape (r12): TWO-PASS threshold refinement — the r11 form
    ran the bottom-k as a per-group global window sort, so with a
    handful of groups three tasks sorted the entire table to keep 4096
    rows each (148.9 s at the 60M-row volume corpus, the catalog's one
    scale-killer). Pass 1 histograms the md5 keys by their first 4 hex
    chars per group (a map-side-combining grouped count over at most
    groups x 65536 narrow rows) and takes, per group, the smallest
    prefix whose cumulative count reaches k. Lexicographic order makes
    that prefix a sound bound: every one of the true bottom-k full
    keys starts with a prefix <= it (if one didn't, the >= k keys at
    or below the threshold prefix would all be strictly smaller —
    contradiction). Pass 2 keeps only rows at or below the group's
    threshold prefix (~k + one 1/65536 key-bucket of the group, via a
    broadcast join of the <= groups-sized threshold table) and runs
    the EXACT bottom-k window on that surviving sliver — identical
    selection, identical values, so the oracle is unchanged, but the
    per-group sort now touches ~4k rows instead of the whole group.
    A group smaller than k has no threshold row (cum never reaches k):
    the left join keeps all its rows, exactly the old behavior."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws("|", F.lit("pq"), F.col("l_orderkey"), F.col("l_linenumber"))
    )
    sel = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice", h.alias("h")
    ).withColumn("hp", F.substring("h", 1, 4))
    wc = Window.partitionBy("l_returnflag").orderBy("hp")
    thr = (
        sel.groupBy("l_returnflag", "hp")
        .agg(F.count("*").alias("n"))
        .withColumn("cum", F.sum("n").over(wc))
        .filter(F.col("cum") >= 4096)
        .groupBy("l_returnflag")
        .agg(F.min("hp").alias("thr"))
    )
    cand = sel.join(F.broadcast(thr), "l_returnflag", "left").filter(
        F.col("thr").isNull() | (F.col("hp") <= F.col("thr"))
    )
    w = Window.partitionBy("l_returnflag").orderBy("h")
    samp = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 4096)
    return samp.groupBy("l_returnflag").agg(
        qint(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        qint(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        qint(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50_price"),
    )


SQL_PERCENTILES_SAMPLED = """
WITH ranked AS (
    SELECT l_returnflag, l_quantity, l_extendedprice,
           row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5('pq|' || l_orderkey::VARCHAR || '|'
                            || l_linenumber::VARCHAR)
           ) AS rn
    FROM lineitem
)
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_qty,
       CAST(floor(quantile_cont(l_quantity, 0.9) * 10000 + 0.5) AS BIGINT) AS p90_qty,
       CAST(floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) AS BIGINT) AS p50_price
FROM ranked
WHERE rn <= 4096
GROUP BY l_returnflag
"""


def q_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN value bucketing + grouped counts."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 150_000, "medium")
        .when(F.col("o_totalprice") < 300_000, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(bucket.alias("price_bucket"))
        .groupBy("price_bucket")
        .agg(F.count("*").alias("n"))
    )


SQL_CASE_BUCKETING = """
SELECT CASE
         WHEN o_totalprice < 50000 THEN 'small'
         WHEN o_totalprice < 150000 THEN 'medium'
         WHEN o_totalprice < 300000 THEN 'large'
         ELSE 'jumbo'
       END AS price_bucket,
       count(*) AS n
FROM orders
GROUP BY 1
"""


def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING: suppliers appearing on > 600 lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), qint(F.sum("l_extendedprice"), 2).alias("volume"))
        .filter(F.col("n_items") > 600)
    )


SQL_HAVING_FILTER = """
SELECT l_suppkey, count(*) AS n_items,
       CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT) AS volume
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 600
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery through the SQL facade: orders of customers from the
    nations of one region."""
    return api.sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            WHERE c_nationkey IN (
                SELECT n_nationkey FROM nation WHERE n_regionkey = 0
            )
        )
        """,
    )


SQL_IN_SUBQUERY = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 0
    )
)
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price."""
    return api.sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               CAST(floor((o_totalprice - (SELECT avg(o_totalprice) FROM orders))
                          * 100 + 0.5) AS BIGINT) AS above_avg_c
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """,
    )


SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey,
       CAST(floor((o_totalprice - (SELECT avg(o_totalprice) FROM orders))
                  * 100 + 0.5) AS BIGINT) AS above_avg_c
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (30-minute gap):
    lag + cumulative-sum window idiom, then per-user session stats."""
    e = load_table(spark, sf_dir, "events")  # ts is long nanoseconds
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = 30 * 60 * 1_000_000_000
    new_session = F.when(
        (F.col("ts") - F.lag("ts").over(w)) > gap_ns, 1
    ).otherwise(0)
    sess = (
        e.withColumn("new_s", new_session)
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


SQL_SESSIONIZE = """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, event_id,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
per_session AS (
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_session
GROUP BY user_id
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native sessionization (``F.session_window``) — the form
    that also runs incrementally under Structured Streaming
    (:mod:`traceframe_spark.streaming.sessions`). Grouping happens in
    ONE hash aggregation instead of the lag idiom's sort window + two
    aggregations. The oracle re-derives the same sessions with the
    lag idiom: session_window's merge boundary is closed (an event at
    exactly prev + 30min merges; only a strictly larger gap splits),
    which is precisely the lag idiom's ``> gap`` split rule.
    """
    from traceframe_spark.streaming.sessions import session_stats

    e = load_table(spark, sf_dir, "events")
    return (
        session_stats(e, "30 minutes")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
    )


SQL_SESSION_WINDOW = """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, event_id,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
per_session AS (
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_session
GROUP BY user_id
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL facade: suppliers with at least
    one near-max-quantity lineitem. Catalyst rewrites this to a left
    semi join — no per-row subquery execution."""
    return api.sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """,
    )


SQL_EXISTS_SUBQUERY = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
)
"""


def q_unpivot_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→tall reshape with the native ``unpivot`` (melt): lineitem's
    three charge columns become (charge, value_c) rows. Zero-shuffle —
    the Expand node emits 3 rows per input row map-side."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        qint(F.col("l_extendedprice"), 2).alias("price_c"),
        qint(F.col("l_discount"), 4).alias("disc_c"),
        qint(F.col("l_tax"), 4).alias("tax_c"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["price_c", "disc_c", "tax_c"],
        "charge",
        "value_c",
    )


SQL_UNPIVOT_CHARGES = """
SELECT l_orderkey, l_linenumber, charge, value_c
FROM (
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
           CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_c,
           CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_c
    FROM lineitem WHERE l_orderkey < 2000
) UNPIVOT (value_c FOR charge IN (price_c, disc_c, tax_c))
"""


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with unmatched rows on BOTH sides: per-customer
    spend on urgent orders vs. the negative-balance customer roster.
    Customers with no urgent orders and urgent buyers in good standing
    both survive with NULLs; keys coalesce into one column. Plan: one
    shuffle per side on custkey, sort-merge full-outer — the shape AQE
    cannot broadcast (full outer preserves both sides), so this is the
    honest large-large join case at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(qint(F.sum("o_totalprice"), 2).alias("urgent_spend_c"))
    )
    debtors = c.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", qint(F.col("c_acctbal"), 2).alias("acctbal_c")
    )
    joined = urgent.join(debtors, urgent.o_custkey == debtors.c_custkey, "full_outer")
    return joined.select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "urgent_spend_c",
        "acctbal_c",
    )


SQL_FULL_OUTER_JOIN = """
SELECT coalesce(u.o_custkey, d.c_custkey) AS custkey, u.urgent_spend_c, d.acctbal_c
FROM (
    SELECT o_custkey, CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS urgent_spend_c
    FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
) u
FULL OUTER JOIN (
    SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
    FROM customer WHERE c_acctbal < 0
) d ON u.o_custkey = d.c_custkey
"""


def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) spend quartiles within each order priority, then one
    row per (priority, quartile) with count and total. Ties broken by
    orderkey so both engines assign identical bucket membership (NTILE
    is order-dependent, not value-dependent). Two shuffles: the window
    partition and the 20-row reaggregation."""
    o = load_table(spark, sf_dir, "orders")
    cents = qint(F.col("o_totalprice"), 2)
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents.asc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            cents.alias("price_c"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(F.count("*").alias("n"), F.sum("price_c").alias("total_c"))
    )


SQL_NTILE_BUCKETS = """
SELECT o_orderpriority, quartile, count(*) AS n, CAST(sum(price_c) AS BIGINT) AS total_c
FROM (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ASC,
                                   o_orderkey ASC) AS quartile
    FROM orders
) GROUP BY o_orderpriority, quartile
"""


def q_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full-partition
    frame (UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING): each customer's
    first, latest, and second order key by date. The explicit frame
    matters — last_value under the default frame is the running current
    row, a classic silent-wrong-answer; pinning the frame keeps both
    engines on the whole-partition semantics. One window shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_key"),
        F.last_value("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


SQL_FIRST_LAST_WINDOW = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER w AS last_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: for every order, how many orders (and
    how much spend) the same customer placed in the trailing 30 days —
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW over epoch-days, the
    frame ROWS can't express when order density varies. RANGE frames
    include ALL peer rows of the current date, so same-day orders agree
    between engines without a tie-break. One window shuffle; WindowExec
    streams each customer's sorted orders once."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("orders_30d"),
        F.sum(qint(F.col("o_totalprice"), 2)).over(w).alias("spend_30d_c"),
    )


SQL_RANGE_INTERVAL_WINDOW = """
SELECT o_orderkey, o_custkey,
       count(*) OVER w AS orders_30d,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS spend_30d_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""




def q_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows the rank/ntile queries don't cover:
    percent_rank and cume_dist of each order's spend within its
    priority class (quantized to stable integers). One window shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    cents = qint(F.col("o_totalprice"), 2)
    w = Window.partitionBy("o_orderpriority").orderBy(cents.asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        qint(F.percent_rank().over(w), 6).alias("pct_rank_q"),
        qint(F.cume_dist().over(w), 6).alias("cume_q"),
    )


SQL_RANK_DISTRIBUTIONS = """
SELECT o_orderkey, o_orderpriority,
       CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pct_rank_q,
       CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cume_q
FROM orders WHERE o_orderkey < 4000
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ASC, o_orderkey ASC)
"""


def q_stats_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance of
    quantity and the quantity↔price correlation — the moment-based
    aggregate family nothing else in the catalog exercises. Both
    engines accumulate co-moments in different orders, so outputs are
    quantized coarsely enough (4 decimals on [-1,1] correlation, 3 on
    single-digit stddev) that the last-ulp disagreement can't surface.
    Map-side partial aggregation applies; one 3-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qint(F.stddev_samp("l_quantity"), 3).alias("qty_sd_q"),
        qint(F.var_samp("l_quantity"), 3).alias("qty_var_q"),
        qint(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr_q"),
        qint(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_cov_q"),
    )


SQL_STATS_BY_GROUP = """
SELECT l_returnflag,
       CAST(floor(stddev_samp(l_quantity) * 1000 + 0.5) AS BIGINT) AS qty_sd_q,
       CAST(floor(var_samp(l_quantity) * 1000 + 0.5) AS BIGINT) AS qty_var_q,
       CAST(floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) AS BIGINT) AS qty_price_corr_q,
       CAST(floor(covar_samp(l_quantity, l_discount) * 10000 + 0.5) AS BIGINT) AS qty_disc_cov_q
FROM lineitem GROUP BY l_returnflag
"""




def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL): per-status
    multiset of customer keys — duplicates preserved, which the
    DISTINCT-semantics set_intersect/set_except queries cannot cover.
    Spark plans these as aggregate+generate (sum of signed counts), not
    a join — the multiset algebra survives skew the same way a count
    aggregation does."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    both = f_cust.intersectAll(o_cust).withColumn("op", F.lit("intersect_all"))
    only_f = f_cust.exceptAll(o_cust).withColumn("op", F.lit("except_all"))
    return both.unionByName(only_f)


SQL_SET_OPS_ALL = """
SELECT custkey, 'intersect_all' AS op FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT custkey, 'except_all' AS op FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""




def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions in one pass:
    rank, dense_rank, lag, and lead over each customer's order history
    (other queries cover row_number/ntile/percent_rank/cume_dist/
    first/last/nth). One window shuffle; all five functions share the
    same sort, so WindowExec evaluates them in a single pass."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    cents = qint(F.col("o_totalprice"), 2)
    w = Window.partitionBy("o_custkey").orderBy(cents.asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
    )


SQL_RANK_FAMILY = """
SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       lag(o_orderkey, 1) OVER w AS prev_key,
       lead(o_orderkey, 1) OVER w AS next_key
FROM orders WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ASC, o_orderkey ASC)
"""


ADVANCED_QUERIES = {
    "in_subquery": q_in_subquery,
    "scalar_subquery": q_scalar_subquery,
    "sessionize": q_sessionize,
    "session_window": q_session_window,
    "unpivot_charges": q_unpivot_charges,
    "exists_subquery": q_exists_subquery,
    "full_outer_join": q_full_outer_join,
    "rank_distributions": q_rank_distributions,
    "rank_family": q_rank_family,
    "stats_by_group": q_stats_by_group,
    "ntile_buckets": q_ntile_buckets,
    "first_last_window": q_first_last_window,
    "range_interval_window": q_range_interval_window,
    "set_intersect": q_intersect,
    "set_ops_all": q_set_ops_all,
    "set_except": q_except,
    "cube_agg": q_cube_agg,
    "percentiles": q_percentiles,
    "case_bucketing": q_case_bucketing,
    "having_filter": q_having_filter,
    # rows-only: sketch interpolation is engine-specific; value-pinned
    # against the exact twin in tests/test_temporal.py
    "percentiles_approx": q_percentiles_approx,
    "percentiles_sampled": q_percentiles_sampled,
}

ADVANCED_ORACLE_SQL = {
    "full_outer_join": SQL_FULL_OUTER_JOIN,
    "rank_distributions": SQL_RANK_DISTRIBUTIONS,
    "rank_family": SQL_RANK_FAMILY,
    "stats_by_group": SQL_STATS_BY_GROUP,
    "ntile_buckets": SQL_NTILE_BUCKETS,
    "first_last_window": SQL_FIRST_LAST_WINDOW,
    "range_interval_window": SQL_RANGE_INTERVAL_WINDOW,
    "set_intersect": SQL_INTERSECT,
    "set_ops_all": SQL_SET_OPS_ALL,
    "set_except": SQL_EXCEPT,
    "cube_agg": SQL_CUBE_AGG,
    "percentiles": SQL_PERCENTILES,
    "percentiles_sampled": SQL_PERCENTILES_SAMPLED,
    "case_bucketing": SQL_CASE_BUCKETING,
    "having_filter": SQL_HAVING_FILTER,
    "in_subquery": SQL_IN_SUBQUERY,
    "scalar_subquery": SQL_SCALAR_SUBQUERY,
    "sessionize": SQL_SESSIONIZE,
    "session_window": SQL_SESSION_WINDOW,
    "exists_subquery": SQL_EXISTS_SUBQUERY,
    "unpivot_charges": SQL_UNPIVOT_CHARGES,
}
