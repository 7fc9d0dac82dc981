"""TPC-H query suite, adapted to the testdata's column subset.

The testdata tables are TPC-H-shaped but trimmed (no ``partsupp``, no
``l_shipmode``/``l_commitdate``/``l_receiptdate``, no ``c_phone``/
``o_shippriority``), so each query keeps the classic plan shape and
drops only the absent columns; adaptations are noted per query. These
are the standard OLAP stress patterns — multi-way joins, semi/anti
joins, correlated-aggregate filters, global-max picks — expressed as
declarative DataFrame plans so Catalyst owns join order and strategy.

Scale notes (100 TB):

- ``region``/``nation`` are unconditionally tiny and explicitly
  broadcast; ``customer``/``supplier``/``part`` scale with SF, so they
  are left to Catalyst/AQE (shuffle join when big, auto-broadcast when
  small) rather than pinned.
- Every filter sits on the base table before its join, so predicate
  pushdown reaches the parquet scan, and each aggregation is a single
  hash shuffle with map-side partials.
- Q15's "suppliers at the global max" and Q17/Q22's scalar thresholds
  use one-row aggregates broadcast back (``crossJoin(broadcast(...))``)
  — never a driver-side collect.
- All money/ratio outputs are quantized (:func:`~traceframe_spark.plans
  .catalog.qint`) so both engines rank and hash identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traceframe_spark.plans.catalog import load_table, qint

def _rev():
    # built lazily — Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q3 — shipping priority (minus the absent o_shippriority column)
# --------------------------------------------------------------------------


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(qint(F.sum(_rev()), 2).alias("revenue_c"))
        .orderBy(F.col("revenue_c").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "revenue_c",
        )
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS revenue_c
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS becomes a left-semi join;
# adapted: the late-line predicate is l_shipdate > o_orderdate since
# l_commitdate/l_receiptdate don't exist)
# --------------------------------------------------------------------------


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q5 — local supplier volume
# --------------------------------------------------------------------------


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    local_n = F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(local_n, s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(qint(F.sum(_rev()), 2).alias("revenue_c"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS revenue_c
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan + single-row aggregate)
# --------------------------------------------------------------------------


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(qint(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue_c"))
    )


SQL_TPCH_Q6 = """
SELECT CAST(floor(sum(l_extendedprice * l_discount) * 100 + 0.5) AS BIGINT) AS revenue_c
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("s_nk"))
        .join(n2, c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(qint(F.sum(_rev()), 2).alias("revenue_c"))
    )


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(floor(sum(volume) * 100 + 0.5) AS BIGINT) AS revenue_c
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 — national market share (adapted: p_type is a single word here)
# --------------------------------------------------------------------------


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = _t(spark, sf_dir, "nation")
    cust_n = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("c_nk")
        )
    )
    supp_n = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cust_n, c.c_nationkey == F.col("c_nk"))
        .join(supp_n, s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            F.col("supp_nation"),
        )
    )
    return vol.groupBy("o_year").agg(
        qint(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share_q")
    )


SQL_TPCH_Q8 = """
SELECT o_year,
       CAST(floor(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                  / sum(volume) * 10000 + 0.5) AS BIGINT) AS mkt_share_q
FROM (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND p_type = 'ECONOMY'
)
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no partsupp, so profit is revenue
# without the supply-cost term)
# --------------------------------------------------------------------------


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        # per-row cents, THEN the sum: this aggregate spans the whole
        # table (no date filter), so a post-sum quantization can land on
        # an exact half-cent boundary where the two engines' fp addition
        # orders differ by 1 ulp. Integer summation is order-exact.
        .agg(F.sum(qint(_rev(), 2)).alias("profit_c"))
    )


SQL_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS profit_c
FROM part, supplier, lineitem, orders, nation
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# Q10 — returned-item reporting
# --------------------------------------------------------------------------


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            qint(F.sum(_rev()), 2).alias("revenue_c"),
            qint(F.first("c_acctbal"), 2).alias("acctbal_c"),
        )
        .orderBy(F.col("revenue_c").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS revenue_c,
       CAST(floor(any_value(c_acctbal) * 100 + 0.5) AS BIGINT) AS acctbal_c
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double agg)
# --------------------------------------------------------------------------


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q14 — promotion effect (adapted: p_type equality, not LIKE 'PROMO%')
# --------------------------------------------------------------------------


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            qint(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                4,
            ).alias("promo_revenue_q")
        )
    )


SQL_TPCH_Q14 = """
SELECT CAST(floor(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)
           AS promo_revenue_q
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --------------------------------------------------------------------------
# Q15 — top supplier: revenue view + join back on the global max,
# broadcast as a one-row aggregate (no collect)
# --------------------------------------------------------------------------


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(qint(F.sum(_rev()), 2).alias("total_revenue_c"))
    )
    top = revenue.agg(F.max("total_revenue_c").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue_c") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_c")
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)
               AS total_revenue_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg becomes a per-part
# aggregate joined back; adapted: brand filter only, no p_container)
# --------------------------------------------------------------------------


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(qint(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly_c"))
    )


SQL_TPCH_Q17 = """
SELECT CAST(floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) AS BIGINT) AS avg_yearly_c
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --------------------------------------------------------------------------
# Q18 — large-volume customers
# --------------------------------------------------------------------------


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            qint(F.col("o_totalprice"), 2).alias("totalprice_c"),
            qint(F.col("sum_qty"), 2).alias("sum_qty_c"),
        )
        .orderBy(F.col("totalprice_c").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c,
       CAST(floor(sum_qty * 100 + 0.5) AS BIGINT) AS sum_qty_c
FROM customer, orders,
     (SELECT l_orderkey AS big_ok, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
WHERE o_orderkey = big_ok AND c_custkey = o_custkey
ORDER BY totalprice_c DESC, o_orderkey ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: grouped by nation, the
# schema's analogue of the absent phone country-code prefix)
# --------------------------------------------------------------------------


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    # "no RECENT orders": every customer in this testdata has some order,
    # so the classic no-orders-ever form returns 0 rows at every SF and
    # the anti-join would be only vacuously oracle-checked (a 0-row
    # PASS). Restricting to orders since 1999 keeps the exact plan shape
    # and yields rows at all scale factors (14 at sf0.01, 148 at sf0.1).
    recent = o.filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
    no_orders = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        no_orders.join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            qint(F.sum("c_acctbal"), 2).alias("totacctbal_c"),
        )
    )


SQL_TPCH_Q22 = """
SELECT n_name, count(*) AS numcust,
       CAST(floor(sum(c_acctbal) * 100 + 0.5) AS BIGINT) AS totacctbal_c
FROM customer, nation
WHERE c_nationkey = n_nationkey
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q1 — pricing summary report (full column set exists). All sums go
# through per-row integer cents (order-exact across engines); averages
# are derived from the integer sums so no floating aggregate ever crosses
# the engine boundary.
# --------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    n = F.count("*")
    sum_qty_c = F.sum(qint(F.col("l_quantity"), 2))
    sum_price_c = F.sum(qint(F.col("l_extendedprice"), 2))
    sum_disc_c = F.sum(qint(F.col("l_discount"), 4))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty_c.alias("sum_qty_c"),
        sum_price_c.alias("sum_base_price_c"),
        F.sum(qint(_rev(), 2)).alias("sum_disc_price_c"),
        F.sum(qint(_rev() * (1 + F.col("l_tax")), 2)).alias("sum_charge_c"),
        F.floor(sum_qty_c / n + F.lit(0.5)).cast("long").alias("avg_qty_c"),
        F.floor(sum_price_c / n + F.lit(0.5)).cast("long").alias("avg_price_c"),
        F.floor(sum_disc_c / n + F.lit(0.5)).cast("long").alias("avg_disc_q"),
        n.alias("count_order"),
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       CAST(floor(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) AS avg_qty_c,
       CAST(floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) AS avg_price_c,
       CAST(floor(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) / count(*) + 0.5) AS BIGINT) AS avg_disc_q,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: no partsupp table, so the
# part↔supplier relation and its "cost" come from lineitem — unit price
# = l_extendedprice / l_quantity, quantized per row BEFORE the min so
# both engines take min over identical integers). Keeps the classic
# shape: correlated per-part min + region-restricted multiway join.
# --------------------------------------------------------------------------


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = F.broadcast(
        _t(spark, sf_dir, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    s = _t(spark, sf_dir, "supplier").join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    li = _t(spark, sf_dir, "lineitem")
    link = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(qint(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias("unit_cost_q"))
    )
    best = link.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("unit_cost_q").alias("min_cost_q")
    )
    return (
        link.join(best, (link.l_partkey == F.col("pk")) & (F.col("unit_cost_q") == F.col("min_cost_q")))
        .join(s.select("s_suppkey", "s_name", "s_acctbal", "n_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(_t(spark, sf_dir, "part").select("p_partkey", "p_name"), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            qint(F.col("s_acctbal"), 2).alias("acctbal_c"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost_q",
        )
        .orderBy(F.col("acctbal_c").desc(), F.col("s_name").asc(), F.col("p_partkey").asc())
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH link AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5) AS BIGINT)) AS unit_cost_q
    FROM lineitem, supplier, nation, region, part
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND l_partkey = p_partkey AND p_size = 15 AND p_type = 'ECONOMY'
    GROUP BY l_partkey, l_suppkey
)
SELECT CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c,
       s_name, n_name, p_partkey, p_name, unit_cost_q
FROM link, supplier, nation, region, part
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND l_partkey = p_partkey
  AND unit_cost_q = (SELECT min(unit_cost_q) FROM link l2 WHERE l2.l_partkey = link.l_partkey)
ORDER BY acctbal_c DESC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q11 — important stock identification (adapted: no partsupp, so a
# part's "value" for a nation's suppliers is the summed extended price
# shipped by them, in integer cents). Keeps the classic shape: grouped
# value + scalar-subquery threshold (one-row aggregate broadcast back,
# never a collect).
# --------------------------------------------------------------------------


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3"))
    s = _t(spark, sf_dir, "supplier").join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    li = _t(spark, sf_dir, "lineitem")
    value = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(qint(F.col("l_extendedprice"), 2)).alias("value_c"))
    )
    # 0.0002: small enough to clear at every testdata SF (the classic
    # query scales its fraction by 1/SF for the same reason)
    threshold = value.agg(
        (F.sum("value_c") * F.lit(0.0002)).alias("threshold_c")
    )
    return (
        value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_c") > F.col("threshold_c"))
        .select("l_partkey", "value_c")
    )


SQL_TPCH_Q11 = """
WITH value AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY l_partkey
)
SELECT l_partkey, value_c
FROM value
WHERE value_c > (SELECT sum(value_c) * 0.0002 FROM value)
"""


# --------------------------------------------------------------------------
# Q12 — shipping-delay priority classes (adapted: no l_shipmode /
# l_commitdate / l_receiptdate; "late" is l_shipdate more than 90 days
# after o_orderdate, and the grouping column is l_linestatus). Keeps the
# classic shape: fact join + conditional aggregation by priority class.
# --------------------------------------------------------------------------


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted: the part↔supplier link is
# distinct lineitem pairs instead of partsupp, and the "customer
# complaints" exclusion is suppliers with negative account balance via
# NOT IN / anti-join). Keeps the shape: anti-subquery + distinct-count
# aggregation over three grouping columns.
# --------------------------------------------------------------------------


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    link = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        link.join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue (adapted: no p_container / l_shipmode /
# l_shipinstruct, so each disjunct brackets on brand + size + quantity
# only). Keeps the shape: join with an OR-of-ANDs bracket predicate that
# must still push the partkey equi-condition into the join.
# --------------------------------------------------------------------------


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    brackets = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(brackets)
        .agg(F.sum(qint(_rev(), 2)).alias("revenue_c"))
    )


SQL_TPCH_Q19 = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
"""


# --------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: no partsupp availability, so
# a supplier "has excess stock to promote" when its 1997 shipped
# quantity of some gear part exceeds 1.5x the per-supplier average for
# that part). Keeps the shape: nested aggregation -> threshold join ->
# semi-join into the supplier dimension, nation-filtered.
# --------------------------------------------------------------------------


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    gear = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    per_sp = (
        li.join(F.broadcast(gear), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qint(F.col("l_quantity"), 2)).alias("qty_c"))
    )
    per_part = per_sp.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("qty_c") * F.lit(1.5)).alias("avg15_c")
    )
    heavy = (
        per_sp.join(per_part, per_sp.l_partkey == F.col("pk"))
        .filter(F.col("qty_c") > F.col("avg15_c"))
        .select("l_suppkey")
        .distinct()
    )
    n = F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7"))
    return (
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", qint(F.col("s_acctbal"), 2).alias("acctbal_c"))
    )


SQL_TPCH_Q20 = """
WITH per_sp AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_name LIKE '%gear%'
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_partkey, l_suppkey
)
SELECT s_name, CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_7'
  AND s_suppkey IN (
      SELECT l_suppkey FROM per_sp
      WHERE qty_c > (SELECT avg(qty_c) * 1.5 FROM per_sp p2 WHERE p2.l_partkey = per_sp.l_partkey)
  )
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: "late" is
# l_shipdate more than 60 days after o_orderdate since commit/receipt
# dates don't exist). Keeps the classic double-correlation: the order
# involves another supplier (EXISTS) but no OTHER supplier was late
# (NOT EXISTS) — expressed as one semi-join and one anti-join.
# --------------------------------------------------------------------------


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    waiting = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(_t(spark, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


SQL_TPCH_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderkey = l3.l_orderkey AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


TPCH_QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q2": q_tpch_q2,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q16": q_tpch_q16,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q22": q_tpch_q22,
}

TPCH_ORACLE_SQL = {
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q5": SQL_TPCH_Q5,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q22": SQL_TPCH_Q22,
}
