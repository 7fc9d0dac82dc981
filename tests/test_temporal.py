"""Semantics tests for the temporal query family (plans/temporal.py) on
hand-built fixtures: as-of tie rules, range-join window membership.

The sf0.01 value parity with DuckDB is covered by tools/check_oracle.py;
these pin the edge cases a random dataset may never hit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traceframe_spark.plans.catalog import normalize_event_ts
from traceframe_spark.plans.temporal import q_asof_join, q_range_join, JAN1_NS

US = 1_000  # ns per µs


@pytest.fixture()
def tiny_events_dir(spark, tmp_path):
    """events.parquet with adversarial as-of cases (ts in ns)."""
    rows = [
        # (event_id, ts_ns, user_id, event_type, value)
        # user 1: purchase BEFORE any click -> null click_id
        (1, 500 * US, 1, "purchase", 1.0),
        (2, 1000 * US, 1, "click", 1.0),
        # purchase strictly after -> picks click 2
        (3, 2000 * US, 1, "purchase", 1.0),
        # user 2: click and purchase in the SAME microsecond (sub-µs apart)
        # -> click is visible to the purchase (<= semantics at µs precision)
        (10, 3000 * US + 100, 2, "click", 1.0),
        (11, 3000 * US + 900, 2, "purchase", 1.0),
        # user 3: two clicks in the same microsecond -> larger event_id wins
        (20, 4000 * US, 3, "click", 1.0),
        (21, 4000 * US + 500, 3, "click", 1.0),
        (22, 5000 * US, 3, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    d = tmp_path / "tiny"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_join_semantics(spark, tiny_events_dir):
    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in q_asof_join(spark, tiny_events_dir).collect()
    }
    assert got[1] == (None, None)  # no prior click
    assert got[3] == (2, 1000)  # strictly-prior click
    assert got[11] == (10, 0)  # same-µs click visible, gap 0
    assert got[22] == (21, 1000)  # same-µs click tie -> larger event_id


def test_range_join_window_membership(spark, tmp_path):
    # one event exactly at a window boundary: start inclusive, end exclusive
    rows = [
        (1, JAN1_NS, 1, "view", 1.0),  # day 0 -> windows 0 only (days -2..0 clipped)
        (2, JAN1_NS + 3 * 86_400 * 1_000_000_000 - 1, 1, "view", 1.0),  # end-1 of w0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    d = tmp_path / "tiny2"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    got = {r["win_id"]: r["n_events"] for r in q_range_join(spark, str(d)).collect()}
    # event 1 at day-0 start: member of window 0 only (windows 28/29 of the
    # previous year don't exist; window ids start at Jan 1).
    # event 2 at day-3 minus 1ns: member of windows 0,1,2.
    assert got[0] == 2
    assert got[1] == 1
    assert got[2] == 1


def test_approx_count_distinct_tracks_exact(spark):
    """HLL surface (the 100 TB cheap path for n_users-style metrics):
    approx_count_distinct must land within its documented ~2-5% rsd of
    the exact distinct count on the events table."""
    e = normalize_event_ts(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    row = e.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(0.05 * row["exact"], 2), row


def test_asof_join_matches_naive_inequality_join(spark, tmp_path):
    """Randomized pin: the one-shuffle union-and-window as-of join equals
    the naive O(n^2) inequality-join + argmax formulation on arbitrary
    data (ties included)."""
    import random

    rng = random.Random(11)
    rows = []
    eid = 0
    for _ in range(400):
        ts_us = rng.randint(0, 50)  # small range -> many exact-tie cases
        user = rng.randint(1, 5)
        kind = rng.choice(["click", "purchase", "view"])
        rows.append((eid, ts_us * US, user, kind, 1.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    d = tmp_path / "rand"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))

    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in q_asof_join(spark, str(d)).collect()
    }

    # naive: for each purchase, the click with max (ts, event_id) at-or-before
    clicks = [(e, t // 1000, u) for (e, t, u, k, _v) in rows if k == "click"]
    want = {}
    for (e, t, u, k, _v) in rows:
        if k != "purchase":
            continue
        cands = [(ct, ce) for (ce, ct, cu) in clicks if cu == u and ct <= t // 1000]
        if cands:
            ct, ce = max(cands)
            want[e] = (ce, t // 1000 - ct)
        else:
            want[e] = (None, None)
    assert got == want


def test_incremental_rollup_refresh_equals_full(spark):
    from traceframe_spark.operators import rollup as R

    e = normalize_event_ts(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    # split history/delta on event_id; refresh(standing, delta) == rollup(full)
    hist = e.filter(F.col("event_id") % 5 != 0)
    delta = e.filter(F.col("event_id") % 5 == 0)
    standing = R.rollup_events(hist, R.MINUTE_NS, ["event_type"], "value")
    refreshed = R.incremental_refresh(
        standing, delta, R.MINUTE_NS, ["event_type"], "value"
    )
    full = R.rollup_events(e, R.MINUTE_NS, ["event_type"], "value")

    def key(df):
        return {
            (r["bucket_ns"], r["event_type"]): (
                r["n"],
                round(r["value_sum"], 6),
                r["value_min"],
                r["value_max"],
            )
            for r in df.collect()
        }

    assert key(refreshed) == key(full)
    # coarsening from partials == direct coarse rollup from raw
    hourly_from_partials = R.coarsen(full, R.HOUR_NS, ["event_type"], from_bucket_ns=R.MINUTE_NS)
    hourly_direct = R.rollup_events(e, R.HOUR_NS, ["event_type"], "value")
    assert key(hourly_from_partials) == key(hourly_direct)


def test_histogram_quantile_bounds_and_merge(spark):
    from traceframe_spark.operators import rollup as R

    e = normalize_event_ts(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    hist = R.histogram_rollup(e, R.MINUTE_NS, ["event_type"], "value", bin_width=1.0)
    q95 = {
        r["event_type"]: r["q95_upper"]
        for r in R.quantile_from_histogram(hist, ["event_type"], 0.95, 1.0).collect()
    }
    import math

    by_type: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        # the histogram answer is exactly the upper edge of the bin
        # holding the k-th order statistic, k = ceil(0.95 n)
        k = math.ceil(0.95 * len(vals))
        stat = sorted(vals)[k - 1]
        assert q95[et] == math.floor(stat / 1.0) + 1.0

    # merging two disjoint histogram partials == histogram of the union
    h1 = R.histogram_rollup(
        e.filter(F.col("event_id") % 2 == 0), R.MINUTE_NS, ["event_type"], "value", 1.0
    )
    h2 = R.histogram_rollup(
        e.filter(F.col("event_id") % 2 == 1), R.MINUTE_NS, ["event_type"], "value", 1.0
    )
    merged = h1.unionByName(h2).groupBy("bucket_ns", "event_type", "bin").agg(
        F.sum("n").alias("n")
    )
    key = lambda df: {  # noqa: E731
        (r["bucket_ns"], r["event_type"], r["bin"]): r["n"] for r in df.collect()
    }
    assert key(merged) == key(hist)


def test_approx_percentile_tracks_exact(spark):
    """The 100 TB percentile path: approx_percentile (one-pass, mergeable
    sketch) must land within 2% relative error of the exact interpolated
    percentile on the real lineitem distribution — the documented
    alternative where exact percentile's per-group sort is too hot
    (SCALING.md: exact is the one 4.9x data-bound query at 10x)."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02, row


def test_percentiles_approx_twin_tracks_exact(spark):
    """q_percentiles_approx (the registered production twin) must agree
    with q_percentiles per group within the sketch's rank-error bound —
    2% relative on every column, both quantity and price."""
    from traceframe_spark.plans.advanced import q_percentiles, q_percentiles_approx

    sf = "/root/testdata/sf0.001"
    exact = {r["l_returnflag"]: r for r in q_percentiles(spark, sf).collect()}
    approx = {r["l_returnflag"]: r for r in q_percentiles_approx(spark, sf).collect()}
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p50_qty", "p90_qty", "p50_price"):
            assert abs(a[col] - e[col]) <= max(0.02 * abs(e[col]), 1), (flag, col, e[col], a[col])


def test_percentiles_sampled_twin_tracks_exact(spark):
    """q_percentiles_sampled (the PORTABLE bounded-memory quantile twin,
    r11: md5 bottom-k sample + exact interpolation) in both regimes:
    at sf0.001 every group is under the k=4096 sample size, so the
    sample IS the group and the answer must equal q_percentiles
    EXACTLY; at sf0.01 groups exceed k, real sampling kicks in, and
    the estimate must track exact within the sample's rank-error bound
    (~1/sqrt(k) of rank → 5% relative on these distributions)."""
    from traceframe_spark.plans.advanced import q_percentiles, q_percentiles_sampled

    cols = ("p50_qty", "p90_qty", "p50_price")
    # degenerate regime: sample == group -> exact equality
    sf = "/root/testdata/sf0.001"
    exact = {r["l_returnflag"]: r for r in q_percentiles(spark, sf).collect()}
    samp = {r["l_returnflag"]: r for r in q_percentiles_sampled(spark, sf).collect()}
    assert set(exact) == set(samp)
    for flag, e in exact.items():
        for col in cols:
            assert samp[flag][col] == e[col], (flag, col)
    # sampling regime: groups > k, estimate tracks exact
    sf = "/root/testdata/sf0.01"
    exact = {r["l_returnflag"]: r for r in q_percentiles(spark, sf).collect()}
    samp = {r["l_returnflag"]: r for r in q_percentiles_sampled(spark, sf).collect()}
    assert set(exact) == set(samp)
    for flag, e in exact.items():
        for col in cols:
            assert abs(samp[flag][col] - e[col]) <= max(0.05 * abs(e[col]), 1), (
                flag, col, e[col], samp[flag][col],
            )
