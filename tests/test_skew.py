"""Salted aggregation must equal the plain aggregation on skewed keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from traceframe_spark.operators import skew


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["n"], r["s"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum("l_quantity").alias("s"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["s"], r["mx"])
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("l_quantity", "count"),
                "s": ("l_quantity", "sum"),
                "mx": ("l_quantity", "max"),
            },
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    import pytest

    with pytest.raises(ValueError):
        skew.salted_agg(li, ["l_returnflag"], {"m": ("l_quantity", "median")})


def test_salted_agg_handles_map_columns(spark):
    """Span-shaped frames carry a tags map; xxhash64 rejects MAP inputs,
    so the content salt must canonicalize maps (row_content_hash) rather
    than fail at plan time."""
    df = spark.createDataFrame(
        [("svc-a", 10, {"k": "v"}), ("svc-a", 20, {"b": "c", "a": "z"}), ("svc-b", 5, {})],
        "service: string, dur: long, tags: map<string,string>",
    )
    out = {
        r["service"]: (r["n"], r["s"])
        for r in skew.salted_agg(
            df, ["service"], {"n": ("dur", "count"), "s": ("dur", "sum")}, n_salts=4
        ).collect()
    }
    assert out == {"svc-a": (2, 30), "svc-b": (1, 5)}


def test_top_hot_keys(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    hot = skew.top_hot_keys(li, ["l_returnflag"], top=3).collect()
    assert len(hot) == 3
    assert abs(sum(r["share"] for r in hot) - 1.0) < 0.5  # top-3 of 3-ish keys
    assert hot[0]["count"] >= hot[-1]["count"]


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    plain = sorted(
        (r["okey"], r["l_quantity"], r["o_orderpriority"])
        for r in li.join(o, "okey").collect()
    )
    salted = sorted(
        (r["okey"], r["l_quantity"], r["o_orderpriority"])
        for r in skew.salted_join(li, o, on=["okey"], n_salts=8).collect()
    )
    assert salted == plain


def test_salted_join_left_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "orphan")], "k: long, v: string"
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k: long, w: string")
    out = skew.salted_join(big, small, on=["k"], how="left", n_salts=4)
    rows = {r["k"]: r["w"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 99: None}
    assert out.count() == 3  # replication must not duplicate rows


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1,)], "k: long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew.salted_join(df, df, on=["k"], how="right")


def test_sessionize_under_hot_user_skew(spark):
    """A hot user holding ~80% of all events (the window-skew case a
    uniform testdata never exercises): the native session_window form and
    the lag + cumulative-sum idiom must agree exactly, and per-partition
    cost stays bounded by the hottest user, not the table."""
    from pyspark.sql.window import Window
    from traceframe_spark.streaming.sessions import session_stats

    MIN_NS = 60_000_000_000
    base = 1_700_000_000_000_000_000
    hot = [(i, 1, base + (i * 7 % 40_000) * MIN_NS) for i in range(40_000)]
    cold = [
        (100_000 + i, 2 + (i % 50), base + (i * 13 % 2_000) * MIN_NS)
        for i in range(10_000)
    ]
    df = spark.createDataFrame(hot + cold, "event_id long, user_id long, ts long")

    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in session_stats(df, "30 minutes").collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        df.withColumn(
            "new_s",
            F.when((F.col("ts") - F.lag("ts").over(w)) > 30 * MIN_NS, 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    want = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            (F.min("ts") / 1000).cast("long").alias("start_us"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert got == want
    assert sum(n for (u, _), n in got.items() if u == 1) == 40_000
