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


def test_top_hot_keys(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    hot = skew.top_hot_keys(li, ["l_returnflag"], top=3).collect()
    assert len(hot) == 3
    assert abs(sum(r["share"] for r in hot) - 1.0) < 0.5  # top-3 of 3-ish keys
    assert hot[0]["count"] >= hot[-1]["count"]
