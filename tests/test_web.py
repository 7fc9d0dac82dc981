"""URL/domain curation operators (operators/web.py): normalization
rules, blocklist gating, per-domain caps."""

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import web


def _norm(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return [
        (r["url_norm"], r["domain"])
        for r in web.with_url_norm(df).orderBy("doc_id").collect()
    ]


def test_url_normalize_rules(spark):
    got = _norm(
        spark,
        [
            # case folding + www strip + default https port + fragment
            "HTTPS://WWW.Example.COM:443/A/B/#frag",
            # non-default port survives; tracking params drop, rest sort
            "http://news.site.org:8080/x?utm_source=a&z=1&a=2&ref=t",
            # trailing slashes collapse; empty query -> no '?'
            "https://cdn.host.net/static///?utm_campaign=x&fbclid=y",
            # default http port strips; param without '=' survives sort
            "http://host.io:80/p?flag&gclid=g",
            # non-http scheme: port kept (no default rule), host folded
            "FTP://Files.Host.IO:21/pub/",
            # not a URL -> NULLs
            "relative/path/only",
            None,
        ],
    )
    assert got[0] == ("https://example.com/A/B", "example.com")
    assert got[1] == ("http://news.site.org:8080/x?a=2&z=1", "news.site.org")
    assert got[2] == ("https://cdn.host.net/static", "cdn.host.net")
    assert got[3] == ("http://host.io/p?flag", "host.io")
    assert got[4] == ("ftp://files.host.io:21/pub", "files.host.io")
    assert got[5] == (None, None)
    assert got[6] == (None, None)


def test_domain_gate_blocklist_and_null_contract(spark):
    df = spark.createDataFrame(
        [(0, "keep.com"), (1, "bad.com"), (2, None), (3, "keep.com")],
        "doc_id long, domain string",
    )
    kept = {r["doc_id"] for r in web.domain_gate(df, ["bad.com"]).collect()}
    assert kept == {0, 3}  # blocked drops, NULL-domain drops by default
    kept_null = {
        r["doc_id"]
        for r in web.domain_gate(df, ["bad.com"], keep_null_domain=True).collect()
    }
    assert kept_null == {0, 2, 3}
    # DataFrame blocklist form
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    assert {r["doc_id"] for r in web.domain_gate(df, bl).collect()} == {0, 3}


def test_domain_cap_deterministic_and_bounded(spark):
    rows = [(i, "big.com") for i in range(20)] + [(100, "small.com"), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = web.domain_cap(df, cap=5).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(by_dom["big.com"]) == 5  # capped
    assert by_dom["small.com"] == [100]  # under-cap keeps everything
    assert None not in by_dom  # null domains excluded
    # deterministic: a rerun selects the same ids
    again = {r["doc_id"] for r in web.domain_cap(df, cap=5).collect()}
    assert {r["doc_id"] for r in out} == again
    with pytest.raises(ValueError, match="cap"):
        web.domain_cap(df, cap=0)


def test_curation_flow_never_reads_text(spark):
    """The composed URL pass projects url/source columns only — the
    text column must be pruned out of the scan (the cheapest-filter
    property the family exists for)."""
    from traceframe_spark.plans.pipeline import q_web_curation_flow

    df = q_web_curation_flow(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans and all("text" not in ln for ln in scans)
