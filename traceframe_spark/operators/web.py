"""URL/domain-level curation (RefinedWeb, Penedo et al. 2023,
arXiv:2306.01116 §3.1 — URL filtering before any content runs): URL
canonicalization, domain blocklist gating, and per-domain caps, the
source-level controls a web-scale training pipeline applies first
because they are the cheapest filter it has (no text is read).

Everything here is native Catalyst expressions over a url string
column — zero shuffles for normalization/gating (a scan-side
projection + one broadcast anti-join), one capped window for the
domain cap (the ``cluster_cap_sample`` shape with the domain as the
cluster key). All rules are deterministic regex/string algebra, so the
whole family replays in ANSI SQL and is value-verified by the
``url_normalize`` / ``domain_gate`` / ``domain_cap`` /
``web_curation_flow`` oracle rows.

Normalization rules (the common canonical subset of RefinedWeb/CCNet
pipelines):

- scheme and host lowercase; a leading ``www.`` strips off the host;
- default ports strip (``https:443``, ``http:80``); other ports keep;
- the fragment drops;
- trailing slashes strip off the path;
- tracking query parameters drop (``utm_*``, ``ref``, ``fbclid``,
  ``gclid``), survivors sort lexicographically (param order is not
  content);
- a string with no ``scheme://`` is not a URL: both outputs are NULL
  (gate/cap callers decide whether null-domain rows pass — the
  explicit-contract convention used by the scorer operators).

``domain`` is the lowercased host after the ``www.`` strip — the
cluster/cap key. True eTLD+1 ("registered domain") needs the public
suffix list, an external artifact this runtime doesn't ship; the host
key is documented as the conservative stand-in (it only ever
OVER-splits a registrant's mass, never merges two registrants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# query params that carry tracking, not content
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)(=.*)?$"


def url_normalize(col: Column) -> Column:
    """struct(url_norm, domain) for a url string column — the
    canonicalization above as one expression tree (regexp_extract
    splits, pure string algebra, an array sort for the query params).
    NULL/invalid input (no ``scheme://``) yields struct(NULL, NULL)."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    authority = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    host2 = F.regexp_replace(host, r"^www\.", "")
    default_port = (
        (scheme == F.lit("https")) & (port == F.lit("443"))
    ) | ((scheme == F.lit("http")) & (port == F.lit("80")))
    port_part = F.when(
        (port == F.lit("")) | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path2 = F.regexp_replace(path, r"/+$", "")
    kept_params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))
    norm = F.concat(
        scheme, F.lit("://"), host2, port_part, path2, query_part
    )
    valid = scheme != F.lit("")
    return F.struct(
        F.when(valid, norm).alias("url_norm"),
        F.when(valid, host2).alias("domain"),
    )


def with_url_norm(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """``df`` plus (url_norm, domain) columns — the scan-side
    projection form of :func:`url_normalize`."""
    s = url_normalize(F.col(url_col))
    return df.withColumn("url_norm", s["url_norm"]).withColumn(
        "domain", s["domain"]
    )


def domain_gate(
    df: DataFrame,
    blocked: DataFrame | list[str],
    domain_col: str = "domain",
    keep_null_domain: bool = False,
) -> DataFrame:
    """Drop every row whose domain is on the blocklist — ONE broadcast
    anti-join (the blocklist is curated, bounded state: UT1/admin
    lists run a few MB against 100 TB of rows, the textbook broadcast
    side). ``blocked`` is a one-column DataFrame or a plain list of
    domain strings; matching is exact on the normalized domain key
    (callers normalize both sides with the same
    :func:`url_normalize`). Rows with a NULL domain (invalid URL)
    drop by default — a gate that can't attribute a row shouldn't
    pass it; ``keep_null_domain=True`` passes them through for
    pipelines that triage invalid URLs separately."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        from traceframe_spark.session import local_frame

        blocked = local_frame(spark, [(d,) for d in blocked], "domain string")
    bl = blocked.select(F.col(blocked.columns[0]).alias("_bl_domain")).distinct()
    joined = df.join(
        F.broadcast(bl),
        df[domain_col].eqNullSafe(F.col("_bl_domain")),
        "left_anti",
    )
    if keep_null_domain:
        return joined
    return joined.filter(F.col(domain_col).isNotNull())


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain — RefinedWeb's per-source
    cap so one boilerplate-heavy domain can't dominate the mixture:
    the :func:`~traceframe_spark.operators.sampling.cluster_cap_sample`
    capped-window shape with the DOMAIN as the cluster key and the
    engine's deterministic md5(id) order (reproducible, retry-stable;
    ties on id). One shuffle keyed by domain; a pathological head
    domain bounds one task's sort — exactly the skew the cap is about
    to remove, the same contract as every LSH bucket here. NULL-domain
    rows are excluded (cap a key you can't attribute and the window
    would collect every invalid URL into one task)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.filter(F.col(domain_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
