"""Registry-wide build smoke + testdata schema gates.

Round 2 died on silent schema drift: the driver's testdata switched
``events.ts`` from TIMESTAMP(NANOS) to TIMESTAMP_NTZ(µs) between rounds,
every events plan raised at *build* time, and the driver's oracle runner
aborted mid-registry — one bug cost 39 untested queries. These tests turn
that failure mode into ordinary red pytest rows:

- ``test_all_queries_build``: constructing every registered DataFrame must
  not throw (build-only — nothing executes, so the whole registry checks
  in seconds);
- ``test_events_ts_normalized_to_long_ns``: the post-``load_table`` events
  contract (``ts``: int64 nanoseconds in the Jan-2024 range) asserted
  against the REAL driver testdata, not a fixture;
- ``test_oracle_sql_keys_subset_of_queries``: every oracle entry has a
  query (a dangling oracle would crash the driver's runner).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from traceframe_spark.plans import catalog_oracle_sql, catalog_queries
from traceframe_spark.plans.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)


@needs_testdata
def test_all_queries_build(spark):
    """Every registered query must construct a DataFrame without raising.

    Build-only on purpose: an AnalysisException at plan-construction time
    is what aborts the driver's gate; execution failures surface as
    individual oracle rows instead and are survivable.
    """
    # 8-way thread pool: construction is driver-bound (py4j/analysis)
    # plus the store-building queries' setup jobs — independent per
    # query (every store lands in its own tmp dir), so overlapping them
    # collapses ~2.5 min of serial wall time to ~30 s without changing
    # what is checked. Spark job submission is thread-safe.
    from concurrent.futures import ThreadPoolExecutor

    def _build(item):
        name, fn = item
        try:
            df = fn(spark, SF_DIR)
            _ = df.schema  # force analysis
            return None
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            return (name, f"{type(exc).__name__}: {exc}"[:200])

    with ThreadPoolExecutor(max_workers=8) as pool:
        failures = dict(r for r in pool.map(_build, catalog_queries().items()) if r)
    assert not failures, f"{len(failures)} queries failed to build: {failures}"


@needs_testdata
def test_events_ts_normalized_to_long_ns(spark):
    e = load_table(spark, SF_DIR, "events")
    assert isinstance(e.schema["ts"].dataType, LongType), e.schema["ts"].dataType
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    # Jan-2024 epoch-ns range: 2024-01-01 is ~1.704e18 ns; anything under
    # ~1e17 means the µs (or s) scale leaked through unconverted.
    assert lo > 1_500_000_000_000_000_000, lo
    assert hi < 2_500_000_000_000_000_000, hi


def test_oracle_sql_keys_subset_of_queries():
    queries = set(catalog_queries())
    oracles = set(catalog_oracle_sql())
    dangling = oracles - queries
    assert not dangling, f"oracle SQL without a registered query: {dangling}"


def test_no_query_name_collisions_across_modules():
    """The merged registry would silently overwrite on duplicate names
    across plan modules — keep every module's key set disjoint."""
    from traceframe_spark.plans import (
        ADVANCED_QUERIES,
        EVENTS_QUERIES,
        LEXICAL_QUERIES,
        PIPELINE_QUERIES,
        QUERIES,
        TEMPORAL_QUERIES,
        TPCH_QUERIES,
        TRACEOPS_QUERIES,
    )

    modules = {
        "catalog": QUERIES,
        "pipeline": PIPELINE_QUERIES,
        "advanced": ADVANCED_QUERIES,
        "temporal": TEMPORAL_QUERIES,
        "traceops": TRACEOPS_QUERIES,
        "events": EVENTS_QUERIES,
        "lexical": LEXICAL_QUERIES,
        "tpch": TPCH_QUERIES,
    }
    seen: dict[str, str] = {}
    clashes = []
    for mod, qs in modules.items():
        for name in qs:
            if name in seen:
                clashes.append((name, seen[name], mod))
            seen[name] = mod
    assert not clashes, f"duplicate query names across modules: {clashes}"


@needs_testdata
def test_null_text_oracle_parity(spark, tmp_path):
    """The driver testdata has no NULL-text documents, so the NULL
    branches of the doc-query oracles are never exercised by the gate —
    pin them here on a synthetic corpus: Spark result == DuckDB oracle
    for every doc query that touches text, including a NULL-text row."""
    import duckdb

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "src0"),
        (2, None, "src1"),
        (3, "der hund lief mit dem ball und die katze", "src2"),
    ]
    d = tmp_path / "nulls"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string, source string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))

    from traceframe_spark.plans import catalog_oracle_sql, catalog_queries

    qs, oracles = catalog_queries(), catalog_oracle_sql()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("doc_lang_id", "doc_entropy", "doc_chunks", "doc_quality",
                 "doc_repetition", "doc_pii", "doc_fingerprint",
                 "quality_resample"):
        got = sorted(
            tuple(r) for r in qs[name](spark, str(d)).toPandas().itertuples(index=False)
        )
        want = sorted(
            tuple(r) for r in con.sql(oracles[name]).df().itertuples(index=False)
        )
        def norm(rows_):
            out = []
            for t in rows_:
                out.append(tuple(None if (isinstance(x, float) and x != x) else x for x in t))
            return out
        assert norm(got) == norm(want), f"{name}: {norm(got)[:3]} != {norm(want)[:3]}"


@needs_testdata
def test_queries_run_on_bare_session(spark):
    """The driver's correctness gate calls query functions with ITS OWN
    SparkSession — one that has none of get_spark's conveniences
    (LAST_WIN map dedup, timezone, nanosAsLong are load_table's job).
    Pin a representative per-suite subset against a bare-config clone:
    any query that silently depends on a get_spark-only conf fails here
    instead of in the driver."""
    bare = spark.newSession()  # shares JVM, drops session-conf state
    for k in (
        "spark.sql.mapKeyDedupPolicy",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        try:
            bare.conf.unset(k)
        except Exception:
            pass

    from traceframe_spark.plans import catalog_queries

    qs = catalog_queries()
    subset = [
        "tpch_q1", "sessionize", "service_graph", "funnel_conversion",
        "bm25_topk", "json_props", "filter_project", "quality_resample",
        "bpe_pair_counts", "video_features", "doc_triangles",
        "hard_negatives", "stats_by_group", "set_ops_all",
        # r05 additions
        "quality_gate", "curation_flow", "leakage_split",
        "ann_ivf_recall", "token_drift", "bpe_token_ids",
    ]
    sf = "/root/testdata/sf0.001"
    for name in subset:
        n = qs[name](bare, sf).count()
        assert n >= 0, name


def test_tmp_store_sweeps_stale_roots_and_scopes_by_pid():
    """The one-orphan-per-gate-day leak (r09 judge finding): a process
    killed by signal never runs its atexit cleanup. Roots are now
    PID-stamped; the next root creation sweeps roots whose pid is dead
    and legacy unstamped roots >6h old, and leaves live-pid roots alone."""
    import os
    import re
    import shutil
    import tempfile

    from traceframe_spark.plans import catalog as C

    tmpdir = tempfile.gettempdir()
    dead = os.path.join(tmpdir, "traceframe_stores_999999999_x")
    os.makedirs(dead, exist_ok=True)
    legacy_old = os.path.join(tmpdir, "traceframe_stores_legacyfmt")
    os.makedirs(legacy_old, exist_ok=True)
    os.utime(legacy_old, (0, 0))
    live = os.path.join(tmpdir, f"traceframe_stores_{os.getpid()}_live")
    os.makedirs(live, exist_ok=True)
    try:
        # force a fresh root creation (which triggers the sweep)
        saved = list(C._TMP_STORE_ROOT)
        C._TMP_STORE_ROOT.clear()
        try:
            p = C.tmp_store("unit_")
            root = os.path.dirname(p)
            assert re.match(rf"traceframe_stores_{os.getpid()}_", os.path.basename(root))
            assert not os.path.exists(dead)
            assert not os.path.exists(legacy_old)
            assert os.path.exists(live)  # same-pid root: never swept
            # same process: the root is reused, no second root created
            assert os.path.dirname(C.tmp_store("unit_")) == root
        finally:
            created = [r for _, r in C._TMP_STORE_ROOT]
            C._TMP_STORE_ROOT.clear()
            C._TMP_STORE_ROOT.extend(saved)
            for r in created:
                shutil.rmtree(r, ignore_errors=True)
    finally:
        shutil.rmtree(live, ignore_errors=True)
