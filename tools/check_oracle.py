"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
value multiset. Reports per-query PASS/FAIL plus the first differing
rows on mismatch.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from traceframe_spark.plans.catalog import TABLES  # noqa: E402 — one source of truth


def _norm_cell(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # collapse -0.0 and represent with full precision
        return float(v) + 0.0
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return str(v)


def _canon(df) -> list[tuple]:
    # itertuples, NOT iterrows: iterrows materializes each row as a
    # Series whose dtype upcasts int64 to float64 in mixed-numeric
    # frames, collapsing distinct integers >= 2^53 (routine at this
    # repo's 1.7e18-ns scale) into equal floats — a false PASS
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(x) for x in t)
        for t in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--sample",
        type=int,
        default=None,
        help="check a seeded random sample of N queries instead of all "
        "(stratified by registration position, so rows-only queries are "
        "sampled too; use for quick unbiased spot-checks that do not "
        "depend on registry head order)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("queries", nargs="*", help="subset of query names")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            # Spark directory dataset (tools/make_scale_data.py output):
            # DuckDB wants a part-file glob, not the directory itself
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(qs)
    if args.sample and not args.queries:
        import random

        rng = random.Random(args.seed)
        # stratified: split the registry into args.sample contiguous
        # position strata and draw one per stratum — every region of the
        # registry (and the rows-only tail) gets sampled
        import math

        all_names = list(qs)
        k = min(args.sample, len(all_names))
        stride = len(all_names) / k
        # draw within DISJOINT integer stratum bounds [ceil(i*stride),
        # ceil((i+1)*stride)): real-valued bounds let adjacent strata
        # share a boundary index when stride is fractional, so the
        # sample could contain the same query twice (fewer unique
        # queries than --sample asked for). With stride >= 1 each
        # ceil-bounded stratum is nonempty, disjoint, and the union
        # covers every index including the tail.
        names = [
            all_names[
                rng.randrange(math.ceil(i * stride), math.ceil((i + 1) * stride))
            ]
            for i in range(k)
        ]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; valid names: {sorted(qs)}")
        spark.stop()
        return 2

    failures = []
    for name in names:
        t0 = time.time()
        # per-query isolation: one raising query must not abort the gate
        # and discard every later query's result (the r02 lesson bench.py
        # already absorbed)
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name:24s} FAIL spark error: {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            # rows-only queries have no value oracle — an empty result is
            # exactly the regression class that would otherwise pass
            # vacuously, so 0 rows is a failure
            status = "" if len(sdf) > 0 else "  FAIL empty rows-only result"
            print(f"{name:24s} rows-only: {len(sdf)} rows ({time.time()-t0:.1f}s){status}")
            if not len(sdf):
                failures.append(name)
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} FAIL oracle error: {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        else:
            # Driver-faithful type strictness: the driver's value hash is
            # type-sensitive (int 123 != float 123.0), so a dtype mismatch
            # between engines — e.g. DuckDB widening sum(BIGINT) to HUGEINT,
            # which pandas renders as float64 — must FAIL here even when the
            # normalized values would compare equal.
            bad = [
                f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                for c in sorted(sdf.columns)
                if str(sdf[c].dtype) != str(ddf[c].dtype)
            ]
            if bad:
                problems.append("dtype mismatch " + "; ".join(bad))
        if not problems:
            a, b = _canon(sdf), _canon(ddf)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(f"values differ in {len(diffs)} rows; first: {diffs[0] if diffs else (a[-1], b[-1])}")
        status = "PASS" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:24s} {len(sdf):7d} rows ({time.time()-t0:.1f}s)  {status}")
        if problems:
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
