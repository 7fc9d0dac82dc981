"""Reusable Column expressions for the trace data model.

Everything here is a *native* Catalyst expression — no Python UDFs — so
filters/projections built from these stay inside whole-stage codegen and
push down into the parquet/JSON scan (SURVEY.md §2.B mapping).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_content_hash(df) -> Column:
    """Deterministic content hash over every column of ``df``'s rows.

    Map columns are canonicalized to key-sorted entry arrays first —
    ``xxhash64`` rejects MAP inputs outright because map hashcodes are
    not content-stable. Used wherever a recomputation-stable per-row
    key is needed (dedup tie-breaks, content-derived salts): unlike
    ``monotonically_increasing_id`` the value survives shuffle-fetch
    retries, so stages built on it stay deterministic.
    """
    from pyspark.sql.types import MapType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, MapType):
            cols.append(F.array_sort(F.map_entries(F.col(f.name))))
        else:
            cols.append(F.col(f.name))
    return F.xxhash64(F.struct(*cols))


def parent_span_id(span: Column) -> Column:
    """First CHILD_OF reference's spanID, else "" for a root span.

    Parity with reference ``parent_span``
    (``/root/reference/traceframe/traceframe.py:429-433``): scan the
    references array in order, take the first CHILD_OF.
    """
    child_of = F.filter(span["references"], lambda r: r["refType"] == F.lit("CHILD_OF"))
    return F.coalesce(F.get(child_of, 0)["spanID"], F.lit(""))


def tags_to_map(tags: Column) -> Column:
    """Normalize a tag list ``[{key,type,value}]`` into ``map<string,string>``.

    Replaces reference ``taglist_to_tags`` (``traceframe.py:261-265``).
    Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` for dict last-wins
    semantics on duplicate keys (set by :func:`traceframe_spark.session.get_spark`).
    """
    return F.map_from_entries(
        F.transform(tags, lambda t: F.struct(t["key"].alias("key"), t["value"].alias("value")))
    )


def root_span(spans: Column) -> Column:
    """Pick the root span of a trace from its span array.

    A root span has no references (``traceframe.py:140-155``) — and a
    span whose ``references`` field is ABSENT (null after schema fill,
    routine in JSON/ES exports) is a root too: ``size(null)`` is null,
    so without the coalesce the real root fails the predicate and a
    clock-skewed child would name the trace. Fallback when no span
    qualifies (broken trace): the span with the earliest ``startTime``
    — the deterministic rule the reference leaves as a TODO
    (``traceframe.py:152-154``; its actual fallback is positional
    ``spans[0]``, which is input-order-dependent and not reproducible
    after a shuffle).
    """
    roots = F.filter(
        spans,
        lambda s: s["references"].isNull() | (F.size(s["references"]) == 0),
    )
    earliest = F.array_sort(
        spans,
        lambda a, b: F.when(a["startTime"] < b["startTime"], F.lit(-1))
        .when(a["startTime"] > b["startTime"], F.lit(1))
        .otherwise(
            F.when(a["spanID"] < b["spanID"], F.lit(-1))
            .when(a["spanID"] > b["spanID"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )
    return F.coalesce(F.get(roots, 0), F.get(earliest, 0))


def error_span_count(spans: Column) -> Column:
    """Count of ``error`` tags across a trace's spans.

    Parity with reference ``traceobj_errcount`` (``traceframe.py:177-183``),
    which increments once per matching *tag* (not per span). A span with
    a missing ``tags`` array contributes 0 — without the coalesce its
    null size would null the whole trace's count (and ``iserror``).
    """
    return F.aggregate(
        spans,
        F.lit(0),
        lambda acc, s: acc
        + F.coalesce(
            F.size(F.filter(s["tags"], lambda t: t["key"] == F.lit("error"))),
            F.lit(0),
        ),
    )


def service_of(processes: Column, process_id: Column) -> Column:
    """Map-lookup enrichment ``processes[processID].serviceName``
    (``traceframe.py:462,489``)."""
    return F.element_at(processes, process_id)["serviceName"]


RANKED_TOPK_MAX = 100
"""Upper bound on :func:`ranked_topk`'s ``k`` — the row count an
unpartitioned WindowExec may legitimately see. tests/test_plan_hygiene
asserts every unpartitioned window in the catalog sits above a limit
no larger than this."""


def ranked_topk(df, order: list[Column], k: int, rank_col: str = "rank"):
    """Top-``k`` rows plus a 1..k rank column, scale-safely.

    ``orderBy().limit(k)`` FIRST — Spark plans that as
    TakeOrderedAndProject (per-partition heaps, one k-row merge), never
    a global single-partition sort — and only THEN ``row_number()``
    over an unpartitioned window: the window's lone partition holds
    ≤ k rows by construction, so Spark's "No Partition Defined"
    warning is provably benign here. ``k`` is capped at
    :data:`RANKED_TOPK_MAX`; a bigger k wants a partitioned window,
    not this helper.

    CONTRACT: ``order`` must be a TOTAL order over the input — end it
    with a unique-id tie-break column. With ties at the k-boundary,
    both the limit's membership and the row_number ranks are
    nondeterministic (Spark may pick either tied row on different
    runs), which breaks oracle comparison. Every catalog caller
    appends an id column; do the same.
    """
    from pyspark.sql.window import Window

    if k > RANKED_TOPK_MAX:
        raise ValueError(
            f"ranked_topk k={k} exceeds the bounded-window cap "
            f"{RANKED_TOPK_MAX}; use a partitioned window instead"
        )
    top = df.orderBy(*order).limit(k)
    return top.withColumn(
        rank_col, F.row_number().over(Window.orderBy(*order)).cast("long")
    )


def partitioned_topk(
    df,
    order: list[Column],
    k: int,
    rank_col: str = "rank",
    rows_per_partition: int = 262_144,
):
    """Top-``k`` rows plus a global 1..k rank for ``k`` beyond
    :data:`RANKED_TOPK_MAX`, without an unpartitioned window.

    ``orderBy().limit(k)`` first (TakeOrderedAndProject, same as
    :func:`ranked_topk`), then ``repartitionByRange`` on the SAME order:
    Spark's range partitioning assigns contiguous sort ranges to
    ascending partition ids, so every row in partition ``i`` precedes
    every row in partition ``i+1`` under ``order``. The global rank is
    then a PARTITIONED ``row_number`` (each window sees at most
    ``rows_per_partition`` rows) plus the cumulative row count of the
    earlier partitions — one bounded collect of ``nparts`` counts. The
    ``localCheckpoint`` pins the physical partitioning so the count job
    and the rank job see identical ``spark_partition_id`` values.

    Same CONTRACT as :func:`ranked_topk`: ``order`` must be TOTAL (end
    with a unique-id tie-break) or boundary membership and ranks are
    nondeterministic.
    """
    import math

    from pyspark.sql.window import Window

    nparts = max(1, math.ceil(k / rows_per_partition))
    ranged = (
        df.orderBy(*order)
        .limit(k)
        .repartitionByRange(nparts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    acc, offsets = 0, {}
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if not offsets:
        # empty input (e.g. priority_sample with k>RANKED_TOPK_MAX and no
        # positive-weight rows): a zero-arg create_map() is map<string,
        # string> and the int _pid lookup is an AnalysisException, not an
        # empty frame — seed a typed degenerate entry instead.
        offsets = {0: 0}
    off_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    return ranged.withColumn(
        rank_col,
        (F.row_number().over(w) + F.coalesce(off_map[F.col("_pid")], F.lit(0))).cast(
            "long"
        ),
    ).drop("_pid")
