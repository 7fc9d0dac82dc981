"""Plan-hygiene gate: every catalog query must build a physical plan
free of scale red flags (tools/plan_audit.py checks: cartesian products,
non-broadcast nested-loop joins, unpruned wide scans, sort-merge joins
on tiny dimensions). Runs at sf0.001 — planning cost only."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tools.plan_audit import audit_one  # noqa: E402

SF = "/root/testdata/sf0.001"
QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_hard_flags(spark, name):
    flags = audit_one(name, QUERIES[name](spark, SF))
    hard = [f for f in flags if f.startswith("HARD:")]
    assert not hard, f"{name}: {hard}"


def test_pipeline_plans_have_intended_shapes(spark):
    """Positive plan pins (beyond no-red-flags): the designs the scale
    notes promise actually plan that way."""
    from tools.plan_audit import n_shuffles, plan_of

    # decontamination: benchmark gram set broadcasts; corpus side never
    # pays a distinct shuffle of exploded grams (one groupBy + the tiny
    # bench-side distinct only)
    plan = plan_of(QUERIES["contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert n_shuffles(plan) <= 2, plan

    # cross-corpus subtraction routes through the band-bucket equi-join,
    # not any nested-loop/cartesian form
    plan = plan_of(QUERIES["cross_dedup"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    # chunking is a pure scan->generate->project pipeline: zero exchanges
    plan = plan_of(QUERIES["doc_chunks"](spark, SF))
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_tpch_plans_broadcast_tiny_dims(spark):
    """TPC-H positive pins: tiny dimensions (region 5 rows / nation 25
    rows at ANY scale factor) must come in through broadcast joins —
    never a sort-merge join that shuffles the fact side on a dim key —
    and the top-k queries must plan TakeOrderedAndProject, not a global
    sort."""
    from tools.plan_audit import audit_one, plan_of

    for name in ("tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18"):
        df = QUERIES[name](spark, SF)
        plan = plan_of(df)
        assert "BroadcastHashJoin" in plan, name
        soft_smj = [f for f in audit_one(name, df) if "smj-on-tiny-dim" in f]
        assert not soft_smj, (name, soft_smj)

    for name in ("tpch_q3", "tpch_q18"):
        assert "TakeOrderedAndProject" in plan_of(QUERIES[name](spark, SF)), name


def test_search_traces_single_scan(spark, jaeger_json_path):
    """search_traces must read the span store exactly ONCE: the
    any-span-matches test rides the per-trace aggregation (max(when))
    instead of a filtered-ids scan + second scan + join."""
    from tools.plan_audit import plan_of
    from traceframe_spark.operators.search import search_traces
    from traceframe_spark.sources.jaeger_file import spans_from_jaeger_file

    dfS = spans_from_jaeger_file(spark, jaeger_json_path)
    store = "/tmp/_hygiene_span_store"
    dfS.write.mode("overwrite").parquet(store)
    plan = plan_of(
        search_traces(
            spark.read.parquet(store), service="frontend", operation="/checkout"
        )
    )
    from tools.plan_audit import n_scans

    assert n_scans(plan) == 1, plan
    assert "Join" not in plan  # the old semi-join shape must not return
    assert "TakeOrderedAndProject" in plan


def test_temporal_plan_shapes(spark):
    """Temporal-suite positive pins.

    - asof_join plans as the union+window sorted-merge (ONE exchange on
      the join key, no physical Join node — the as-of match is a
      last-value window over the interleaved sides, so there is no
      per-row range probe to skew).
    - time_rollup is the two-level continuous aggregate: exactly two
      exchanges — the minute layer over raw rows, then the coarsen merge
      over the ~raw/1000 rollup — and never a join back to raw.
    - sessionize pays ONE shuffle total: the lag window, the
      cumulative-sum window, and both aggregation layers all reuse the
      user_id partitioning.
    """
    from tools.plan_audit import n_shuffles, plan_of

    plan = plan_of(QUERIES["asof_join"](spark, SF))
    assert n_shuffles(plan) == 1, plan
    assert "Window" in plan and "Join" not in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type," in plan

    plan = plan_of(QUERIES["time_rollup"](spark, SF))
    assert n_shuffles(plan) == 2, plan
    assert "Join" not in plan

    import re

    plan = plan_of(QUERIES["sessionize"](spark, SF))
    assert n_shuffles(plan) == 1, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) >= 2, plan


def test_bm25_plan_shape(spark):
    """bm25_topk: the document-frequency/length statistics reduce to ONE
    row via a single-partition aggregate and broadcast into the scoring
    scan (an intended one-row cross build); the per-document TF pass is
    a pure scan with no hash exchange, and the final top-k is
    TakeOrderedAndProject."""
    from tools.plan_audit import n_shuffles, plan_of

    plan = plan_of(QUERIES["bm25_topk"](spark, SF))
    assert n_shuffles(plan) == 0, plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan

def test_mlprep_plan_shapes(spark):
    """ML-prep positive pins matching the suite's scale claims:

    - embed_quantize is a pure scan→project (zero exchanges — every
      per-vector statistic folds in one pass);
    - inflight_concurrency carries exactly TWO exchanges at any scale
      (per-day delta agg, then the supplier window whose partitioning
      the final max reuses);
    - semantic_dedup shuffles ONCE (the cluster groupBy): assignment is
      a mapInPandas scan, and the pair stage reuses the cluster
      partitioning for its aggregate... the per-centroid agg rides the
      same hash key, so two exchanges total including the tiny final
      sort is the ceiling;
    - ann_cosine_blas's ranking window receives the kernel's partial
      top-k output, not a full n×q pair set — the plan has no join at
      all (query side lives in the task closure), one exchange for the
      qid window.
    """
    from tools.plan_audit import n_shuffles, plan_of

    plan = plan_of(QUERIES["embed_quantize"](spark, SF))
    assert "Exchange" not in plan, plan

    plan = plan_of(QUERIES["inflight_concurrency"](spark, SF))
    assert n_shuffles(plan) == 2, plan

    plan = plan_of(QUERIES["semantic_dedup"](spark, SF))
    assert n_shuffles(plan) <= 3, plan  # cluster groupBy + agg + orderBy
    assert "Join" not in plan and "CartesianProduct" not in plan

    plan = plan_of(QUERIES["ann_cosine_blas"](spark, SF))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert n_shuffles(plan) == 1, plan


def test_r04_additions_plan_shapes(spark):
    """Positive pins for the round-4 additions:
    - full_outer_join: sort-merge FULL OUTER (both sides preserved —
      broadcast is impossible), exactly the 2 key shuffles, no NLJ
    - range_interval_window: ONE exchange feeding the RANGE-frame window
    - quality_resample: ZERO exchanges — the Bernoulli filter lives in
      the scan's pushed-down stage
    - video_features: ZERO exchanges, two MapInPandas stages, and the
      scan reads ONLY doc_id (column pruning through mapInPandas)
    """
    from tools.plan_audit import n_shuffles, plan_of

    plan = plan_of(QUERIES["full_outer_join"](spark, SF))
    assert "SortMergeJoin FullOuter" in plan
    assert n_shuffles(plan) == 2, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    plan = plan_of(QUERIES["range_interval_window"](spark, SF))
    assert n_shuffles(plan) == 1, plan
    assert "Window" in plan

    plan = plan_of(QUERIES["quality_resample"](spark, SF))
    assert "Exchange" not in plan, plan

    plan = plan_of(QUERIES["video_features"](spark, SF))
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") >= 2
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_smj_tiny_dim_check_sensitivity_and_specificity(spark):
    """The subtree-aware tiny-dim check (r05 replacement for a raw-text
    proximity regex): a forced merge join ON nation flags; the default
    broadcast join does not; and a fact-fact SMJ whose side merely
    CONTAINS an upstream broadcast nation join does not (the q2/q20
    false-positive class)."""
    from tools.plan_audit import plan_of, smj_tiny_dim_flags

    n = spark.read.parquet(f"{SF}/nation.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    bad = s.join(n.hint("merge"), s.s_nationkey == n.n_nationkey)
    assert smj_tiny_dim_flags(plan_of(bad)) == ["SOFT:smj-on-tiny-dim(nation)"]

    good = s.join(n, s.s_nationkey == n.n_nationkey)
    assert smj_tiny_dim_flags(plan_of(good)) == []

    # fact-fact SMJ; nation joined broadcast upstream on one side
    from pyspark.sql import functions as F

    enriched = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    factfact = li.hint("merge").join(enriched, li.l_suppkey == enriched.s_suppkey)
    plan = plan_of(factfact)
    assert "SortMergeJoin" in plan  # the shape under test actually planned
    assert smj_tiny_dim_flags(plan) == []


def test_unpartitioned_window_bound_check(spark):
    """Unpartitioned WindowExec is OK only above a ≤100-row limit (the
    ranked_topk pattern); a global unpartitioned window flags; a
    partitioned window never flags."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tools.plan_audit import plan_of, unpartitioned_window_flags
    from traceframe_spark.functions import ranked_topk

    n = spark.read.parquet(f"{SF}/nation.parquet")

    good = ranked_topk(n, [F.col("n_nationkey").asc()], 5, rank_col="rn")
    assert unpartitioned_window_flags(plan_of(good)) == []

    bad = n.withColumn("rn", F.row_number().over(Window.orderBy("n_nationkey")))
    assert unpartitioned_window_flags(plan_of(bad)) != []

    part = n.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("n_regionkey").orderBy("n_nationkey")),
    )
    assert unpartitioned_window_flags(plan_of(part)) == []


def test_ranked_topk_caps_k():
    import pytest as _pytest

    from traceframe_spark.functions import ranked_topk

    with _pytest.raises(ValueError, match="bounded-window cap"):
        ranked_topk(None, [], 101)


def test_smj_check_sees_subquery_sections(spark):
    """A forced merge join on nation INSIDE a scalar subquery must flag
    like any main-tree join (the formatted plan prints subquery trees
    in a separate section); the default broadcast plan stays clean."""
    from tools.plan_audit import plan_of, smj_tiny_dim_flags

    n = spark.read.parquet(f"{SF}/nation.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n.createOrReplaceTempView("hyg_nv")
    s.createOrReplaceTempView("hyg_sv")

    bad = spark.sql(
        "SELECT * FROM hyg_sv WHERE s_acctbal > "
        "(SELECT /*+ MERGE(hyg_nv) */ avg(n_nationkey) FROM hyg_nv "
        " JOIN hyg_sv s2 ON hyg_nv.n_nationkey = s2.s_nationkey)"
    )
    plan = plan_of(bad)
    assert "===== Subqueries =====" in plan  # the shape under test
    assert "SOFT:smj-on-tiny-dim(nation)" in smj_tiny_dim_flags(plan)

    good = spark.sql(
        "SELECT * FROM hyg_sv WHERE s_acctbal > "
        "(SELECT avg(n_nationkey) FROM hyg_nv "
        " JOIN hyg_sv s2 ON hyg_nv.n_nationkey = s2.s_nationkey)"
    )
    assert smj_tiny_dim_flags(plan_of(good)) == []


def test_unpartitioned_window_limit_must_be_on_the_spine(spark):
    """A <=100-row limit on the BROADCAST SIDE of a join does not bound
    a global unpartitioned window over the join output — the audit must
    still flag it (the limit-anywhere-in-subtree hole)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tools.plan_audit import plan_of, unpartitioned_window_flags

    n = spark.read.parquet(f"{SF}/nation.parquet").limit(5)
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    bad = joined.withColumn("rn", F.row_number().over(Window.orderBy("s_suppkey")))
    assert unpartitioned_window_flags(plan_of(bad)) != []

    # ...while the genuine ranked_topk spine shape still audits clean
    from traceframe_spark.functions import ranked_topk

    good = ranked_topk(joined, [F.col("s_suppkey").asc()], 5, rank_col="rn")
    assert unpartitioned_window_flags(plan_of(good)) == []


def test_partitioned_topk_multi_partition_global_rank(spark):
    """partitioned_topk: range repartition + per-partition row_number +
    cumulative offsets must reproduce the exact global 1..k rank across
    several physical partitions (rows_per_partition forces nparts=5)."""
    from pyspark.sql import functions as F

    from traceframe_spark.functions import partitioned_topk

    df = spark.createDataFrame(
        [((i * 7919) % 1000, i) for i in range(1000)], "v: long, id: long"
    )
    out = partitioned_topk(
        df, [F.col("v").asc(), F.col("id").asc()], 300, rows_per_partition=64
    ).collect()
    assert len(out) == 300
    ordered = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in ordered] == list(range(1, 301))
    # global rank order == value order (v is a permutation, so distinct)
    assert [r["v"] for r in ordered] == sorted(r["v"] for r in out)
    assert [r["v"] for r in ordered] == sorted({(i * 7919) % 1000 for i in range(1000)})[:300]


def test_lsh_cap_rejects_sub_one(spark):
    """max_pairs_per_bucket < 1 is a contract error, not a silent
    clamp-to-one-pair (the C(2,2) floor would exceed the stated bound)."""
    import pytest as _pytest

    from traceframe_spark.operators.dedup import lsh_candidate_pairs

    with _pytest.raises(ValueError, match="max_pairs_per_bucket"):
        lsh_candidate_pairs(None, max_pairs_per_bucket=0)
