"""Property-based tests for the critical-path kernel.

The reference pins one golden trace; these generate thousands of random
span trees and check the structural invariants the sweep must uphold —
plus determinism under input permutation, which the reference does NOT
have (it depends on input order for ties) and a distributed engine must.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from traceframe_spark.operators.critical_path import critical_segments_of_trace

BASE = 1_700_000_000_000_000


def _make_span(tid, sid, start, dur, parent):
    return {
        "traceID": tid,
        "spanID": sid,
        "operationName": f"op-{sid}",
        "startTime": start,
        "duration": dur,
        "processID": "p1",
        "parent": parent,
        "service": "svc",
    }


@st.composite
def nested_trace(draw):
    """A properly nested span tree: each child lies strictly inside its
    parent, all event times distinct."""
    n = draw(st.integers(min_value=1, max_value=10))
    used_times: set[int] = set()

    def fresh(lo, hi):
        # distinct times so ordering is unambiguous
        for _ in range(200):
            t = draw(st.integers(min_value=lo, max_value=hi))
            if t not in used_times:
                used_times.add(t)
                return t
        return None

    root_start = BASE + draw(st.integers(0, 10**9))
    used_times.update([root_start])
    root_dur = draw(st.integers(min_value=2 * n * 4 + 10, max_value=10**8))
    used_times.add(root_start + root_dur)
    spans = [_make_span("t", "s0", root_start, root_dur, "")]
    bounds = {"s0": (root_start, root_start + root_dur)}
    for i in range(1, n):
        parent = draw(st.sampled_from([s["spanID"] for s in spans]))
        plo, phi = bounds[parent]
        if phi - plo < 6:
            continue
        a = fresh(plo + 1, phi - 2)
        if a is None:
            continue
        b = fresh(a + 1, phi - 1)
        if b is None:
            continue
        sid = f"s{i}"
        spans.append(_make_span("t", sid, a, b - a, parent))
        bounds[sid] = (a, b)
    return spans


@settings(max_examples=200, deadline=None)
@given(nested_trace())
def test_nested_tree_invariants(spans):
    segs = critical_segments_of_trace(spans)
    assert len(segs) >= 1
    root = spans[0]
    # ordered, non-overlapping, within the root interval
    prev_end = root["startTime"]
    total = 0
    for start, dur, span in segs:
        assert dur >= 0
        assert start >= prev_end
        prev_end = start + dur
        total += dur
        assert span["spanID"] in {s["spanID"] for s in spans}
    assert prev_end <= root["startTime"] + root["duration"]
    # for properly nested trees the path partitions the root duration
    assert total == root["duration"]
    # first segment starts at the root start
    assert segs[0][0] == root["startTime"]


@settings(max_examples=100, deadline=None)
@given(nested_trace(), st.randoms())
def test_permutation_invariance(spans, rnd):
    """Input order must not change the result (Spark shuffles destroy
    order; the kernel sorts events with a total key)."""
    baseline = [(s, d, sp["spanID"]) for s, d, sp in critical_segments_of_trace(spans)]
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    again = [(s, d, sp["spanID"]) for s, d, sp in critical_segments_of_trace(shuffled)]
    assert again == baseline


def test_async_child_outlives_parent():
    """Reference TODO (traceframe.py:205): child returns after the root.
    Sweep must not crash and must stay ordered."""
    spans = [
        _make_span("t", "root", BASE, 1000, ""),
        _make_span("t", "async", BASE + 100, 5000, "root"),  # ends after root
    ]
    segs = critical_segments_of_trace(spans)
    assert len(segs) >= 1
    for (s1, d1, _), (s2, _, _) in zip(segs, segs[1:]):
        assert s1 + d1 <= s2


def test_async_child_overhang_attribution_exact():
    """The documented attribution rule for a child that outlives its
    parent: the parent's Return splits the child's segment, and the
    overhang past the parent's end is attributed to the CHILD — the
    critical path extends to the trace's last Return, not the root's."""
    spans = [
        _make_span("t", "root", BASE, 1000, ""),
        _make_span("t", "async", BASE + 100, 5000, "root"),  # ends at +5100
    ]
    segs = [(s - BASE, d, sp["spanID"]) for s, d, sp in critical_segments_of_trace(spans)]
    assert segs == [
        (0, 100, "root"),
        (100, 900, "async"),  # up to the root's Return
        (1000, 4100, "async"),  # overhang: still the child's time
    ]
    assert sum(d for _, d, _ in segs) == 5100  # root start -> LAST Return


def test_overlapping_siblings_oldest_live_child_leads():
    """Concurrent siblings (fan-out): leadership stays with the OLDEST
    still-live child in call order; the younger sibling's Return only
    splits the leader's segment and earns no attribution of its own."""
    spans = [
        _make_span("t", "root", BASE, 1000, ""),
        _make_span("t", "c1", BASE + 100, 500, "root"),  # 100..600
        _make_span("t", "c2", BASE + 200, 200, "root"),  # 200..400, inside c1
    ]
    segs = [(s - BASE, d, sp["spanID"]) for s, d, sp in critical_segments_of_trace(spans)]
    assert segs == [
        (0, 100, "root"),
        (100, 300, "c1"),  # split at c2's Return...
        (400, 200, "c1"),  # ...but c1 keeps the lead; c2 gets nothing
        (600, 400, "root"),
    ]


def test_zero_duration_child_at_parent_return_instant():
    """An instant child exactly at the parent's Return: its Call/Return
    pair resolves BEFORE the parent's Return at that timestamp (the
    kernel's (-2,-1) event orders), yielding two zero-length blips and
    an unchanged duration partition."""
    spans = [
        _make_span("t", "root", BASE, 1000, ""),
        _make_span("t", "z", BASE + 1000, 0, "root"),
    ]
    segs = [(s - BASE, d, sp["spanID"]) for s, d, sp in critical_segments_of_trace(spans)]
    assert segs == [
        (0, 1000, "root"),
        (1000, 0, "z"),
        (1000, 0, "root"),
    ]
    assert sum(d for _, d, _ in segs) == 1000


def test_simultaneous_call_and_return():
    """A child starts exactly when its sibling ends: the Return sorts
    first (documented tie-break), so the parent resumes for 0µs."""
    spans = [
        _make_span("t", "root", BASE, 1000, ""),
        _make_span("t", "a", BASE + 100, 200, "root"),
        _make_span("t", "b", BASE + 300, 200, "root"),  # starts at a's end
    ]
    segs = critical_segments_of_trace(spans)
    assert [(s - BASE, d, sp["spanID"]) for s, d, sp in segs] == [
        (0, 100, "root"),
        (100, 200, "a"),
        (300, 0, "root"),  # zero-length resume between back-to-back children
        (300, 200, "b"),
        (500, 500, "root"),
    ]


def test_two_roots():
    """Multiple parentless spans (broken instrumentation): the earliest
    leads; no crash, ordered output."""
    spans = [
        _make_span("t", "r1", BASE, 1000, ""),
        _make_span("t", "r2", BASE + 2000, 1000, ""),
    ]
    segs = critical_segments_of_trace(spans)
    assert len(segs) >= 1
    for (s1, d1, _), (s2, _, _) in zip(segs, segs[1:]):
        assert s1 + d1 <= s2


def test_random_soup_never_crashes():
    """Fuzz: arbitrary (even non-tree) parent pointers and overlaps."""
    rnd = random.Random(42)
    for _ in range(300):
        n = rnd.randint(1, 12)
        ids = [f"s{i}" for i in range(n)]
        spans = []
        for i, sid in enumerate(ids):
            parent = rnd.choice([""] + ids[:i] + ["ghost"])
            start = BASE + rnd.randint(0, 5000)
            spans.append(_make_span("t", sid, start, rnd.randint(0, 3000), parent))
        segs = critical_segments_of_trace(spans)
        for (s1, d1, _), (s2, _, _) in zip(segs, segs[1:]):
            assert s1 + d1 <= s2


@given(nested_trace(), st.data())
@settings(max_examples=40, deadline=None)
def test_zero_duration_spans_do_not_break_the_sweep(spans, data):
    """Zero-duration (instant) spans are real — log-like spans and
    sub-µs truncation both produce them. The sweep must neither crash
    (a Return sorting before its own Call once KeyError'd the kernel)
    nor change the partition property: total critical time still equals
    the root duration, zero-length blips included."""
    root = spans[0]
    # inject an instant child at an arbitrary interior time of a random
    # parent, INCLUDING boundary collisions with existing event times
    parent = data.draw(st.sampled_from(spans))
    t = data.draw(
        st.integers(
            min_value=parent["startTime"],
            max_value=parent["startTime"] + parent["duration"],
        )
    )
    instant = {
        "traceID": "t",
        "spanID": "zz",
        "operationName": "instant",
        "startTime": t,
        "duration": 0,
        "processID": "p",
        "service": "svc",
        "parent": parent["spanID"],
    }
    segs = critical_segments_of_trace(spans + [instant])
    assert segs
    total = sum(d for _, d, _ in segs)
    assert total == root["duration"]
    for _, d, _ in segs:
        assert d >= 0
