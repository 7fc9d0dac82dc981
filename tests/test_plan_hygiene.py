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
