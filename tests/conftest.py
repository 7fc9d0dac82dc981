from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traceframe_spark.session import get_spark  # noqa: E402

# Reference test fixture (read-only); tests that need it skip when absent.
JAEGER_JSON = "/root/reference/test/jaeger.json"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "volume: multi-run cadence/stress tours (randomized crash replay, "
        "compaction cadence over many micro-batches, randomized graph "
        "sweeps). Each pins a property that a faster deterministic sibling "
        "in the default tier also covers; the tour adds volume, not new "
        "semantics. Skipped unless TF_VOLUME_TESTS=1 so the default gate "
        "fits a CI window — run the full suite with "
        "`TF_VOLUME_TESTS=1 python -m pytest tests/`.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TF_VOLUME_TESTS"):
        return
    skip = pytest.mark.skip(reason="volume tier: set TF_VOLUME_TESTS=1 to run")
    for item in items:
        if "volume" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="traceframe-spark-tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def jaeger_json_path():
    if not os.path.exists(JAEGER_JSON):
        pytest.skip("reference jaeger.json fixture not available")
    return JAEGER_JSON
