from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traceframe_spark.session import get_spark  # noqa: E402

# Reference test fixture (read-only); tests that need it skip when absent.
JAEGER_JSON = "/root/reference/test/jaeger.json"


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
