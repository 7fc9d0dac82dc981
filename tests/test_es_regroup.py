"""ES span regroup: flat span rows → raw trace documents → standard tables."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from traceframe_spark.operators import traces_table
from traceframe_spark.schemas import PROCESS_TYPE, REFERENCE_TYPE, TAG_TYPE
from traceframe_spark.sources.es import regroup_spans_to_traces

ES_SPAN_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField("spanID", StringType()),
        StructField("flags", LongType()),
        StructField("operationName", StringType()),
        StructField("references", ArrayType(REFERENCE_TYPE)),
        StructField("startTime", LongType()),
        StructField("duration", LongType()),
        StructField("tags", ArrayType(TAG_TYPE)),
        StructField("logs", ArrayType(StringType())),
        StructField("process", PROCESS_TYPE),
    ]
)

US = 1_000_000
T0 = 1_700_000_000 * US


def _raw_es_span(tid, sid, parent, start, host):
    refs = [] if parent is None else [
        {"refType": "CHILD_OF", "traceID": tid, "spanID": parent}
    ]
    return {
        "traceID": tid,
        "spanID": sid,
        "flags": 1,
        "operationName": "/op",
        "references": refs,
        "startTime": start,
        "duration": 1000,
        "tags": [{"key": "k", "type": "string", "value": "v"}],
        "logs": [],
        "process": {
            "serviceName": f"svc-{host}",
            "tags": [{"key": "hostname", "type": "string", "value": host}],
        },
    }


def test_regroup_to_traces(spark):
    rows = [
        _raw_es_span("t1", "a", None, T0, "host1"),
        _raw_es_span("t1", "b", "a", T0 + 10, "host2"),
        _raw_es_span("t2", "c", None, T0 + 20, "host1"),
    ]
    df = spark.createDataFrame(rows, schema=ES_SPAN_SCHEMA)
    raw = regroup_spans_to_traces(df)
    got = {r["traceID"]: r for r in raw.collect()}
    assert set(got) == {"t1", "t2"}
    assert len(got["t1"]["spans"]) == 2
    # processID synthesized as hostname:serviceName (collision-proof:
    # two services on one host stay distinct map entries)
    assert {s["processID"] for s in got["t1"]["spans"]} == {
        "host1:svc-host1",
        "host2:svc-host2",
    }
    assert got["t1"]["processes"]["host2:svc-host2"]["serviceName"] == "svc-host2"
    # downstream traces_table works on the regrouped form
    t = traces_table(raw.withColumn(
        "spans",
        F.expr("transform(spans, s -> named_struct("
               "'traceID', s.traceID, 'spanID', s.spanID, 'flags', s.flags,"
               "'operationName', s.operationName, 'references', s.references,"
               "'startTime', s.startTime, 'duration', s.duration,"
               "'tags', s.tags, 'logs', s.logs, 'processID', s.processID,"
               "'warnings', CAST(NULL AS ARRAY<STRING>)))"),
    ))
    rows_t = {r["traceID"]: r for r in t.collect()}
    assert rows_t["t1"]["nspans"] == 2
    assert rows_t["t1"]["traceName"] == "svc-host1: /op"


def test_regroup_survives_missing_hostname_and_shared_host(spark):
    """Two review regressions: (1) a process without the hostname tag
    must degrade to an 'unknown:<service>' id, not abort the job with
    NULL_MAP_KEY; (2) two services sharing one host must keep separate
    process-map entries, not collapse into an arbitrary winner."""
    rows = [
        _raw_es_span("t1", "a", None, T0, "hostX"),
        _raw_es_span("t1", "b", "a", T0 + 10, "hostX"),
        _raw_es_span("t1", "c", "a", T0 + 20, "hostY"),
    ]
    # span b: same host as a but a DIFFERENT service; span c: no hostname
    rows[1]["process"] = {
        "serviceName": "other-svc",
        "tags": [{"key": "hostname", "type": "string", "value": "hostX"}],
    }
    rows[2]["process"] = {"serviceName": "bare-svc", "tags": []}
    df = spark.createDataFrame(rows, schema=ES_SPAN_SCHEMA)
    got = {r["traceID"]: r for r in regroup_spans_to_traces(df).collect()}
    procs = got["t1"]["processes"]
    assert procs["hostX:svc-hostX"]["serviceName"] == "svc-hostX"
    assert procs["hostX:other-svc"]["serviceName"] == "other-svc"
    assert procs["unknown:bare-svc"]["serviceName"] == "bare-svc"
