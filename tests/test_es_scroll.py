"""Driver-side ES scroll fetch (reference traceframe.py:331-402 parity).

The fake transport stands in for an ES cluster: it serves spans in pages
of a fixed size (as a real cluster caps pages at max_result_window),
independent of the requested ``size``, so the scroll-continuation loop is
actually exercised.
"""

from __future__ import annotations

import pytest

from traceframe_spark.sources.es import (
    DEFAULT_LIMIT,
    SCROLL_KEEPALIVE,
    _search_body,
    internal_spans_from_es,
    traces_from_es,
)

US = 1_000_000
T0 = 1_700_000_000 * US


def _es_span(tid, sid, parent, start, host, service="svc"):
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
            "serviceName": service,
            "tags": [{"key": "hostname", "type": "string", "value": host}],
        },
    }


class FakeES:
    """Pages spans out through the (search, scroll) transport shape."""

    def __init__(self, spans, serve_cap=10_000):
        self.spans = spans
        self.serve_cap = serve_cap  # cluster-side page cap
        self.search_calls = []
        self.scroll_calls = []
        self._cursor = 0
        self._page_size = None

    def _page(self, n):
        hits = [{"_source": s} for s in self.spans[self._cursor : self._cursor + n]]
        self._cursor += len(hits)
        return {"_scroll_id": f"sid-{self._cursor}", "hits": {"hits": hits}}

    def search(self, index, body, scroll):
        self.search_calls.append((index, body, scroll))
        self._cursor = 0
        self._page_size = min(body["size"], self.serve_cap)
        return self._page(self._page_size)

    def scroll(self, scroll_id, scroll):
        self.scroll_calls.append((scroll_id, scroll))
        return self._page(self._page_size)

    @property
    def transport(self):
        return self.search, self.scroll


def test_scroll_accumulates_pages_until_limit():
    spans = [_es_span("t", f"s{i}", None, T0 + i, "h") for i in range(35)]
    fake = FakeES(spans, serve_cap=10)  # cluster pages 10 at a time
    got = internal_spans_from_es(transport=fake.transport, limit=25)
    # pages of 10: 10, 20, 30 >= 25 -> stop; final page kept whole (ref
    # traceframe.py:390-393 appends the page before the limit check).
    assert len(got) == 30
    assert [s["spanID"] for s in got] == [f"s{i}" for i in range(30)]
    # one search + two scroll continuations, 15s keepalive throughout
    assert len(fake.search_calls) == 1
    assert len(fake.scroll_calls) == 2
    index, body, scroll = fake.search_calls[0]
    assert index == "jaeger-span-*"
    assert body["size"] == 25  # min(10000, limit)
    assert scroll == SCROLL_KEEPALIVE
    assert all(s == SCROLL_KEEPALIVE for _, s in fake.scroll_calls)


def test_scroll_stops_on_empty_page():
    spans = [_es_span("t", f"s{i}", None, T0 + i, "h") for i in range(7)]
    fake = FakeES(spans, serve_cap=5)
    got = internal_spans_from_es(transport=fake.transport, limit=2000)
    assert len(got) == 7  # 5 + 2, then an empty page ends the loop
    assert len(fake.scroll_calls) == 2  # page 2 (2 spans) + empty page


def test_scroll_empty_result():
    fake = FakeES([])
    assert internal_spans_from_es(transport=fake.transport) == []
    assert fake.scroll_calls == []


def test_default_limit_and_prefix():
    fake = FakeES([])
    internal_spans_from_es(transport=fake.transport, prefix="my-")
    index, body, _ = fake.search_calls[0]
    assert index == "my-jaeger-span-*"
    assert body["size"] == min(10_000, DEFAULT_LIMIT)
    assert body["query"] == {"match_all": {}}


def test_tagexpr_unsupported():
    fake = FakeES([])
    with pytest.raises(NotImplementedError):
        internal_spans_from_es(transport=fake.transport, tagexpr="http.status=500")


def test_bulk_connector_gate_translates_missing_jar(spark):
    """spans_from_es (the es-hadoop executor-side bulk path) must turn
    the jar-missing DataSource failure into the actionable
    NotImplementedError — this runtime ships no connector jar, which is
    exactly the condition the gate exists for. Auth options are wired
    before load(), so the gate also proves the option plumbing parses."""
    from traceframe_spark.sources.es import spans_from_es

    with pytest.raises(NotImplementedError, match="elasticsearch-spark"):
        spans_from_es(
            spark, "localhost:9200", index_prefix="x-", es_user="u", es_password="p"
        )


def test_bulk_connector_success_path(spark):
    """The bulk branch's SUCCESS path, driven without the external jar:
    a Python DataSource registered under another name stands in for
    es-hadoop (the ``source_format`` seam), echoing the reader options
    it received — proving endpoint/resource/auth wiring reaches the
    DataSource and load() returns its rows un-translated."""
    from pyspark.sql.datasource import DataSource, DataSourceReader

    from traceframe_spark.sources.es import spans_from_es

    class EchoReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def read(self, partition):
            for k in sorted(self.options):
                if k.startswith("es."):
                    yield (k, self.options[k])

    class FakeESBulk(DataSource):
        @classmethod
        def name(cls):
            return "fake_es_bulk"

        def schema(self):
            return "opt string, val string"

        def reader(self, schema):
            return EchoReader(self.options)

    spark.dataSource.register(FakeESBulk)
    got = dict(
        spans_from_es(
            spark,
            "es.internal:9200",
            index_prefix="prod-",
            es_user="svc",
            es_password="hunter2",
            source_format="fake_es_bulk",
        ).collect()
    )
    assert got == {
        "es.nodes": "es.internal:9200",
        "es.resource": "prod-jaeger-span-*",
        "es.net.http.auth.user": "svc",
        "es.net.http.auth.pass": "hunter2",
    }


def test_search_body_filters():
    body = _search_body("front", "/cart", T0, T0 + US, 500, None, 100)
    clauses = body["query"]["bool"]["filter"]
    assert {"match": {"process.serviceName": "front"}} in clauses
    assert {"match": {"operationName": "/cart"}} in clauses
    assert {"range": {"startTime": {"gte": T0, "lte": T0 + US}}} in clauses
    assert {"range": {"duration": {"gte": 500}}} in clauses


def test_traces_from_es_end_to_end(spark):
    spans = [
        _es_span("t1", "a", None, T0, "host1", service="front"),
        _es_span("t2", "c", None, T0 + 20, "host1", service="front"),
        _es_span("t1", "b", "a", T0 + 10, "host2", service="back"),
    ]
    fake = FakeES(spans, serve_cap=2)  # force a scroll continuation
    t = traces_from_es(spark, transport=fake.transport)
    rows = {r["traceID"]: r for r in t.collect()}
    assert set(rows) == {"t1", "t2"}
    assert rows["t1"]["nspans"] == 2
    assert rows["t1"]["traceName"] == "front: /op"
    # processes keyed hostname:serviceName (collision-proof id)
    assert rows["t1"]["processes"]["host2:back"]["serviceName"] == "back"
    assert rows["t2"]["nspans"] == 1
    assert len(fake.scroll_calls) >= 1


def test_spans_from_es_scroll_flat_table(spark):
    """The working form of the reference's UNIMPLEMENTED spans_from_es
    (traceframe.py:320-327): scroll -> canonical 12-col span table in one
    projection, agreeing with the regroup->spans_table route."""
    from traceframe_spark.operators.spans import SPAN_FIXED_COLUMNS, spans_table
    from traceframe_spark.sources.es import regroup_spans_to_traces, spans_from_es_scroll

    spans = [
        _es_span("t1", "r1", None, T0, "hostA", service="frontend"),
        _es_span("t1", "c1", "r1", T0 + 10, "hostB", service="backend"),
        _es_span("t2", "r2", None, T0 + 50, "hostA", service="frontend"),
    ]
    fake = FakeES(spans)
    flat = spans_from_es_scroll(spark, transport=fake.transport)
    assert flat.columns == SPAN_FIXED_COLUMNS + ["tags"]
    rows = {r["spanID"]: r for r in flat.collect()}
    assert set(rows) == {"r1", "c1", "r2"}
    assert rows["c1"]["parent"] == "r1" and rows["r1"]["parent"] == ""
    assert rows["c1"]["service"] == "backend"
    assert rows["c1"]["processID"] == "hostB:backend"  # host:service id
    assert rows["r1"]["tags"] == {"k": "v"}

    # agrees with the regroup route (modulo row order)
    import pyspark.sql.functions as F
    from traceframe_spark.sources.es import ES_SPAN_SCHEMA

    raw = spark.createDataFrame(spans, schema=ES_SPAN_SCHEMA)
    via_regroup = spans_table(regroup_spans_to_traces(raw))
    a = {tuple(str(r[c]) for c in SPAN_FIXED_COLUMNS) for r in flat.collect()}
    b = {tuple(str(r[c]) for c in SPAN_FIXED_COLUMNS) for r in via_regroup.collect()}
    assert a == b
