"""``spark.read.format("jaeger")`` — a Python DataSource for Jaeger.

The fully idiomatic form of the connector: the same bisecting fetch as
:mod:`traceframe_spark.sources.jaeger_http`, exposed through PySpark's
DataSource API so ingest composes like any other source — the planner
sees one scan with ``n_buckets`` input partitions (one time bucket each,
fetched in parallel on executors), and downstream explode/enrich/agg
plans on top of it without special-casing how the rows arrived.

The reference's acquisition strategy (result-cap bisection,
``/root/reference/traceframe/traceframe.py:93-136``) runs *inside each
partition*: a hot bucket bisects locally on its executor, never through
the driver.

Options (all strings, per the DataSource API):

- ``endpoint``  Jaeger base URL (required unless synthetic)
- ``service``   service name to query (required unless synthetic)
- ``start`` / ``end``  µs-epoch time range (required)
- ``n_buckets``  partition count (default 64)
- ``limit_per_bucket``  optional per-bucket trace cap
- ``result_cap``  server clip threshold (default 1500)
- ``synthetic_n`` / ``synthetic_base_us`` / ``synthetic_step_us``
  use the offline synthetic transport instead of HTTP (tests/demos)
- ``headers``  JSON object of HTTP headers (auth tokens etc.), and/or
  repeated ``header.X-Foo`` options — forwarded to every fetch, batch
  and stream

Usage::

    spark.dataSource.register(JaegerDataSource)
    df = (spark.read.format("jaeger")
          .option("endpoint", "http://jaeger:16686")
          .option("service", "frontend")
          .option("start", str(t0)).option("end", str(t1))
          .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from traceframe_spark.schemas import RAW_TRACE_SCHEMA
from traceframe_spark.sources.jaeger_http import (
    JAEGER_MAX_TRACES_RETURNABLE,
    _conform_trace,
    _requests_fetch,
    get_traces,
    synthetic_fetch_factory,
    time_buckets,
)


def _headers_from_options(options: dict) -> dict[str, str] | None:
    """HTTP headers from DataSource options: a JSON-encoded ``headers``
    object and/or repeated ``header.<Name>`` entries (DataSource options
    are flat strings, so structured values need one of these spellings).
    ``header.<Name>`` wins on conflict; returns None when neither given
    so the fetch layer's default applies."""
    headers: dict[str, str] = {}
    if "headers" in options:
        import json

        parsed = json.loads(options["headers"])
        if not isinstance(parsed, dict):
            raise ValueError("'headers' option must be a JSON object")
        headers.update({str(k): str(v) for k, v in parsed.items()})
    for key, value in options.items():
        if key.startswith("header."):
            headers[key[len("header."):]] = value
    return headers or None


def _to_tuple(value, dtype: DataType):
    """Recursively conform a plain-dict row to the tuple shape the
    DataSource row protocol expects for nested StructTypes."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(_to_tuple(value.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return [_to_tuple(v, dtype.elementType) for v in value]
    if isinstance(dtype, MapType):
        return {k: _to_tuple(v, dtype.valueType) for k, v in value.items()}
    return value


class TimeBucket(InputPartition):
    def __init__(self, start_us: int, end_us: int):
        self.start_us = start_us
        self.end_us = end_us


class JaegerReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.start = int(self._req("start"))
        self.end = int(self._req("end"))
        self.n_buckets = int(self.options.get("n_buckets", "64"))
        self.limit_per_bucket = (
            int(self.options["limit_per_bucket"])
            if "limit_per_bucket" in self.options
            else None
        )
        self.result_cap = int(
            self.options.get("result_cap", str(JAEGER_MAX_TRACES_RETURNABLE))
        )
        self.synthetic = "synthetic_n" in self.options
        self.headers = _headers_from_options(self.options)
        if not self.synthetic:
            self._req("endpoint")
            self._req("service")
        if self.end < self.start:
            raise ValueError(
                f"jaeger datasource: end ({self.end}) must be >= start ({self.start})"
            )

    def _req(self, key: str) -> str:
        if key not in self.options:
            raise ValueError(f"jaeger datasource requires option '{key}'")
        return self.options[key]

    def partitions(self) -> Sequence[InputPartition]:
        if self.end == self.start:
            # single-µs [t, t] query — valid for the inclusive Jaeger API,
            # but time_buckets() (half-open input range) would yield no
            # partitions and the engine would call read(None)
            return [TimeBucket(self.start, self.end)]
        return [TimeBucket(s, e) for s, e in time_buckets(self.start, self.end, self.n_buckets)]

    def read(self, partition: TimeBucket) -> Iterator[tuple]:
        if self.synthetic:
            fetch = synthetic_fetch_factory(
                int(self.options.get("synthetic_base_us", "0")),
                int(self.options["synthetic_n"]),
                int(self.options.get("synthetic_step_us", "5000000")),
            )()
            service = self.options.get("service", "svc")
        else:
            fetch = _requests_fetch(
                self.options["endpoint"],
                self.headers,
            )
            service = self.options["service"]
        traces = get_traces(
            service,
            fetch=fetch,
            start=partition.start_us,
            end=partition.end_us,
            limit=self.limit_per_bucket,
            result_cap=self.result_cap,
        )
        for t in traces:
            yield _to_tuple(_conform_trace(t), RAW_TRACE_SCHEMA)


class JaegerStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of the trace feed: each microbatch fetches the
    traces whose start time landed in [last_offset, fetch_horizon) and
    advances the offset — a poll-based source with exactly-once batches
    (offsets checkpoint through the engine; ``read`` is re-runnable for
    a given range via ``readBetweenOffsets`` on recovery).

    Extra options over the batch reader:

    - ``stream_start_us``  where the first batch begins (default: now)
    - ``horizon_lag_us``   stay this far behind the wall clock so
      late-arriving spans are indexed before their window is read
      (default 5 s — the streaming analogue of a watermark on the
      *source* side)
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.headers = _headers_from_options(self.options)
        self.horizon_lag_us = int(self.options.get("horizon_lag_us", "5000000"))
        self.synthetic = "synthetic_n" in self.options
        if not self.synthetic:
            # fail at stream definition, not inside the first microbatch
            for key in ("endpoint", "service"):
                if key not in self.options:
                    raise ValueError(f"jaeger datasource requires option '{key}'")

    def _fetch_and_service(self):
        if self.synthetic:
            fetch = synthetic_fetch_factory(
                int(self.options.get("synthetic_base_us", "0")),
                int(self.options["synthetic_n"]),
                int(self.options.get("synthetic_step_us", "5000000")),
            )()
            return fetch, self.options.get("service", "svc")
        return (
            _requests_fetch(self.options["endpoint"], self.headers),
            self.options["service"],
        )

    def _now_us(self) -> int:
        if "synthetic_now_us" in self.options:
            return int(self.options["synthetic_now_us"])
        import time

        return int(time.time() * 1_000_000)

    def initialOffset(self) -> dict:
        start = int(self.options.get("stream_start_us", self._now_us()))
        return {"start_us": start}

    def read(self, start: dict) -> tuple:
        lo = int(start["start_us"])
        hi = max(self._now_us() - self.horizon_lag_us, lo)
        if hi <= lo:
            # idle poll: offset does not advance. The engine's prefetch
            # wrapper probes this case with next(), so it must be an
            # ITERATOR; the data branch below stays a list (it is only
            # copied/chained) because a generator can't pickle.
            return iter(()), {"start_us": lo}
        return self._read_range(lo, hi), {"start_us": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._read_range(int(start["start_us"]), int(end["start_us"]))

    def _read_range(self, lo: int, hi: int) -> list[tuple]:
        # returns a LIST: the engine's prefetch cache pickles the row
        # iterator between planning and execution; a generator can't pickle
        fetch, service = self._fetch_and_service()
        traces = get_traces(
            service,
            fetch=fetch,
            start=lo,
            end=hi - 1,  # API bounds are inclusive-µs; offset ranges half-open
            result_cap=int(
                self.options.get("result_cap", str(JAEGER_MAX_TRACES_RETURNABLE))
            ),
        )
        return [_to_tuple(_conform_trace(t), RAW_TRACE_SCHEMA) for t in traces]


class JaegerDataSource(DataSource):
    """Register with ``spark.dataSource.register(JaegerDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jaeger"

    def schema(self) -> StructType:
        return RAW_TRACE_SCHEMA

    def reader(self, schema: StructType) -> JaegerReader:
        return JaegerReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> JaegerStreamReader:
        return JaegerStreamReader(self.options)
