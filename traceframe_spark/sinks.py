"""Sinks: partitioned writers for the canonical tables.

The reference has NO writers (outputs are in-memory frames and notebook
figures, SURVEY.md §2.A); at 100 TB the storage layout IS the query
plan, so the engine ships opinionated writers:

- spans partition by event date + a traceID hash bucket: date pruning
  for time-range queries, bounded file counts per partition, and
  co-located traces for the critical-path shuffle (a reader that
  bucket-joins on trace_bucket avoids a full shuffle).
- traces partition by date only (small rows, high-value scans).

Writers take mode/compression but pin the layout so every writer in a
pipeline produces the same physical shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256


_TARGET_BUCKET_BYTES = 128 << 20  # ~one healthy parquet file per bucket
_MAX_ADAPTIVE_BUCKETS = 4096  # beyond this, split files WITHIN a bucket
# (the compact_span_store slot trick), not the bucket space — dirs/date
# stays bounded


def _adaptive_buckets(spans: DataFrame) -> int:
    """trace_bucket count scaled to the INPUT SIZE (~128 MB of source
    bytes per bucket), clamped to [1, 4096]. A fixed 256 writes 256
    near-empty files per date at small scale (measured: 768 files for a
    19 MB store — the span-store scan's entire cost was file overhead)
    and one 390 GB single-task file per bucket at 100 TB/day; deriving
    the count from the optimizer's size estimate fixes both ends
    (guide §6 file sizing). Falls back to DEFAULT_BUCKETS when the plan
    has no usable estimate. Layout-only: trace_bucket is dropped on
    read and never pruned or joined on, so stores whose appends picked
    different counts stay correct."""
    try:
        size = int(
            spans._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — estimate is an optimization only
        return DEFAULT_BUCKETS
    if size <= 0 or size >= (1 << 60):  # unknown/default stats
        return DEFAULT_BUCKETS
    return max(1, min(_MAX_ADAPTIVE_BUCKETS, -(-size // _TARGET_BUCKET_BYTES)))


def write_spans(
    spans: DataFrame,
    path: str,
    mode: str = "error",
    n_buckets: int | None = None,
    compression: str = "zstd",
) -> None:
    """Span table → parquet partitioned by (span_date, trace_bucket).

    ``span_date`` is the UTC calendar day computed by pure integer
    arithmetic on the µs epoch (``date_from_unix_date(startTime div
    86400e6)``) — NOT ``to_date(timestamp_micros(...))``, which resolves
    in the session timezone and would let differently-configured writers
    split the same instant across two partition directories (and make
    date pruning depend on who wrote the file).

    ``n_buckets=None`` (default) sizes the bucket space to the input
    (see :func:`_adaptive_buckets`); pass an explicit count to pin a
    stable layout across many appends to one store."""
    if n_buckets is None:
        n_buckets = _adaptive_buckets(spans)
    out = spans.withColumn(
        "span_date",
        F.date_from_unix_date(F.expr("startTime div 86400000000").cast("int")),
    ).withColumn("trace_bucket", F.pmod(F.xxhash64("traceID"), F.lit(n_buckets)))
    (
        out.repartition("span_date", "trace_bucket")
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("span_date", "trace_bucket")
        .parquet(path)
    )


def read_spans(spark, path: str) -> DataFrame:
    """Read a span table written by :func:`write_spans`, dropping the
    layout columns."""
    return spark.read.parquet(path).drop("span_date", "trace_bucket")


def write_traces(
    traces: DataFrame, path: str, mode: str = "error", compression: str = "zstd"
) -> None:
    """Traces table → parquet partitioned by trace date."""
    out = traces.withColumn("trace_date", F.to_date(F.col("startTime")))
    (
        out.repartition("trace_date")
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("trace_date")
        .parquet(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    """JSON-lines export (interchange with the reference's file format)."""
    df.write.mode(mode).json(path)


def compact_span_store(spark, path: str, files_per_partition: int = 1) -> None:
    """Rewrite the span store with ``files_per_partition`` files per
    ``(span_date, trace_bucket)`` directory.

    Streaming ingest (:func:`~traceframe_spark.streaming.spans.
    stream_to_span_store`) appends one file per partition per
    microbatch; over days that is thousands of small files per
    directory and scan planning degrades.

    MAINTENANCE-WINDOW operation, stated plainly: the two-rename swap is
    NOT atomic — pause writers while compacting (an append landing
    between the read and the swap would be lost), readers in the
    instant between the renames see a missing path, and the rename
    plumbing is local-filesystem only (non-local URIs raise; on object
    stores use a table format with transactional replace instead).
    """
    import shutil
    import tempfile

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            "compact_span_store swaps directories with local renames; "
            f"non-local store {path!r} needs a transactional table format"
        )
    local = path[len("file://"):] if path.startswith("file://") else path

    df = spark.read.parquet(local)
    tmp = tempfile.mkdtemp(
        prefix="compact_", dir=os.path.dirname(local.rstrip("/")) or "."
    )
    # one output task per (partition-dir, file-slot): files_per_partition
    # slots split each directory's rows by a content hash
    slot = F.pmod(F.xxhash64("spanID"), F.lit(files_per_partition))
    (
        df.repartition(F.col("span_date"), F.col("trace_bucket"), slot)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("span_date", "trace_bucket")
        .parquet(f"{tmp}/data")
    )
    old = f"{tmp}/old"
    shutil.move(local, old)
    shutil.move(f"{tmp}/data", local)
    shutil.rmtree(tmp, ignore_errors=True)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shuffle_key: str,
    seed: int = 0,
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """Export a curated corpus as globally shuffled training shards.

    The dataloader contract: (1) rows land in a pseudorandom but
    DETERMINISTIC order (xxhash64 of the key, salted by ``seed`` — same
    corpus + seed → byte-identical shard assignment, no RNG state), and
    (2) exactly ``n_shards`` similar-sized files, so a trainer maps
    shards to workers without a manifest. Re-shuffling between epochs =
    re-export with a different seed, or shuffle shard order + in-shard
    buffer on the loader side.

    One full shuffle (repartition on the hash), sorted within each shard
    so readers stream in hash order. At 100 TB pick n_shards so each
    shard is 100 MB - 1 GB.
    """
    h = F.xxhash64(F.col(shuffle_key), F.lit(seed))
    (
        df.withColumn("_h", h)
        .repartition(n_shards, F.col("_h"))
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def write_spans_bucketed(
    spans: DataFrame,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Span table → a catalog table hash-bucketed AND sorted by traceID.

    The co-located-join layout: a scan of this table exposes its
    bucketing to the planner, so joins and aggregations keyed on traceID
    (self-joins, span⋈trace enrichment, the critical-path kernel via
    ``critical_path_segments(..., pre_partitioned=True)``) run with NO
    shuffle — at 100 TB the big-fact shuffle is the cost that dominates
    everything else, and paying it once at write time amortizes it over
    every subsequent query. The pre-write ``repartition`` makes one file
    per bucket per write (without it, every write task emits a file for
    every bucket it sees: tasks × buckets small files).
    """
    (
        spans.repartition(n_buckets, "traceID")
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, "traceID")
        .sortBy("traceID", "startTime")
        .saveAsTable(table)
    )


def shard_manifest(
    spark,
    path: str,
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Delivery manifest for a training-shard export: one row per shard
    file with row count and an order-independent content checksum (the
    SUM of per-row ``xxhash64`` over the named columns, accumulated in
    decimal(38,0) so it cannot overflow below ~10^19 rows). The
    dataloader-side verification contract:

    - a re-export with the same corpus and seed must produce identical
      (file, n_rows, checksum) rows;
    - SUMMING all shard checksums yields a SHARDING-INVARIANT corpus
      checksum — re-sharding with a different seed or shard count moves
      rows between files but cannot change the global sum, so corpus
      identity is checkable across layout changes without re-reading
      the original.

    Sum, deliberately NOT xor: xor of row hashes is blind to
    even-multiplicity changes (two identical rows cancel to 0, so
    swapping a duplicated row X,X for a different duplicated row Y,Y
    preserves the xor) — and duplicated rows are exactly what a
    pre-dedup crawl export contains. Summing keeps multiplicity:
    2·h(X) ≠ 2·h(Y).

    One scan, one tiny per-file aggregate; no driver-side row traffic.
    """
    df = spark.read.parquet(path)
    cols = checksum_cols or sorted(df.columns)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    return (
        df.withColumn("_h", row_hash.cast("decimal(38,0)"))
        .withColumn("file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .groupBy("file")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_h").cast("decimal(38,0)").alias("checksum"),
        )
    )
