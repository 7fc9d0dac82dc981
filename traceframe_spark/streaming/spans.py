"""Streaming span-feed operators (see package docstring)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from traceframe_spark.schemas import SPAN_SCHEMA

# Flat JSONL span feed: one span per line (the shape a collector emits).
SPAN_FEED_SCHEMA = StructType(
    [f for f in SPAN_SCHEMA.fields if f.name != "tags"]
    + [StructField("tags", StringType())]  # tags as JSON text on the wire
)


def read_span_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 64) -> DataFrame:
    """Unbounded span table from a JSONL directory feed."""
    return (
        spark.readStream.schema(SPAN_FEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def windowed_service_stats(
    spans: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-service span counts / error counts / p50-ish mean duration in
    event-time windows, tolerant of ``watermark`` lateness.

    Event time comes from the span's µs-epoch startTime. State is bounded:
    the watermark lets Spark drop windows older than max(event_time) -
    watermark.
    """
    with_time = spans.withColumn("event_time", F.timestamp_micros(F.col("startTime")))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("service"))
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(
                F.when(F.col("tags").contains('"error"'), 1).otherwise(0)
            ).alias("n_errors"),
            F.avg("duration").alias("mean_duration_us"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "service",
            "n_spans",
            "n_errors",
            "mean_duration_us",
        )
    )


def stream_parent_enrich(
    children: DataFrame,
    parents: DataFrame,
    max_skew: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream JOIN: attribute each child span to its parent while
    both are still in flight — child rows arrive on one feed, parent
    rows on another (collectors shard by service, so a trace's spans
    rarely share a feed).

    Spark requires bounded state for stream-stream joins: both sides
    carry a watermark and the join has a time-range predicate (parent
    started within ``max_skew`` before the child — clock skew bound), so
    each side's buffer is dropped once the watermark passes. Left outer
    keeps orphans (parent never arrives): they emit with null parent
    columns after the watermark expires.

    At scale this is the state-store-backed symmetric hash join; the
    shuffle key is (traceID, spanID), which is high-cardinality and
    skew-free by construction.
    """
    c = (
        children.withColumn("c_time", F.timestamp_micros(F.col("startTime")))
        .withWatermark("c_time", watermark)
    )
    p = (
        parents.select(
            F.col("traceID").alias("p_traceID"),
            F.col("spanID").alias("p_spanID"),
            F.col("service").alias("parent_service"),
            F.col("operationName").alias("parent_operation"),
            F.timestamp_micros(F.col("startTime")).alias("p_time"),
        )
        .withWatermark("p_time", watermark)
    )
    cond = (
        (F.col("traceID") == F.col("p_traceID"))
        & (F.col("parent") == F.col("p_spanID"))
        & (F.col("p_time") >= F.col("c_time") - F.expr(f"INTERVAL {max_skew}"))
        & (F.col("p_time") <= F.col("c_time") + F.expr(f"INTERVAL {max_skew}"))
    )
    return c.join(p, cond, "leftOuter").drop("p_traceID", "p_spanID", "p_time", "c_time")


def _batch_marker_fs(spark, store_path: str, checkpoint: str, batch_id: int):
    import hashlib

    # markers are namespaced by checkpoint lineage: batch ids restart at
    # 0 after a checkpoint reset, so un-namespaced markers from the old
    # lineage would silently skip the new lineage's first batches.
    # Resetting therefore means a NEW checkpoint path (the standard
    # practice) — same-path-after-wipe is documented unsupported.
    lineage = hashlib.sha256(checkpoint.encode()).hexdigest()[:12]
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{store_path}/_applied_batches/{lineage}/{batch_id}"
    )
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _batch_already_applied(spark, store_path: str, checkpoint: str, batch_id: int) -> bool:
    """foreachBatch is at-least-once: a batch whose write completed but
    whose checkpoint commit didn't is REPLAYED on restart. A marker file
    per applied batch_id (written after the data lands) makes the
    replay a no-op instead of a silent duplicate/double-count. The
    remaining exposure is a crash inside the write-then-mark pair —
    vastly narrower than write-then-checkpoint-commit; closing it fully
    needs a transactional table format (the documented production
    upgrade path)."""
    fs, p = _batch_marker_fs(spark, store_path, checkpoint, batch_id)
    return fs.exists(p)


def _mark_batch_applied(spark, store_path: str, checkpoint: str, batch_id: int) -> None:
    fs, p = _batch_marker_fs(spark, store_path, checkpoint, batch_id)
    fs.create(p, True).close()


def _store_exists(spark, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    # an empty dir left by a failed first write is "absent" too — but a
    # dir holding any data/partition entry is a real store, and read
    # errors there must FAIL LOUDLY, never be treated as first-batch
    it = fs.listStatus(p)
    for status in it:
        name = status.getPath().getName()
        if not name.startswith("_"):
            return True
    return False


def _store_parts(spark, path: str, part_col: str) -> set[int]:
    """A store's standing partition values for ``part_col`` — ONE
    driver-side FS directory listing (a single RPC), no data read and
    no Spark job. Feeds the ``late_stage_threshold="auto"`` sizing rule
    and the touched-partitions-only standing reads (rollup hours, HLL
    days)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return set()
    out: set[int] = set()
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(f"{part_col}=")):
            continue
        try:
            out.add(int(name.split("=", 1)[1]))
        except ValueError:
            # e.g. __HIVE_DEFAULT_PARTITION__ from a null partition
            # value: never the target of an integer-keyed delta, and a
            # store meant to run forever must not start crashing every
            # batch because one malformed dir appeared once
            continue
    return out


def _store_hours(spark, path: str) -> set[int]:
    return _store_parts(spark, path, "hour_ns")


def _store_hour_count(spark, path: str) -> int:
    """Number of hour partitions in a standing rollup store."""
    return len(_store_hours(spark, path))


def stream_to_span_store(
    spans: DataFrame, path: str, checkpoint: str, trigger_available_now: bool = False
):
    """Continuously land a span feed into the partitioned parquet store
    (same layout as :func:`traceframe_spark.sinks.write_spans`) via
    foreachBatch — the streaming ingest half of a lambda-free
    architecture: batch queries read the store the stream writes.

    Idempotent across restarts: each batch_id lands once (marker files
    under ``_applied_batches/``), so an at-least-once replay does not
    append duplicate spans."""
    from traceframe_spark import sinks

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if _batch_already_applied(spark, path, checkpoint, batch_id):
            return
        sinks.write_spans(batch_df, path, mode="append")
        _mark_batch_applied(spark, path, checkpoint, batch_id)

    writer = (
        spans.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_STAGING_DIR = "_late_staging"
"""Late-delta staging area under the rollup store root. The leading
underscore keeps it invisible to store readers (Hadoop/Spark path
filters skip ``_``/``.`` entries), like ``_applied_batches``."""

_STAGING_TOMB_DIR = "_late_staging_compacting"
"""Tombstoned staging area: compaction RENAMES ``_late_staging`` here
(one atomic FS rename) before folding it into the standing store, so a
concurrent :func:`read_rollup_store` — which only ever looks at
``_late_staging`` — can never see a staged delta both in the rewritten
store and in staging (transient double-count). Also ``_``-prefixed, so
plain store readers skip it."""


_PART_SWAP_NEW = "_part_swap_new"
"""Rewrite staging area under a partitioned store root: a batch's
rewritten partitions (rollup hours, HLL days) are fully written HERE
first, then swapped into place with per-partition atomic renames.
``_``-prefixed so store readers skip it."""

_PART_SWAP_OLD = "_part_swap_old"
"""Per-partition tombstones during a swap: the live partition directory
is renamed here an instant before the rewritten one is renamed in, so
an interrupted swap can be rolled back (see
:func:`_recover_part_swaps`). ``_``-prefixed like the staging dir."""


def _recover_part_swaps(spark, path: str, part_col: str) -> None:
    """Roll back any swap a previous process died in the middle of.

    Every partition with a tombstone is restored FROM the tombstone:
    if the live partition is missing the crash hit between the two
    renames (rename the old data back); if the live partition EXISTS
    the crash hit between the swap-in and the tombstone delete — the
    rewritten data landed but the caller's batch marker was never
    written, so the at-least-once replay WILL re-merge the same delta.
    Keeping the new data (rolling forward) would therefore double-count
    sum rollups; the old data is restored instead (delete the new live
    dir, rename the tombstone back). Rolling BACK — never forward — is
    what keeps replay semantics unchanged everywhere. Leftover staging
    is deleted for the same reason: its content is a merge the replay
    will redo.

    MUST run before the caller lists standing partitions
    (:func:`_store_parts` / :func:`_store_exists`): a listing taken
    while a partition sits in the tombstone would miss it, merge
    delta-only, and the subsequent swap would overwrite the recovered
    old data — silently dropping the partition's standing rows. Every
    single-writer batch path calls this first for that reason.

    Residual window (documented, not closable without a transactional
    table format): a partition whose per-partition tombstone delete
    completed before the crash has no tombstone left, stays rolled
    forward, and the replay double-counts that one partition's delta
    (harmless for the HLL store — register max is idempotent)."""
    prefix = f"{part_col}="
    fs, tomb = _fs_path(spark, f"{path}/{_PART_SWAP_OLD}")
    if fs.exists(tomb):
        for status in fs.listStatus(tomb):
            name = status.getPath().getName()
            if not name.startswith(prefix):
                continue
            _, live = _fs_path(spark, f"{path}/{name}")
            if fs.exists(live) and not fs.delete(live, True):
                raise IOError(
                    f"partitioned store: failed to drop half-swapped partition {name}"
                )
            if not fs.rename(status.getPath(), live):
                raise IOError(f"partitioned store: failed to restore {name} from tombstone")
        fs.delete(tomb, True)
    _, staging = _fs_path(spark, f"{path}/{_PART_SWAP_NEW}")
    if fs.exists(staging) and not fs.delete(staging, True):
        raise IOError(f"partitioned store: failed to clear stale rewrite staging under {path}")


_NON_ATOMIC_RENAME_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "swift", "wasb", "wasbs"}
)
"""Filesystem schemes whose directory "rename" is COPY + DELETE —
non-atomic AND data-sized, not metadata-sized — which silently voids
both guarantees the swap discipline sells (readers see old-or-new per
partition; the swap costs 2-3 metadata ops). HDFS, local, ABFS
(``abfs``/``abfss`` — real hierarchical-namespace renames), and
``viewfs`` over those are fine."""


def _require_atomic_rename(fs, path: str) -> None:
    """Refuse to run the prepare-then-rename swap on an object store
    whose rename is copy+delete: a crash mid-"rename" there leaves a
    PARTIAL partition (the exact state the discipline exists to
    prevent), recovery's rename-back has the same hole, and every swap
    pays a data-sized copy bill. Failing loudly at the first write
    beats silently selling atomicity that the store cannot deliver.
    S3-class stores use the manifest-pointer commit instead — BUILT as
    ``streaming/manifest_store.py`` (``stream_to_rollup_manifest``):
    immutable uniquely-named data directories, commits published by one
    atomic small-object manifest write, whole-store snapshot isolation
    for readers, the replay watermark committed atomically with the
    data pointers, and async garbage collection via
    ``vacuum_manifest_store``."""
    scheme = (fs.getUri().getScheme() or "file").lower()
    if scheme in _NON_ATOMIC_RENAME_SCHEMES:
        raise IOError(
            f"partitioned store at {path!r}: filesystem scheme {scheme!r} "
            "renames by copy+delete (non-atomic, data-sized), which voids "
            "the old-or-new swap guarantee and its metadata-only cost "
            "model. Use HDFS/ABFS/local-class storage for this store, or "
            "implement the manifest-pointer commit documented in "
            "SCALING.md for S3-class object stores."
        )


def _write_merged_parts(merged: DataFrame, path: str, part_col: str) -> None:
    """Land rewritten partitions (rollup hours, HLL days) old-or-new,
    never partial.

    FILESYSTEM CONTRACT: requires atomic directory rename (HDFS, ABFS
    with hierarchical namespace, local, viewfs over those) — enforced
    by :func:`_require_atomic_rename`, which refuses S3-class schemes
    where rename is copy+delete (non-atomic and data-sized).

    The rewrite is PREPARED off to the side (full parquet write into
    ``_part_swap_new``, invisible to readers) and then swapped in with
    two metadata-only renames per partition — so a reader racing the
    rewrite sees each partition's old file or its new file, and the
    only other state is a missing partition for the microseconds
    between the renames (a LISTED-then-swapped file surfaces as a loud
    FileNotFoundException retry, never silently partial data). The
    previous in-place dynamic partition overwrite kept readers exposed
    for the whole data write and could interleave
    deleted-but-not-yet-replaced partitions across the touched set.
    Cost delta: the parquet bytes are identical (written to staging
    instead of in place); the swap adds 2-3 FS metadata ops per touched
    partition — measured 1.03× at sf0.1 (see SCALING.md r09).

    Each touched partition still lands as exactly ONE file (repartition
    by the partition column: one task per partition), which is both the
    right physical shape — a rollup hour / HLL day is a few thousand
    rows at most — and what makes the per-partition swap a single-file
    replace."""
    spark = merged.sparkSession
    fs0, _ = _fs_path(spark, path)
    _require_atomic_rename(fs0, path)
    _recover_part_swaps(spark, path, part_col)
    staging = f"{path}/{_PART_SWAP_NEW}"
    (
        merged.repartition(part_col)
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(staging)
    )
    fs, stg = _fs_path(spark, staging)
    _, tomb = _fs_path(spark, f"{path}/{_PART_SWAP_OLD}")
    fs.mkdirs(tomb)
    prefix = f"{part_col}="
    for status in fs.listStatus(stg):
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue  # _SUCCESS etc.
        _, live = _fs_path(spark, f"{path}/{name}")
        _, tomb_h = _fs_path(spark, f"{path}/{_PART_SWAP_OLD}/{name}")
        if fs.exists(live) and not fs.rename(live, tomb_h):
            raise IOError(f"partitioned store: failed to tombstone live partition {name}")
        if not fs.rename(status.getPath(), live):
            raise IOError(f"partitioned store: failed to swap in rewritten partition {name}")
        fs.delete(tomb_h, True)
    fs.delete(tomb, True)
    if not fs.delete(stg, True):
        raise IOError(f"partitioned store: failed to clear rewrite staging under {path}")


def _write_merged_hours(merged: DataFrame, path: str) -> None:
    _write_merged_parts(merged, path, "hour_ns")


def _merge_into_store(spark, delta: DataFrame, path: str, keys: list[str]) -> None:
    """Fold a (bucket_ns, *keys, n, sums, hour_ns) partial frame into the
    standing store, rewriting only the touched hour partitions.

    The standing read opens ONLY the touched hour directories
    (``basePath`` keeps the partition column): ``spark.read.parquet(
    store_root)`` would launch a distributed file-LISTING job over
    every hour in the store on each batch once the store passes
    ``spark.sql.sources.parallelPartitionDiscovery.threshold`` (32
    dirs) — measured as per-batch scan-stage task counts growing
     275 → 720 with store age at sf0.1, i.e. per-batch cost creeping
    with HISTORY, the exact failure mode this store's delta-cost model
    exists to avoid (on an object store that listing is also the
    dominant metadata bill). Which touched hours exist comes from one
    driver-side root listing (a single FS RPC), so the per-batch cost
    is O(delta + touched hours) again at any store age."""
    from traceframe_spark.operators import rollup as R

    # BEFORE the standing listing: a partition a prior crash left in the
    # swap tombstone would otherwise be missing from _store_hours, the
    # merge would be delta-only, and the swap below would overwrite the
    # just-recovered old data — silent loss of that hour's standing rows
    _recover_part_swaps(spark, path, "hour_ns")
    touched = [r["hour_ns"] for r in delta.select("hour_ns").distinct().collect()]
    existing = sorted(_store_hours(spark, path) & set(touched))
    if existing:
        # localCheckpoint pins the standing rows before the swap below
        # deletes the old hour files from under the lazy plan
        standing = (
            spark.read.option("basePath", path)
            .parquet(*[f"{path}/hour_ns={h}" for h in existing])
            .localCheckpoint()
        )
        merged = R.merge_rollups(standing.drop("hour_ns"), delta.drop("hour_ns"), keys)
    else:  # every touched hour is new: nothing standing to fold
        merged = R.merge_rollups(
            delta.drop("hour_ns"), delta.drop("hour_ns").limit(0), keys
        )
    _write_merged_hours(
        merged.withColumn("hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)),
        path,
    )


def read_rollup_store(spark, path: str, keys: list[str]) -> DataFrame:
    """Merge-on-read view of a rollup store maintained with late-delta
    staging: the standing store plus any not-yet-compacted staged
    partials, folded with the same lossless :func:`merge_rollups`. Use
    this (instead of ``spark.read.parquet(path)``) when a dashboard
    needs EXACT totals between compactions; the standing store alone
    undercounts staged straggler hours by at most ``compact_every``
    batches of late data. Cost: the staging area is small by
    construction (cold deltas only), so the merge is a broadcast-sized
    union + one aggregation on top of the normal store scan.

    Concurrency: a CONCURRENT compaction can never DOUBLE-COUNT a
    staged delta against this read — :func:`compact_rollup_store`
    atomically renames staging to a tombstoned path before touching the
    store, so a read taken mid-compaction sees each staged delta at
    most once (in the standing store once the rewrite lands, in staging
    before the rename, never both). Two caveats short of full
    exact-on-read: the mid-compaction read may transiently MISS the
    in-flight deltas (the same bounded staleness the standing store has
    between compactions, resolved by the next read), and the standing-
    store rewrite — though each touched hour now swaps in atomically
    (prepare-then-rename, :func:`_write_merged_hours`: a racing reader
    sees an hour's old file or new file, or a loud retryable
    FileNotFound in the microseconds between the two renames, never a
    partially rewritten hour) — still lands hour-by-hour, so a read
    spanning the swap can pair one hour's new data with another's old;
    full multi-hour snapshot isolation needs the documented
    transactional-table-format upgrade. The store assumes a single
    writer (the one streaming query / compactor), as all the stores
    here do."""
    from traceframe_spark.operators import rollup as R

    standing = spark.read.parquet(path)
    staging = f"{path}/{_STAGING_DIR}"
    if not _store_exists(spark, staging):
        return standing
    staged = spark.read.parquet(staging)
    return R.merge_rollups(
        standing.drop("hour_ns"), staged.drop("hour_ns"), keys
    ).withColumn("hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS))


def _fs_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _fold_staged_into_store(spark, staged_path: str, path: str, keys: list[str]) -> None:
    """Merge one staged-deltas directory into the standing store."""
    # localCheckpoint materializes the staged partials BEFORE the store
    # rewrite, cutting the file-source lineage (Spark refuses to
    # overwrite a path it is also reading from)
    staged = spark.read.parquet(staged_path).localCheckpoint()
    # recover BEFORE the existence probe: if a crash tombstoned the
    # store's only hour, _store_exists would say False and the else
    # branch would swap a staged-only rewrite over the recovered data
    _recover_part_swaps(spark, path, "hour_ns")
    if _store_exists(spark, path):
        _merge_into_store(spark, staged, path, keys)
    else:
        from traceframe_spark.operators import rollup as R

        merged = R.merge_rollups(
            staged.drop("hour_ns"), staged.drop("hour_ns").limit(0), keys
        ).withColumn("hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS))
        _write_merged_hours(merged, path)


def compact_rollup_store(spark, path: str, keys: list[str]) -> bool:
    """Fold the late-delta staging area into the standing rollup store
    and clear it; returns True if anything was compacted.

    Called automatically every ``compact_every`` batches by
    :func:`stream_to_rollup` when staging is enabled, and by hand (or
    from a scheduler) after an ``availableNow`` drain to make the store
    exact. Staging is first RENAMED (atomic) to a ``_``-prefixed
    tombstone path, then merged from there — so a concurrent
    :func:`read_rollup_store`, which only reads ``_late_staging``,
    never sees a staged delta in both the rewritten store and staging
    at once (see its docstring for the exact read semantics). Crash
    exposure: a crash between the store rewrite and the tombstone
    delete leaves the tombstone behind; the NEXT compaction folds the
    leftover first, re-merging those deltas — the same narrow
    at-least-once window as the store's existing write-then-mark pair.
    Closing it fully needs a transactional table format, the same
    documented upgrade path. Single writer assumed (one streaming
    query / compactor at a time), as everywhere in this store.
    """
    staging = f"{path}/{_STAGING_DIR}"
    tomb = f"{path}/{_STAGING_TOMB_DIR}"
    compacted = False
    # crash leftover from a prior compaction: fold it before anything else
    if _store_exists(spark, tomb):
        _fold_staged_into_store(spark, tomb, path, keys)
        fs, p = _fs_path(spark, tomb)
        if not fs.delete(p, True):
            raise IOError(f"compact_rollup_store: failed to delete leftover tombstone {tomb}")
        compacted = True
    if not _store_exists(spark, staging):
        return compacted
    fs, src = _fs_path(spark, staging)
    _, dst = _fs_path(spark, tomb)
    # raw-exists check (not _store_exists, which ignores _-only dirs): an
    # underscore-entries-only leftover tomb dir would make rename() nest
    # src INSIDE dst on some FSs, stranding the staged deltas where
    # neither the fold nor read_rollup_store looks.
    if fs.exists(dst) and not fs.delete(dst, True):
        raise IOError(f"compact_rollup_store: failed to clear tombstone path {tomb}")
    # Hadoop FileSystem reports failure via a boolean, not an exception
    if not fs.rename(src, dst):
        raise IOError(
            f"compact_rollup_store: rename {staging} -> {tomb} failed; "
            "staged deltas left in place (store remains merge-on-read exact)"
        )
    _fold_staged_into_store(spark, tomb, path, keys)
    if not fs.delete(dst, True):
        raise IOError(f"compact_rollup_store: failed to delete tombstone {tomb}")
    return True


def stream_to_rollup(
    events: DataFrame,
    path: str,
    checkpoint: str,
    bucket_ns: int,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    trigger_available_now: bool = False,
    late_stage_threshold: int | str | None = None,
    compact_every: int = 8,
    max_hot_hours: int | None = None,
):
    """Maintain a continuous-aggregate store from a stream: each
    micro-batch folds its delta into the standing rollup
    (operators/rollup.incremental_refresh) and rewrites ONLY the hour
    partitions the batch touched, via dynamic partition overwrite.

    Cost per batch scales with the delta (late data included — an
    hour's partition is re-merged when a straggler lands in it), never
    with the store's history. Batch dashboards read ``path`` as plain
    parquet partitioned by ``hour_ns``; no stream-side state store is
    involved, and each batch_id folds exactly once (lineage-namespaced
    markers under ``_applied_batches/``) so an at-least-once replay
    cannot double-count. Restarting from a FRESH checkpoint path
    replays the source into the standing rollup — wipe the store
    together with the checkpoint, or keep both.

    ``late_stage_threshold`` bounds the worst case the per-delta cost
    model does not cover: an all-late-data replay (every batch touching
    every store hour) re-merges the WHOLE store every batch — measured
    5× the ordered replay's wall time at sf0.1. With the threshold set,
    an hour whose per-batch delta has fewer than ``late_stage_threshold``
    partial rows is APPENDED to a staging area (``_late_staging/`` under
    the store root, invisible to readers) instead of re-merged; staged
    deltas are folded in bulk every ``compact_every`` batches and by
    :func:`compact_rollup_store` after a drain. Hot hours (the batch's
    own time slice) still merge immediately, so the common read is
    exact; staged straggler hours are eventually-consistent between
    compactions, bounded by ``compact_every`` batches of staleness.
    Default None keeps today's always-exact immediate merge.

    ``late_stage_threshold="auto"`` re-derives the measured sizing rule
    per batch instead of hand-carrying a number across volume changes:
    the rule that tamed the all-late worst case at BOTH 1× and 10×
    (SCALING.md) is "a few × above ``batch_partial_rows /
    store_hours``", so auto computes ``ceil(5 × batch_partial_rows /
    standing_store_hour_count)`` from the batch's own delta and one FS
    directory listing. An all-late batch spreads its rows ≈ uniformly
    over every store hour, so each hour sits well BELOW 5× the mean and
    stages; a time-ordered batch concentrates ~all rows in its own
    slice, far ABOVE the all-late mean, and merges immediately. The
    same command therefore stays correctly sized as volume scales —
    the hand-tuned 1× threshold that degraded 4× at 10× volume is the
    failure mode this removes. While the store is YOUNG (few hour
    partitions), auto is conservative — early batches stage more and
    rely on compaction; freshness catches up as the store reaches its
    steady hour count.

    ``max_hot_hours`` is the size-free form of the same knob: merge at
    most that many hours per batch — the ones carrying the LARGEST
    deltas — and stage the rest, regardless of absolute row counts.
    Row thresholds must be re-sized when batch volume changes (the 1×
    threshold that tamed the worst case degrades at 10×ed volume,
    measured in SCALING.md); an hour-count cap bounds the per-batch
    merge cost by construction at any volume. The two compose:
    threshold first (if set), then the cap; setting only
    ``max_hot_hours`` enables staging with no row threshold.
    """
    from traceframe_spark.operators import rollup as R

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # at-least-once replay protection: re-merging an already-applied
        # delta would permanently double-count every touched bucket
        if _batch_already_applied(spark, path, checkpoint, batch_id):
            return
        # recover interrupted swaps BEFORE any listing this batch takes
        # (_store_exists, _store_hour_count, the merge's _store_hours):
        # a tombstoned partition invisible to those listings would be
        # merged delta-only and overwritten — standing rows lost
        _recover_part_swaps(spark, path, "hour_ns")
        delta = R.rollup_events(batch_df, bucket_ns, keys, value_col, ts_col)
        # localCheckpoint: the touched-hours collect AND the final write
        # both consume delta — without it each recomputes the batch's
        # groupBy shuffle from scratch
        delta = delta.withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        ).localCheckpoint()
        # explicit FS existence probe, NOT a broad except AnalysisException:
        # a store that exists but fails to read (schema conflict, corrupt
        # footer) must fail loudly — treating it as "first batch" would
        # dynamic-overwrite real history with this batch's delta alone
        if _store_exists(spark, path):
            if late_stage_threshold is not None or max_hot_hours is not None:
                # split the delta by per-hour partial-row mass: hot hours
                # (the batch's own slice) merge now; straggler hours are a
                # cheap append to staging, re-merged in bulk at compaction
                hour_counts = (
                    delta.groupBy("hour_ns").count().collect()
                )  # bounded: one row per touched hour
                threshold = late_stage_threshold
                if threshold == "auto":
                    # the SCALING.md sizing rule, re-derived per batch:
                    # few-x above the all-late per-hour mean (batch
                    # partial rows spread over every standing hour)
                    total = sum(r["count"] for r in hour_counts)
                    threshold = -(-5 * total // max(_store_hour_count(spark, path), 1))
                hot_rows = [
                    r
                    for r in hour_counts
                    if threshold is None or r["count"] >= threshold
                ]
                if max_hot_hours is not None and len(hot_rows) > max_hot_hours:
                    # keep the heaviest hours; hour_ns tie-break for
                    # determinism under equal masses
                    hot_rows = sorted(
                        hot_rows, key=lambda r: (-r["count"], r["hour_ns"])
                    )[:max_hot_hours]
                hot = [r["hour_ns"] for r in hot_rows]
                cold_delta = delta.filter(~F.col("hour_ns").isin(hot))
                if hot:
                    _merge_into_store(
                        spark, delta.filter(F.col("hour_ns").isin(hot)), path, keys
                    )
                if len(hot) < len(hour_counts):
                    # staging is only ever read WHOLE by compaction — no
                    # partition pruning wanted, so write it flat (hour_ns
                    # as a data column): ONE small file per batch instead
                    # of one per touched hour directory
                    cold_delta.coalesce(1).write.mode("append").parquet(
                        f"{path}/{_STAGING_DIR}"
                    )
                if (batch_id + 1) % compact_every == 0:
                    compact_rollup_store(spark, path, keys)
            else:
                _merge_into_store(spark, delta, path, keys)
        else:
            _write_merged_hours(delta, path)
        _mark_batch_applied(spark, path, checkpoint, batch_id)

    writer = (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_hll_store(
    events: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    day_from_ts: str = "ts",
    p: int = 10,
    trigger_available_now: bool = False,
):
    """Continuous DISTINCT counting: maintain per-day HyperLogLog
    registers from a stream — the streaming twin of the batch
    ``hll_daily_users`` query, and the register-merge property made
    operational: each micro-batch sketches its own rows (≤ 2^p register
    rows per touched day) and folds into the standing store with
    union + per-(day, bucket) MAX, the same idempotent-shape fold
    ``stream_to_rollup`` uses for sums. Exact-once per batch via the
    same lineage-namespaced markers. Readers get daily uniques at any
    moment with ``sketch.hll_estimate_by(spark.read.parquet(path),
    ["day"])`` — no distinct state store, no watermark bookkeeping, and
    the store is a few KB per day regardless of stream volume.

    Late data is FREE here (unlike the sum rollup): a straggler's
    register max folds into its day whenever it arrives, and re-merging
    a day costs ≤ 2^p rows — there is no worst case to stage against.
    And because MAX is idempotent, even the write-then-mark crash
    window the sum store documents is harmless here: re-merging an
    already-applied batch's registers changes nothing. This store's
    exactly-once is structural, not marker-dependent (markers are kept
    anyway — they make the replay a skip instead of a no-op merge).
    """
    from traceframe_spark.operators import sketch

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if _batch_already_applied(spark, path, checkpoint, batch_id):
            return
        # recover interrupted swaps BEFORE the _store_parts listing: a
        # day sitting in the swap tombstone would be merged delta-only
        # and then overwritten (harmless for MAX registers only if the
        # delta covers every standing bucket — it usually doesn't)
        _recover_part_swaps(spark, path, "day")
        b, r = sketch.hll_bucket_rho(F.col(key_col), p)
        delta = (
            batch_df.select(
                F.expr(f"{day_from_ts} div 86400000000000").alias("day"),
                b.alias("bucket"),
                r.alias("rho"),
            )
            .groupBy("day", "bucket")
            .agg(F.max("rho").alias("rho_max"))
            .localCheckpoint()
        )
        # touched-days-only standing read + atomic per-day swap: same
        # two fixes as the sum rollup (_merge_into_store docstring) —
        # reading the store ROOT launches a distributed listing job over
        # every day dir past 32 dirs (a year-old store = 365 listings
        # per batch), and the in-place dynamic overwrite exposed racing
        # readers to partially rewritten days for the whole data write
        touched = [row["day"] for row in delta.select("day").distinct().collect()]
        existing = sorted(_store_parts(spark, path, "day") & set(touched))
        if existing:
            standing = (
                spark.read.option("basePath", path)
                .parquet(*[f"{path}/day={d}" for d in existing])
                .localCheckpoint()
            )
            merged = (
                standing.unionByName(delta)
                .groupBy("day", "bucket")
                .agg(F.max("rho_max").alias("rho_max"))
            )
        else:
            merged = delta
        _write_merged_parts(merged, path, "day")
        _mark_batch_applied(spark, path, checkpoint, batch_id)

    writer = (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once keyed dedup over an unbounded feed — the streaming
    counterpart of :func:`traceframe_spark.operators.dedup.exact_dedup`
    for continuous ingestion (re-delivered spans, at-least-once
    collectors, re-exported documents).

    With ``event_time_col`` (a µs-epoch long), state is BOUNDED: the
    watermark lets the engine drop keys older than
    ``max(event_time) - watermark``, so a duplicate arriving later than
    the watermark is passed through rather than dropped — the standard
    correctness/state trade, tuned via ``watermark``. Without it, state
    grows with distinct keys forever (only for short-lived streams).
    """
    if event_time_col is None:
        return df.dropDuplicates(key_cols)
    with_time = df.withColumn("_event_time", F.timestamp_micros(F.col(event_time_col)))
    return (
        with_time.withWatermark("_event_time", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("_event_time")
    )


ASSEMBLED_TRACE_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField("nspans", IntegerType()),
        StructField("root_operation", StringType()),
        StructField("start_us", LongType()),
        StructField("duration_us", LongType()),
        StructField("is_complete", IntegerType()),  # 1 if a root span was seen
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", IntegerType()),
        StructField("root_op", StringType()),
        StructField("root_start", LongType()),
        StructField("root_dur", LongType()),
        StructField("min_start", LongType()),
        StructField("max_end", LongType()),
    ]
)


def _assemble(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful per-trace assembly: accumulate span counts + root info;
    emit one summary row when the trace goes quiet (timeout)."""
    if state.hasTimedOut:
        n, root_op, root_start, root_dur, min_start, max_end = state.get
        state.remove()
        # root-seen is signalled by root_start is not None — truthiness
        # would misfire on legitimate zero values (an instant root with
        # duration 0, a root at epoch 0, an empty operationName)
        has_root = root_start is not None
        yield pd.DataFrame(
            {
                "traceID": [key[0]],
                "nspans": [n],
                "root_operation": [root_op],
                "start_us": [root_start if has_root else min_start],
                "duration_us": [root_dur if has_root else max_end - min_start],
                "is_complete": [1 if has_root else 0],
            }
        )
        return

    n, root_op, root_start, root_dur, min_start, max_end = (
        state.get if state.exists else (0, None, None, None, None, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        starts = pdf["startTime"]
        ends = pdf["startTime"] + pdf["duration"]
        min_start = int(starts.min()) if min_start is None else min(min_start, int(starts.min()))
        max_end = max(max_end, int(ends.max()))
        roots = pdf[pdf["parent"] == ""]
        if len(roots):
            r = roots.iloc[0]
            root_op = str(r["operationName"])
            root_start = int(r["startTime"])
            root_dur = int(r["duration"])
    state.update((n, root_op, root_start, root_dur, min_start, max_end))
    state.setTimeoutDuration(2000)  # quiet period before emitting, ms
    yield from ()


def open_trace_assembly(spans: DataFrame) -> DataFrame:
    """Incrementally assemble per-trace summaries from an unbounded span
    feed: traces are 'sessions' keyed by traceID; a processing-time
    timeout closes a trace after its spans stop arriving."""
    return (
        spans.groupBy("traceID")
        .applyInPandasWithState(
            _assemble,
            outputStructType=ASSEMBLED_TRACE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
