"""Manifest-pointer committed partitioned store — the object-store-safe
commit protocol the rename-swap discipline cannot provide.

``streaming/spans.py``'s prepare-then-rename swap requires ATOMIC
directory rename (HDFS/ABFS/local) and is refused on S3-class schemes
(`_require_atomic_rename`), where "rename" is copy+delete: non-atomic
and data-sized. This module is the documented alternative, built: data
directories are IMMUTABLE and uniquely named, and the only commit
primitive is publishing one small manifest object that maps each
partition value to its live data directory. A small-object write is
atomic on every major store (a PUT either fully exists or doesn't), so:

- **old-or-new becomes whole-store SNAPSHOT isolation** — a reader
  resolves ONE manifest and sees one consistent version of EVERY
  partition, strictly stronger than the rename swap (which was
  old-or-new per partition but could pair one hour's new data with
  another's old across a multi-partition rewrite);
- **commits are metadata-sized** — one JSON object per commit,
  regardless of how many partition bytes were rewritten;
- **exactly-once is structural, not marker-dependent** — the last
  applied ``batch_id`` (per checkpoint lineage) is a FIELD of the
  manifest, so the data pointers and the replay marker commit in the
  same atomic write. The write-then-mark crash window the rename-based
  stores document (and bound with roll-back recovery) does not exist
  here: a crash before the manifest write leaves only invisible
  garbage directories and the replay re-merges; a crash after it is a
  completed commit whose replay is skipped by the recorded batch_id.

Layout::

    store/
      _manifests/m-000000000042.json     one per commit; readers take max
      data/c-000000000042-<8hex>/        one immutable dir per commit
        <part_col>=<val>/part-*.parquet  the partitions THIS commit rewrote

The manifest names, per partition value, the commit directory holding
its live data; untouched partitions keep pointing at older commit
directories. Reads group live partitions by commit directory and union
one partition-pruned scan per group, so reader plan size follows LIVE
COMMIT DIRS (bounded by the partition count, shrunk by every rewrite
that touches many partitions and by :func:`vacuum_manifest_store`),
never store history.

Durability notes: the manifest is published by EXCLUSIVE-CREATING the
final zero-padded name (``fs.create(path, overwrite=False)``) and
writing the complete JSON — commit-if-absent where the filesystem can
arbitrate it (HDFS: atomic at the namenode; S3A: a HEAD-then-PUT
best-effort check — see `_write_manifest` for the per-scheme strength).
A crash mid-write can leave a TORN newest file; readers tolerate it
(:func:`_latest_manifest` falls back to the previous complete snapshot)
and the next commit numbers past it (:func:`_next_commit_n`), so
single-object write visibility is not load-bearing for reader
correctness. Spark's own task-commit renames inside a data directory
don't matter either: a data directory is invisible until a manifest
names it. Single writer assumed, as all stores here.

No reference analogue (the reference has no incremental store at all);
the protocol is the classic manifest/snapshot design transactional
table formats (Iceberg-style) build on, re-implemented minimally for
this engine's rollup/HLL stores.
"""

from __future__ import annotations

import hashlib
import json
import uuid

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "read_manifest_store",
    "stream_to_rollup_manifest",
    "stream_to_hll_manifest",
    "compact_manifest_store",
    "vacuum_manifest_store",
    "manifest_last_batch",
    "merge_into_manifest_store",
    "is_manifest_store",
    "commit_layer_frames",
    "read_manifest_layer",
    "compact_manifest_layers",
    "acquire_writer_lease",
    "renew_writer_lease",
    "release_writer_lease",
]

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

from traceframe_spark.streaming.spans import _fs_path  # noqa: E402 — shared helper


def _lineage(checkpoint: str) -> str:
    # same namespacing rationale as spans._batch_marker_fs: batch ids
    # restart at 0 on a fresh checkpoint, so the applied-batch watermark
    # is scoped to the checkpoint lineage
    return hashlib.sha256(checkpoint.encode()).hexdigest()[:12]


def _manifest_names(spark, path: str) -> list[str]:
    fs, d = _fs_path(spark, f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(d):
        return []
    out = []
    for status in fs.listStatus(d):
        name = status.getPath().getName()
        if name.startswith("m-") and name.endswith(".json"):
            out.append(name)
    return sorted(out)  # zero-padded counters: lexicographic == numeric


def _read_manifest(spark, path: str, name: str) -> dict:
    # the JVM read is wrapped narrowly so transport-level failures
    # (Py4JJavaError from fs.open/readLine — e.g. a GET failure on an
    # object store, or a file deleted between list and open) surface as
    # IOError: every caller's torn-manifest fallback catches IOError,
    # and a raw Py4JJavaError would bypass it and crash the reader
    # instead of falling back to the previous complete snapshot
    fs, p = _fs_path(spark, f"{path}/{_MANIFEST_DIR}/{name}")
    try:
        stream = fs.open(p)
        try:
            jvm = spark._jvm
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            while True:
                line = reader.readLine()
                if line is None:
                    break
                lines.append(line)
        finally:
            stream.close()
    except Exception as exc:
        if isinstance(exc, (ValueError, IOError)):
            raise
        raise IOError(f"manifest read failed: {path}/{_MANIFEST_DIR}/{name}") from exc
    return json.loads("\n".join(lines))


def _latest_manifest(spark, path: str) -> dict | None:
    """Newest PARSEABLE manifest, or None. A writer that crashed mid-
    publish can leave a partially-written newest file; readers skip it
    (the previous commit is the last complete snapshot) rather than
    fail — the next commit numbers PAST it (:func:`_next_commit_n`), so
    the partial never blocks the store."""
    for name in reversed(_manifest_names(spark, path)):
        try:
            return _read_manifest(spark, path, name)
        except (ValueError, IOError):  # partial/corrupt: skip to previous
            continue
    return None


def _manifest_dirs(man: dict) -> list[str]:
    """Every data directory a manifest references: partitioned stores
    map partition value → dir under ``parts``; layer stores map layer
    name → list of dirs under ``layers`` (a manifest may carry either
    or both — vacuum treats them uniformly)."""
    out = list(man.get("parts", {}).values())
    for dirs in man.get("layers", {}).values():
        out.extend(dirs)
    return out


def _next_commit_n(spark, path: str) -> int:
    """Next commit counter from the manifest NAMES (parseable or not):
    numbering past a crashed partial publish keeps the exclusive-create
    guard from colliding with its leftover forever."""
    names = _manifest_names(spark, path)
    return (int(names[-1].split("-")[1].split(".")[0]) + 1) if names else 1


def _write_manifest(spark, path: str, man: dict) -> None:
    """Publish one commit: exclusive-create the final zero-padded name
    and write the complete JSON. ``create(overwrite=False)`` is the
    atomic commit-if-absent primitive where one exists (HDFS arbitrates
    at the namenode) and a narrow best-effort check elsewhere — the
    earlier tmp+rename form was WORSE on POSIX, where rename(2)
    silently REPLACES an existing destination, so a racing writer's
    publish overwrote the first commit instead of failing. Readers
    tolerate a torn write of the newest file (:func:`_latest_manifest`
    falls back; :func:`_next_commit_n` numbers past it), so
    single-object visibility is not load-bearing for correctness —
    single writer remains the store's contract and this guard is its
    loud tripwire. Per-scheme strength: HDFS namenode-atomic; local
    POSIX O_EXCL-atomic; S3A a HEAD-then-PUT race (best-effort). The
    S3-native upgrade is a conditional PUT (``If-None-Match: *``, which
    S3 supports); Hadoop's S3A ``create(overwrite=false)`` does not yet
    surface it — until it does, single-writer is a DEPLOYMENT
    REQUIREMENT on S3-class schemes, not merely a convention (see
    SCALING.md's guard table)."""
    n = man["n"]
    fs, final_p = _fs_path(spark, f"{path}/{_MANIFEST_DIR}/m-{n:012d}.json")
    try:
        out = fs.create(final_p, False)
    except Exception as exc:  # noqa: BLE001 — FileAlreadyExists et al.
        raise IOError(
            f"manifest store at {path!r}: commit {n} already exists — "
            "second writer detected (single-writer store)"
        ) from exc
    try:
        out.write(bytearray(json.dumps(man, sort_keys=True).encode("utf-8")))
    finally:
        out.close()


def resolve_required_meta(spark, path: str, key: str, builder: str):
    """(manifest, meta[key]) — the shared head of every
    manifest-protocol model/index reader (stored LM, NB classifier, IVF
    index): resolve the LATEST manifest once and fetch a REQUIRED meta
    key, with the two failure modes every reader needs distinguished —
    a store with no commits (FileNotFoundError) vs a manifest store
    that was never built by the expected writer (ValueError naming
    ``builder``). Callers read their layers from the RETURNED manifest
    so the whole model/index is one snapshot."""
    man = _latest_manifest(spark, path)
    if man is None:
        raise FileNotFoundError(f"manifest store at {path!r} has no commits")
    val = man.get("meta", {}).get(key)
    if val is None:
        raise ValueError(
            f"manifest store at {path!r} carries no {key!r} meta "
            f"(not built by {builder}?)"
        )
    return man, val


def acquire_writer_lease(
    spark, path: str, owner: str | None = None, ttl_s: int = 900
) -> str:
    """Best-effort writer lease for a manifest store — the EARLY
    tripwire on schemes where the manifest publish's exclusive-create
    is itself best-effort (S3A's HEAD-then-PUT; see
    :func:`_write_manifest`'s per-scheme table). A second writer that
    takes the lease BEFORE doing any work fails here, loudly, naming
    the holder — instead of both writers racing a whole commit's worth
    of data writes to a possibly-unguarded publish.

    Semantics: exclusive-create of ``{path}/_lease.json`` carrying
    ``{owner, pid, token, acquired, ttl_s}``. A live lease raises
    IOError naming the holder. An EXPIRED lease (acquired + ttl_s in
    the past — the holder crashed without releasing) is deleted and
    re-acquired with one retry. Returns the lease token for
    :func:`release_writer_lease` / :func:`renew_writer_lease`.

    Honest limits, by construction: expiry compares driver wall
    clocks, and reclaiming an expired lease is delete-then-create — a
    race window on non-atomic schemes, SHRUNK (not closed) by a
    read-back verification: after writing its lease, the acquirer
    re-reads the file and fails unless ITS token is what survived, so
    the delete-after-create interleaving (writer B's late delete
    destroys writer A's fresh lease, then B creates) is detected by A
    at acquire time instead of silently leaving both writers convinced
    they hold it. Still a TRIPWIRE that turns 'two writers silently
    interleave commits' into 'the second writer almost always fails
    fast', not a lock service. The hard guard remains the
    exclusive-create publish where the filesystem provides one;
    single-writer stays the deployment contract on S3-class schemes."""
    import os
    import time as _time

    token = uuid.uuid4().hex
    lease = {
        "owner": owner or f"pid-{os.getpid()}",
        "pid": os.getpid(),
        "token": token,
        "acquired": _time.time(),
        "ttl_s": int(ttl_s),
    }
    fs, p = _fs_path(spark, f"{path}/_lease.json")
    for attempt in (0, 1):
        try:
            out = fs.create(p, False)
        except Exception:  # noqa: BLE001 — lease exists (or create raced)
            try:
                held = json.loads(_read_small(spark, f"{path}/_lease.json"))
            except (ValueError, IOError):
                held = None  # torn lease write: treat as expired
            if (
                held is not None
                and _time.time() - float(held.get("acquired", 0))
                < float(held.get("ttl_s", ttl_s))
            ):
                raise IOError(
                    f"manifest store at {path!r}: writer lease held by "
                    f"{held.get('owner')!r} (pid {held.get('pid')}, "
                    f"{int(_time.time() - float(held.get('acquired', 0)))}s ago) "
                    "— single-writer store, second writer refused"
                ) from None
            if attempt == 1:
                raise IOError(
                    f"manifest store at {path!r}: could not reclaim an "
                    "expired/torn writer lease (create keeps failing)"
                ) from None
            fs.delete(p, False)  # expired or torn: reclaim and retry once
            continue
        try:
            out.write(bytearray(json.dumps(lease).encode("utf-8")))
        finally:
            out.close()
        # read-back verification: only the writer whose token SURVIVED
        # on disk holds the lease — a racing reclaimer whose delete
        # landed after our create (and whose own create then replaced
        # the file) is caught here instead of both writers proceeding
        if not _lease_matches(spark, path, token):
            raise IOError(
                f"manifest store at {path!r}: lost the writer-lease "
                "reclaim race (another writer's lease survived the "
                "read-back check) — single-writer store, refusing"
            )
        return token
    raise AssertionError("unreachable")


def _read_small(spark, full_path: str) -> str:
    """Read a small text object through the Hadoop FS (driver-side)."""
    jvm = spark._jvm
    fs, p = _fs_path(spark, full_path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _lease_matches(spark, path: str, token: str) -> bool:
    try:
        held = json.loads(_read_small(spark, f"{path}/_lease.json"))
    except (ValueError, IOError):
        return False
    return held.get("token") == token


def renew_writer_lease(spark, path: str, token: str) -> None:
    """Refresh the lease's acquired timestamp (long-lived streams renew
    well inside ttl_s). Raises the same lease-lost IOError on EVERY
    losing path — token no longer current, the delete-to-recreate
    window lost to a concurrent acquire (the re-create fails: wrapped,
    not a raw JVM error), or another writer's lease survived the
    read-back — so the holder always learns it lost the lease instead
    of writing on."""
    import os
    import time as _time

    def _lost() -> IOError:
        return IOError(
            f"manifest store at {path!r}: lease token no longer current "
            "(expired and reclaimed by another writer?)"
        )

    if not _lease_matches(spark, path, token):
        raise _lost()
    held = json.loads(_read_small(spark, f"{path}/_lease.json"))
    held["acquired"] = _time.time()
    fs, p = _fs_path(spark, f"{path}/_lease.json")
    fs.delete(p, False)
    try:
        out = fs.create(p, False)
    except Exception:  # noqa: BLE001 — a concurrent acquire won the window
        raise _lost() from None
    try:
        out.write(bytearray(json.dumps(held).encode("utf-8")))
    finally:
        out.close()
    if not _lease_matches(spark, path, token):
        raise _lost()


def release_writer_lease(spark, path: str, token: str) -> None:
    """Release the lease if (and only if) ``token`` still holds it —
    releasing someone else's reclaimed lease would unguard a live
    writer. Releasing an already-lost lease is a no-op."""
    if _lease_matches(spark, path, token):
        fs, p = _fs_path(spark, f"{path}/_lease.json")
        fs.delete(p, False)


def _start_leased_stream(spark, writer, path: str, token: str):
    """Start a stream writer whose store lease is already held and
    attach the release half of its lifecycle: a StreamingQueryListener
    scoped to this query's id releases the lease when the query
    terminates (stop, availableNow completion, or failure) and then
    deregisters itself. If the holder dies without the callback firing
    (driver crash), TTL expiry reclaims — the lease's normal crash
    story. If ``start()`` itself fails, the lease is released
    immediately so a misconfigured writer doesn't poison the store for
    a TTL."""
    try:
        query = writer.start()
    except Exception:
        release_writer_lease(spark, path, token)
        raise
    from pyspark.sql.streaming import StreamingQueryListener

    qid = str(query.id)

    class _ReleaseOnTerminate(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: D102 — listener contract
            pass

        def onQueryProgress(self, event):  # noqa: D102
            pass

        def onQueryIdle(self, event):  # noqa: D102
            pass

        def onQueryTerminated(self, event):  # noqa: D102
            if str(event.id) != qid:
                return
            try:
                release_writer_lease(spark, path, token)
            finally:
                try:
                    spark.streams.removeListener(listener)
                except Exception:  # noqa: BLE001 — already removed
                    pass

    listener = _ReleaseOnTerminate()
    spark.streams.addListener(listener)
    return query


def is_manifest_store(spark, path: str) -> bool:
    """Whether ``path`` is a manifest-protocol store (has a
    ``_manifests/`` directory) — the seam store-agnostic readers use to
    pick between a manifest resolve and a plain parquet scan."""
    fs, d = _fs_path(spark, f"{path}/{_MANIFEST_DIR}")
    return bool(fs.exists(d))


def commit_merged_parts(
    merged: DataFrame,
    path: str,
    part_col: str,
    checkpoint: str | None = None,
    batch_id: int | None = None,
    prev: dict | None = None,
    shuffle: bool = True,
) -> int:
    """Write ``merged``'s partitions to a fresh immutable commit
    directory and publish a manifest pointing every LIVE partition at
    its current directory (touched ones repointed here, untouched ones
    carried forward). Returns the commit counter. A crash anywhere
    before the manifest publish leaves only unreferenced directories —
    invisible to every reader and reclaimed by
    :func:`vacuum_manifest_store`. ``prev`` passes an already-resolved
    latest manifest so a fold loop reads the store's metadata once per
    batch, not once per helper (the listings/GETs are the per-commit
    bill on an object store). ``shuffle=False`` skips the
    ``repartition(part_col)`` file-count hygiene pass — right when the
    commit touches ONE partition value (e.g. a per-batch corpus
    landing), where the shuffle would funnel every batch byte through a
    single task for no layout benefit."""
    spark = merged.sparkSession
    if prev is None:
        prev = _latest_manifest(spark, path)
    n = _next_commit_n(spark, path)
    cdir = f"{_DATA_DIR}/c-{n:012d}-{uuid.uuid4().hex[:8]}"
    if shuffle:
        merged = merged.repartition(part_col)
    (
        merged.write.mode("errorifexists")
        .partitionBy(part_col)
        .parquet(f"{path}/{cdir}")
    )
    fs, cpath = _fs_path(spark, f"{path}/{cdir}")
    prefix = f"{part_col}="
    parts = dict(prev["parts"]) if prev else {}
    for status in fs.listStatus(cpath):
        name = status.getPath().getName()
        if name.startswith(prefix):
            parts[name[len(prefix):]] = f"{cdir}/{name}"
    man = _next_manifest(prev, n, checkpoint, batch_id)
    man["part_col"] = part_col
    man["parts"] = parts
    _write_manifest(spark, path, man)
    return n


def _next_manifest(
    prev: dict | None, n: int, checkpoint: str | None, batch_id: int | None
) -> dict:
    """Skeleton of commit ``n``'s manifest: every section of ``prev``
    (parts, layers, meta, lineage) carried forward verbatim so a commit
    that touches one section can never drop another, with the replay
    watermark folded in when the caller runs under a stream."""
    man = {
        "n": n,
        "parts": dict(prev.get("parts", {})) if prev else {},
        "layers": {k: list(v) for k, v in prev.get("layers", {}).items()}
        if prev
        else {},
        "meta": dict(prev.get("meta", {})) if prev else {},
        "lineage": dict(prev.get("lineage", {})) if prev else {},
    }
    if prev and "part_col" in prev:
        man["part_col"] = prev["part_col"]
    if checkpoint is not None and batch_id is not None:
        man["lineage"][_lineage(checkpoint)] = int(batch_id)
    return man


def commit_layer_frames(
    spark,
    path: str,
    frames: dict[str, DataFrame],
    replace: bool = False,
    meta: dict | None = None,
    checkpoint: str | None = None,
    batch_id: int | None = None,
    prev: dict | None = None,
) -> int:
    """Commit named LAYER frames — the manifest shape for append-mostly
    multi-layer stores (the dedup index's exact/sigs/bands/grams
    layers, the stored LM's bigrams/prefix) where data is keyed by
    LAYER, not by a partition column. Each layer's live data is a LIST
    of immutable directories; an append adds one directory to the list,
    ``replace=True`` repoints the listed layers at their fresh
    directory alone (build/rebuild/compaction). All frames land under
    ONE commit directory and publish in ONE manifest, so a multi-layer
    append (sigs + bands + grams) is atomic: readers see every layer
    advance together or none — the property the plain parquet-append
    protocol fundamentally lacks (its cross-layer races are merely
    benign, not absent).

    ``meta`` merges the given keys into the store's carried-forward
    metadata dict — pinned parameters (hash counts, gram order, vocab
    size) commit atomically with the data they describe, and reading
    them back is a driver-side JSON field, not a Spark job.

    ``frames`` may be EMPTY: the commit then publishes a metadata-only
    manifest (carried-forward pointers + lineage watermark) — how a
    stream records "this batch produced nothing" exactly-once. Returns
    the commit counter."""
    if prev is None:
        prev = _latest_manifest(spark, path)
    n = _next_commit_n(spark, path)
    man = _next_manifest(prev, n, checkpoint, batch_id)
    if meta:
        # layer_schemas merges per layer (a caller-passed dict must not
        # wipe the carried-forward schemas of layers it doesn't touch)
        ls = dict(man["meta"].get("layer_schemas") or {})
        ls.update(meta.get("layer_schemas") or {})
        man["meta"].update(meta)
        if ls:
            man["meta"]["layer_schemas"] = ls
    if frames:
        # pin every written layer's schema in the manifest meta: later
        # snapshot reads skip parquet schema inference (one plan-time
        # Spark job per layer read) — see read_manifest_layer
        from traceframe_spark.session import schema_json_of

        ls = dict(man["meta"].get("layer_schemas") or {})
        ls.update({k: schema_json_of(v) for k, v in frames.items()})
        man["meta"]["layer_schemas"] = ls
    if frames:
        cdir = f"{_DATA_DIR}/c-{n:012d}-{uuid.uuid4().hex[:8]}"
        # The per-layer writes are independent Spark jobs into disjoint
        # immutable directories, and NOTHING is published until the one
        # manifest write below — so they can run concurrently from a
        # small thread pool (guide §2.6: later jobs back-fill executors
        # freed by the current job's tail) instead of paying one full
        # job latency per layer in sequence. Atomicity is unchanged: a
        # failure in any layer raises before the manifest is written,
        # leaving only invisible directories. Callers that derive
        # several layers from one persisted frame should materialize it
        # first; the cache's per-block locks make the race correct
        # either way, merely less parallel.
        from concurrent.futures import ThreadPoolExecutor

        def _write_layer(layer: str) -> None:
            frames[layer].write.mode("errorifexists").parquet(
                f"{path}/{cdir}/{layer}"
            )

        layers = sorted(frames)
        if len(layers) == 1:
            _write_layer(layers[0])
        else:
            with ThreadPoolExecutor(max_workers=min(4, len(layers))) as pool:
                for _ in pool.map(_write_layer, layers):
                    pass
        for layer in layers:
            d = f"{cdir}/{layer}"
            if replace:
                man["layers"][layer] = [d]
            else:
                man["layers"].setdefault(layer, []).append(d)
    _write_manifest(spark, path, man)
    return n


def append_parts_layer(
    spark,
    path: str,
    df: DataFrame,
    part_col: str,
    replace: bool = False,
    meta: dict | None = None,
    checkpoint: str | None = None,
    batch_id: int | None = None,
    prev: dict | None = None,
    extra_layers: dict[str, DataFrame] | None = None,
) -> int:
    """Commit an APPEND-ACCUMULATING partitioned layer store: ``df``
    lands partitioned by ``part_col`` under ONE immutable commit
    directory in ONE write job, and each written ``part_col=val``
    subdirectory is appended to the manifest's layer list keyed by that
    literal directory name — so a partition value's live data is a
    growing LIST of immutable directories (the shape
    :func:`commit_merged_parts` deliberately isn't: its parts section
    REPOINTS a value, the rollup merge semantics; this accumulates, the
    inverted-list/append-log semantics). ``replace=True`` first drops
    every existing ``{part_col}=`` layer — a rebuild commits the new
    data AND retires the old lists atomically.

    Keying layers by the literal ``part_col=val`` directory name buys
    three properties for free: vacuum and carry-forward already treat
    layer dirs as live data; :func:`compact_manifest_layers` rewrites
    each list to one directory whose name is STILL a partition
    directory; and :func:`read_parts_layers` can reconstruct the
    partition column by directory inference. ``meta`` (e.g. pinned
    centroids) and the replay watermark commit atomically with the
    data pointers. ``extra_layers`` are NAMED side layers (e.g. the
    IVF store's ``ids_bloom`` membership sidecar) written under the
    SAME commit directory and published in the SAME manifest — a
    partitioned append and its sidecars advance together or not at
    all; names must not start with ``{part_col}=`` (they'd shadow
    partition layers). ``replace=True`` also retires existing layers
    of each extra name. Returns the commit counter."""
    if prev is None:
        prev = _latest_manifest(spark, path)
    n = _next_commit_n(spark, path)
    man = _next_manifest(prev, n, checkpoint, batch_id)
    if meta:
        man["meta"].update(meta)
    prefix = f"{part_col}="
    if extra_layers and any(k.startswith(prefix) for k in extra_layers):
        raise ValueError(
            f"extra_layers names must not start with {prefix!r}"
        )
    if replace:
        for k in [k for k in man["layers"] if k.startswith(prefix)]:
            del man["layers"][k]
    cdir = f"{_DATA_DIR}/c-{n:012d}-{uuid.uuid4().hex[:8]}"
    # the partitioned write and each extra layer are independent Spark
    # jobs into disjoint immutable commit directories (each extra gets
    # its own uniformly-named c-* dir so the main partitioned write's
    # errorifexists contract on ITS dir is untouched) — overlap them
    # (guide §2.6, the commit_layer_frames discipline): an IVF-PQ build
    # otherwise pays the ids_bloom aggregation as a full serial job
    # after the encode+write job's tail. Atomicity unchanged — a
    # failure raises before the manifest publish, leaving only
    # invisible directories (the vacuum orphan sweep already reclaims
    # unpublished c-* dirs numbered at or below the newest commit).
    extra_names = sorted(extra_layers or {})
    extra_dirs = {
        name: f"{_DATA_DIR}/c-{n:012d}-{uuid.uuid4().hex[:8]}/{name}"
        for name in extra_names
    }

    def _write_main() -> None:
        df.write.mode("errorifexists").partitionBy(part_col).parquet(
            f"{path}/{cdir}"
        )

    def _write_extra(name: str) -> None:
        extra_layers[name].write.mode("errorifexists").parquet(
            f"{path}/{extra_dirs[name]}"
        )

    if extra_names:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1 + len(extra_names)) as pool:
            futs = [pool.submit(_write_main)]
            futs += [pool.submit(_write_extra, nm) for nm in extra_names]
            for f in futs:
                f.result()
    else:
        _write_main()
    fs, cpath = _fs_path(spark, f"{path}/{cdir}")
    for status in fs.listStatus(cpath):
        name = status.getPath().getName()
        if name.startswith(prefix):
            man["layers"].setdefault(name, []).append(f"{cdir}/{name}")
    for name in extra_names:
        d = extra_dirs[name]
        if replace:
            man["layers"][name] = [d]
        else:
            man["layers"].setdefault(name, []).append(d)
    man["part_col"] = part_col
    _write_manifest(spark, path, man)
    return n


def read_parts_layers(
    spark,
    path: str,
    vals: list[str] | None = None,
    version: int | None = None,
    man: dict | None = None,
) -> DataFrame:
    """Snapshot read of an :func:`append_parts_layer` store, PRUNED to
    the requested partition values (all live values when ``vals`` is
    None): resolve ONE manifest, collect the listed directories of only
    the requested ``part_col=val`` layers, group them by commit
    directory and scan each group with ``basePath`` so the partition
    column is reconstructed — unrequested values are never even LISTED,
    a stronger prune than a scan-time PartitionFilter. Plan size
    follows live directories of the requested values (appends grow it;
    :func:`compact_manifest_layers` resets each value to one)."""
    if man is None:
        if version is None:
            man = _latest_manifest(spark, path)
            if man is None:
                raise FileNotFoundError(f"manifest store at {path!r} has no commits")
        else:
            name = f"m-{int(version):012d}.json"
            if name not in _manifest_names(spark, path):
                raise FileNotFoundError(
                    f"manifest store at {path!r}: version {version} is absent"
                )
            man = _read_manifest(spark, path, name)
    part_col = man.get("part_col")
    if part_col is None:
        raise FileNotFoundError(
            f"manifest store at {path!r} has no partitioned layers"
        )
    prefix = f"{part_col}="
    want = (
        None if vals is None else {f"{prefix}{v}" for v in vals}
    )
    by_cdir: dict[str, list[str]] = {}
    for layer, dirs in man.get("layers", {}).items():
        if not layer.startswith(prefix) or (want is not None and layer not in want):
            continue
        for d in dirs:
            by_cdir.setdefault(d.rsplit("/", 1)[0], []).append(d)
    out = None
    for cdir, dirs in sorted(by_cdir.items()):
        df = (
            spark.read.option("basePath", f"{path}/{cdir}")
            .parquet(*[f"{path}/{d}" for d in sorted(dirs)])
        )
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise FileNotFoundError(
            f"manifest store at {path!r} has no live partitioned layers "
            f"for the requested values"
        )
    return out


def read_manifest_layer(
    spark, path: str, layer: str, version: int | None = None, man: dict | None = None
) -> DataFrame:
    """Snapshot read of one layer: resolve ONE manifest (latest, a
    pinned past ``version``, or a pre-resolved ``man``) and scan exactly
    the directories it lists for ``layer`` — a single multi-path scan,
    no union of plans, and plan size follows the layer's LIVE directory
    count (one per append since the last replace/compaction), never
    store history. Raises if the store/layer is absent."""
    if man is None:
        if version is None:
            man = _latest_manifest(spark, path)
            if man is None:
                raise FileNotFoundError(
                    f"manifest store at {path!r} has no commits"
                )
        else:
            name = f"m-{int(version):012d}.json"
            if name not in _manifest_names(spark, path):
                raise FileNotFoundError(
                    f"manifest store at {path!r}: version {version} is absent"
                )
            man = _read_manifest(spark, path, name)
    dirs = man.get("layers", {}).get(layer)
    if not dirs:
        raise FileNotFoundError(
            f"manifest store at {path!r} has no layer {layer!r}"
        )
    # build-time pinned schema (meta["layer_schemas"], when the writer
    # recorded one) skips parquet schema inference — one Spark job per
    # layer read otherwise, paid at probe PLAN time
    sj = man.get("meta", {}).get("layer_schemas", {}).get(layer)
    if isinstance(sj, dict):
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(sj)).parquet(
            *[f"{path}/{d}" for d in dirs]
        )
    return spark.read.parquet(*[f"{path}/{d}" for d in dirs])


def compact_manifest_layers(spark, path: str) -> int:
    """Rewrite every layer's directory list into ONE fresh directory
    each and publish — the layer-store twin of
    :func:`compact_manifest_store`: appends grow a layer's directory
    list (and so its scan's file-listing cost) linearly with commit
    count, and compaction resets it to one. Snapshot isolation holds
    throughout (normal commit); superseded directories are reclaimed by
    the next :func:`vacuum_manifest_store`. Returns the new commit
    counter."""
    man = _latest_manifest(spark, path)
    if man is None:
        raise FileNotFoundError(f"manifest store at {path!r} has no commits")
    layers = man.get("layers", {})
    if not layers:
        raise FileNotFoundError(f"manifest store at {path!r} has no layers")
    frames = {}
    for layer in layers:
        df = read_manifest_layer(spark, path, layer, man=man)
        if layer.endswith("_bloom"):
            # bloom sidecar layers (word-packed bit rows) accumulate
            # one row-set per append; compaction FOLDS them by bitwise
            # OR so the layer's row count resets to <= n_words instead
            # of merely collapsing directories
            df = df.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
        frames[layer] = df.localCheckpoint()
    return commit_layer_frames(spark, path, frames, replace=True, prev=man)


def run_scheduled_compaction(
    spark,
    path: str,
    compact_every: int | None,
    vacuum_keep: int | None,
    prev: dict | None,
) -> bool:
    """The streaming loops' compaction cadence, shared by
    ``stream_dedup_ingest(store_protocol="manifest")`` and
    ``stream_embed_ingest``: given the manifest the batch RESOLVED
    (``prev`` — before its own append, which adds at most one
    directory per layer), compact when any layer's live list is about
    to reach ``compact_every`` directories. The cadence state is the
    manifest itself — no counters to persist, so restarts and replays
    need no special handling, and the bound holds from any starting
    state (a store that accumulated dirs while the knob was off
    compacts on the first batch after it's turned on). Compaction is a
    normal commit (racing readers keep snapshot isolation); with
    ``vacuum_keep`` set, superseded directories are reclaimed
    immediately after, keeping ``keep_manifests=vacuum_keep`` grace
    versions for readers that resolved just before the compaction.
    Returns whether a compaction ran."""
    if compact_every is None or prev is None:
        return False
    layers = prev.get("layers", {})
    if not layers:
        return False
    if max(len(d) for d in layers.values()) + 1 < compact_every:
        return False
    compact_manifest_layers(spark, path)
    if vacuum_keep is not None:
        vacuum_manifest_store(spark, path, keep_manifests=vacuum_keep)
    return True


def manifest_last_batch(spark, path: str, checkpoint: str) -> int | None:
    """The last batch_id committed for this checkpoint lineage, or None.
    This IS the replay guard: it commits atomically with the data
    pointers, so there is no write-then-mark window to recover from."""
    man = _latest_manifest(spark, path)
    if man is None:
        return None
    v = man.get("lineage", {}).get(_lineage(checkpoint))
    return int(v) if v is not None else None


def _read_parts(spark, path: str, man: dict, vals: list[str]) -> DataFrame | None:
    """Union of one partition-pruned scan per live commit directory for
    the requested partition values (partition column reconstructed by
    Spark's directory inference via basePath). None if no value is live.

    BIN directories (:func:`compact_corpus_store` — name not
    ``{part_col}=...``) carry the partition column as a PHYSICAL file
    column and may serve values beyond the requested set; when one is
    included the result is row-filtered back to the requested values
    (row-group stats prune inside the bin — the rewrite sorts by the
    partition column)."""
    part_col = man.get("part_col")
    prefix = f"{part_col}="
    by_cdir: dict[str, list[str]] = {}
    over_delivery = False
    served: dict[str, set] | None = None
    want = set(vals)
    for v in vals:
        d = man["parts"].get(v)
        if d is None:
            continue
        cdir = d.rsplit("/", 1)[0]
        lst = by_cdir.setdefault(cdir, [])
        if d in lst:
            continue
        lst.append(d)
        if not d.rsplit("/", 1)[1].startswith(prefix):
            if served is None:
                served = {}
                for v2, d2 in man["parts"].items():
                    served.setdefault(d2, set()).add(v2)
            if not served[d] <= want:
                over_delivery = True
    out = None
    for cdir, dirs in sorted(by_cdir.items()):
        df = (
            spark.read.option("basePath", f"{path}/{cdir}")
            .parquet(*[f"{path}/{d}" for d in sorted(dirs)])
        )
        out = df if out is None else out.unionByName(df)
    if out is not None and over_delivery:
        out = out.where(F.col(part_col).cast("string").isin(sorted(want)))
    return out


def read_manifest_store(spark, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: resolve ONE manifest and scan exactly the
    directories it names — every partition from a single store version,
    even while a writer is mid-commit (strictly stronger than the
    rename-swap store's per-partition old-or-new). ``version`` pins a
    PAST commit (time travel): any version whose manifest survives
    (the newest ``keep_manifests`` after a vacuum) reads back exactly,
    which is what makes a training run reproducible against a store
    that keeps ingesting — record ``store@n`` with the run, raise the
    vacuum grace window to taste. Default reads the latest commit.
    Raises if the store has no commits / the pinned version's manifest
    has been vacuumed."""
    if version is None:
        man = _latest_manifest(spark, path)
        if man is None:
            raise FileNotFoundError(f"manifest store at {path!r} has no commits")
    else:
        name = f"m-{int(version):012d}.json"
        if name not in _manifest_names(spark, path):
            raise FileNotFoundError(
                f"manifest store at {path!r}: version {version} is absent "
                "(never committed, or vacuumed — raise keep_manifests to "
                "widen the time-travel window)"
            )
        man = _read_manifest(spark, path, name)
    df = _read_parts(spark, path, man, list(man["parts"]))
    if df is None:  # a manifest with zero parts: commit of an empty frame
        raise FileNotFoundError(f"manifest store at {path!r} has no live partitions")
    return df


def merge_into_manifest_store(
    spark,
    delta: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str | None = None,
    batch_id: int | None = None,
    man: dict | None = None,
) -> int:
    """Fold a (bucket_ns, *keys, n, sums, hour_ns) partial frame into the
    store: standing read of ONLY the touched hours (straight from the
    manifest — no directory listing job at any store age, the same
    O(touched) property the rename store gets from its driver-side
    root listing), lossless merge, one commit. No crash recovery step
    exists because none is needed: un-manifested directories are
    invisible. ``man`` passes a pre-resolved latest manifest (see
    :func:`commit_merged_parts`)."""
    from traceframe_spark.operators import rollup as R

    touched = [
        str(r["hour_ns"]) for r in delta.select("hour_ns").distinct().collect()
    ]
    if man is None:
        man = _latest_manifest(spark, path)
    standing = _read_parts(spark, path, man, touched) if man else None
    if standing is not None:
        # localCheckpoint: immutable dirs are never deleted under the
        # plan, but the merged write re-reads the standing side and
        # vacuum may reclaim it between plan and action in exotic
        # orchestrations — pinning is cheap at touched-partition size
        standing = standing.localCheckpoint()
        merged = R.merge_rollups(standing.drop("hour_ns"), delta.drop("hour_ns"), keys)
    else:
        merged = R.merge_rollups(
            delta.drop("hour_ns"), delta.drop("hour_ns").limit(0), keys
        )
    merged = merged.withColumn(
        "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
    )
    return commit_merged_parts(
        merged, path, "hour_ns", checkpoint=checkpoint, batch_id=batch_id, prev=man
    )


def stream_to_rollup_manifest(
    events: DataFrame,
    path: str,
    checkpoint: str,
    bucket_ns: int,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    lease: bool = False,
    lease_ttl_s: int = 900,
    trigger_available_now: bool = False,
):
    """The manifest-committed twin of ``stream_to_rollup``: same
    continuous-aggregate semantics (each micro-batch folds its delta
    and rewrites only touched hours), but commits via the manifest
    protocol — safe on S3-class object stores where the rename-swap
    store refuses to run, with whole-store snapshot isolation for
    readers and the replay marker folded into the atomic commit
    (exactly-once without a write-then-mark window). Read back with
    :func:`read_manifest_store`.

    CONTRACT: one writer per store — this stream must be the only
    process committing to ``path``. The exclusive-create publish is a
    loud tripwire where the filesystem can arbitrate it (HDFS/local);
    on S3A it is best-effort (HEAD-then-PUT) — see SCALING.md's
    per-scheme guard table. Readers are safe either way (torn newest
    manifests are skipped), but two concurrent writers can drop each
    other's commits. ``lease=True`` makes the contract SELF-ENFORCING:
    the stream acquires the store's writer lease before starting (a
    second stream against the same store fails AT START, loudly,
    naming the holder), renews it every batch (so losing the lease
    mid-stream fails the query instead of writing on), and releases it
    on termination; a crashed holder's lease expires after
    ``lease_ttl_s`` (keep it ≫ the batch interval)."""
    from traceframe_spark.operators import rollup as R

    spark0 = events.sparkSession
    token = (
        acquire_writer_lease(
            spark0, path, owner=f"rollup-stream:{_lineage(checkpoint)}",
            ttl_s=lease_ttl_s,
        )
        if lease
        else None
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if token is not None:
            renew_writer_lease(spark, path, token)
        # ONE manifest resolution per batch: the watermark check, the
        # standing read, and the commit all consume this snapshot
        man = _latest_manifest(spark, path)
        last = man.get("lineage", {}).get(_lineage(checkpoint)) if man else None
        if last is not None and batch_id <= int(last):
            return  # committed atomically with the data: replay skips
        delta = R.rollup_events(batch_df, bucket_ns, keys, value_col, ts_col)
        delta = delta.withColumn(
            "hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS)
        ).localCheckpoint()
        merge_into_manifest_store(
            spark, delta, path, keys, checkpoint=checkpoint, batch_id=batch_id,
            man=man,
        )

    writer = (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if token is not None:
        return _start_leased_stream(spark0, writer, path, token)
    return writer.start()


def stream_to_hll_manifest(
    events: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    day_from_ts: str = "ts",
    p: int = 10,
    lease: bool = False,
    lease_ttl_s: int = 900,
    trigger_available_now: bool = False,
):
    """The manifest-committed twin of ``stream_to_hll_store``
    (continuous per-day distinct counting via HyperLogLog registers):
    same union + per-(day, bucket) register-MAX fold, committed through
    the manifest protocol — which also demonstrates the commit
    primitive is partition-column generic (``day`` here, ``hour_ns``
    for the rollup twin). The HLL fold is idempotent by itself, so the
    atomic batch watermark is belt-and-braces here; what the manifest
    buys this store on S3-class backends is the legal commit path and
    snapshot reads. Read back with :func:`read_manifest_store` +
    ``sketch.hll_estimate_by(..., ["day"])``.

    Same single-writer contract (and per-scheme tripwire strength) as
    :func:`stream_to_rollup_manifest`; ``lease=True`` self-enforces it
    the same way (acquire at start / renew per batch / release on
    termination)."""
    from traceframe_spark.operators import sketch

    spark0 = events.sparkSession
    token = (
        acquire_writer_lease(
            spark0, path, owner=f"hll-stream:{_lineage(checkpoint)}",
            ttl_s=lease_ttl_s,
        )
        if lease
        else None
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if token is not None:
            renew_writer_lease(spark, path, token)
        # ONE manifest resolution per batch (watermark + standing read
        # + commit), same as the rollup twin
        man = _latest_manifest(spark, path)
        last = man.get("lineage", {}).get(_lineage(checkpoint)) if man else None
        if last is not None and batch_id <= int(last):
            return
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
        touched = [str(row["day"]) for row in delta.select("day").distinct().collect()]
        standing = _read_parts(spark, path, man, touched) if man else None
        if standing is not None:
            merged = (
                standing.localCheckpoint()
                .unionByName(delta)
                .groupBy("day", "bucket")
                .agg(F.max("rho_max").alias("rho_max"))
            )
        else:
            merged = delta
        commit_merged_parts(
            merged, path, "day", checkpoint=checkpoint, batch_id=batch_id, prev=man
        )

    writer = (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if token is not None:
        return _start_leased_stream(spark0, writer, path, token)
    return writer.start()


def compact_manifest_store(spark, path: str) -> int:
    """Rewrite every live partition into ONE fresh commit directory and
    publish it — the reader-plan-size lever: read cost follows LIVE
    commit directories (one pruned scan per dir), which ordinary
    operation bounds by the partition count but never shrinks; after a
    compaction the whole store is a single directory again. Runs as a
    normal commit, so racing readers keep full snapshot isolation, and
    the superseded directories are reclaimed by the next
    :func:`vacuum_manifest_store`. Returns the new commit counter.
    Cost: one full-store read + write (data-sized — schedule it like
    any compaction); the COMMIT is still one manifest object."""
    man = _latest_manifest(spark, path)
    if man is None:
        raise FileNotFoundError(f"manifest store at {path!r} has no commits")
    df = _read_parts(spark, path, man, list(man["parts"]))
    if df is None:
        raise FileNotFoundError(f"manifest store at {path!r} has no live partitions")
    return commit_merged_parts(df.localCheckpoint(), path, man["part_col"])


def compact_corpus_store(
    spark, path: str, bin_size: int = 100, files_per_bin: int = 1
) -> int:
    """Bin-packing rewrite for an int-keyed parts store — the curated
    corpus a streaming loop lands at ``out_path`` accumulates ONE
    directory (and its small files) per micro-batch FOREVER, so at 10k
    batches a full-corpus read unions 10k per-directory scans and the
    file count follows batch count, not data size. This groups live
    partition values into ``bin_size``-wide ranges and rewrites every
    bin currently spread over >1 directory into ONE ``bin-XXXXXXXX``
    directory of ``files_per_bin`` files, sorted by the partition
    column (which becomes a PHYSICAL column in the bin's files —
    readers keep per-value pruning via the manifest's value→bin map
    plus row-group stats; see :func:`_read_parts`). One normal commit
    under the same snapshot protocol: racing readers keep their
    resolved manifest, byte-identical rows, superseded directories
    reclaimed by the next :func:`vacuum_manifest_store`, and the
    replay-watermark lineage carries forward untouched.

    Steady-state cost: each call reads+rewrites only the bins that
    gained directories since the last call — O(bin_size batches of
    data), never the whole corpus (a fully-packed old bin is one
    directory and is skipped). Pick ``bin_size``/``files_per_bin`` so
    a bin's bytes make healthy parquet files at your batch size.
    Returns the number of bins rewritten (0 = already packed, no
    commit published)."""
    if bin_size < 1:
        raise ValueError("bin_size must be >= 1")
    man = _latest_manifest(spark, path)
    if man is None:
        raise FileNotFoundError(f"manifest store at {path!r} has no commits")
    parts = man.get("parts", {})
    if not parts:
        return 0
    bins: dict[int, list[str]] = {}
    for v in parts:
        bins.setdefault(int(v) // bin_size, []).append(v)
    todo = {
        b: sorted(vs, key=int)
        for b, vs in bins.items()
        if len({parts[v] for v in vs}) > 1
    }
    if not todo:
        return 0
    part_col = man["part_col"]
    n = _next_commit_n(spark, path)
    new_man = _next_manifest(man, n, None, None)
    cdir = f"{_DATA_DIR}/c-{n:012d}-{uuid.uuid4().hex[:8]}"
    for b, vs in sorted(todo.items()):
        df = _read_parts(spark, path, man, vs)
        d = f"{cdir}/bin-{b:08d}"
        (
            df.repartition(files_per_bin)
            .sortWithinPartitions(part_col)
            .write.mode("errorifexists")
            .parquet(f"{path}/{d}")
        )
        for v in vs:
            new_man["parts"][v] = d
    _write_manifest(spark, path, new_man)
    return len(todo)


def vacuum_manifest_store(spark, path: str, keep_manifests: int = 2) -> int:
    """Reclaim commit directories referenced by NO kept manifest and
    drop manifests older than the newest ``keep_manifests``. Returns the
    number of directories removed. ``keep_manifests >= 2`` leaves a
    grace version for readers that resolved the previous manifest just
    before a commit; raise it to widen the read-grace window (the
    trade-off every snapshot store has). Also sweeps orphan ``c-*``
    directories no manifest ever referenced (crash leftovers) — but
    only those NUMBERED at or below the newest kept commit, so an
    in-flight writer's not-yet-published directory is never reclaimed."""
    if keep_manifests < 1:
        raise ValueError("keep_manifests must be >= 1")
    names = _manifest_names(spark, path)
    if not names:
        return 0
    # the kept window counts PARSEABLE manifests only: a torn-publish
    # leftover references nothing, so letting it consume a grace slot
    # would silently shrink the reader grace window to keep_manifests-1.
    # Torn names older than the kept window are still deleted; torn
    # names inside/after it are left alone (the next commit numbers
    # past them) and never counted.
    manifests: dict[str, dict | None] = {}
    for name in names:
        try:
            manifests[name] = _read_manifest(spark, path, name)
        except (ValueError, IOError):
            manifests[name] = None  # torn publish leftover
    parseable = [n for n in names if manifests[n] is not None]
    kept = parseable[-keep_manifests:] if parseable else names[-keep_manifests:]
    dropped = [n for n in names if n < kept[0]]
    live: set[str] = set()
    for name in kept:
        man = manifests.get(name)
        if man is None:
            continue  # all-torn fallback window: references nothing
        live.update(d.split("/")[1] for d in _manifest_dirs(man))
    newest_n = int(kept[-1].split("-")[1].split(".")[0])
    fs, data = _fs_path(spark, f"{path}/{_DATA_DIR}")
    removed = 0
    if fs.exists(data):
        for status in fs.listStatus(data):
            name = status.getPath().getName()
            if not name.startswith("c-") or name in live:
                continue
            try:
                n = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if n > newest_n:
                continue  # a writer may be about to publish this commit
            fs.delete(status.getPath(), True)
            removed += 1
    for name in dropped:
        fs2, p = _fs_path(spark, f"{path}/{_MANIFEST_DIR}/{name}")
        fs2.delete(p, False)
    return removed
