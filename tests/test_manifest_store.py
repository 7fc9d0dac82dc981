"""Manifest-pointer committed store (streaming/manifest_store.py): the
object-store-safe commit protocol — immutable data dirs + one atomic
manifest publish per commit. Covers the four properties the module
sells: correct incremental folds, whole-store SNAPSHOT isolation,
crash-invisibility of un-manifested data, and exactly-once replay via
the batch watermark committed atomically with the data pointers."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators import rollup as R
from traceframe_spark.streaming.manifest_store import (
    _latest_manifest,
    _read_parts,
    commit_merged_parts,
    compact_corpus_store,
    manifest_last_batch,
    merge_into_manifest_store,
    read_manifest_store,
    stream_to_rollup_manifest,
    vacuum_manifest_store,
)

BASE = 1_700_000_000_000_000  # µs
HOUR_US = 3_600_000_000
SCHEMA = "event_id long, ts_us long, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts_us") * 1000
    )


def _delta(spark, rows):
    return R.rollup_events(
        _events(spark, rows), R.MINUTE_NS, ["event_type"], "value"
    ).withColumn("hour_ns", R.time_bucket(F.col("bucket_ns"), R.HOUR_NS))


def _totals(df):
    return {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["value_sum"])
        for r in df.collect()
    }


def test_manifest_fold_matches_batch_rollup(spark, tmp_path):
    """Three deltas folded (incl. late data re-touching the first hour)
    equal the one-shot batch rollup of all events; only touched hours
    are repointed per commit, untouched partitions carry forward."""
    store = str(tmp_path / "mstore")
    b0 = [(i, BASE + i * 1_000_000, "click", float(i)) for i in range(6)]
    b1 = [(10 + i, BASE + HOUR_US + i * 1_000_000, "view", 2.0 * i) for i in range(6)]
    b2 = [(20 + i, BASE + i * 1_000_000, "click", 3.0 * i) for i in range(4)]  # late
    for rows in (b0, b1, b2):
        merge_into_manifest_store(
            spark, _delta(spark, rows).localCheckpoint(), store, ["event_type"]
        )
    want = _totals(
        R.rollup_events(_events(spark, b0 + b1 + b2), R.MINUTE_NS, ["event_type"], "value")
    )
    got = _totals(read_manifest_store(spark, store).drop("hour_ns"))
    assert got == want
    # commit 3 (late data) touched only hour 0: hour 1 still points at
    # its commit-2 directory
    man = _latest_manifest(spark, store)
    assert man["n"] == 3
    dirs = {v: d.split("/")[1] for v, d in man["parts"].items()}
    assert len(set(dirs.values())) == 2  # two live commit dirs
    # compaction folds every live partition into ONE commit dir (the
    # reader-plan-size lever), totals unchanged; vacuum then reclaims
    # the superseded dirs
    from traceframe_spark.streaming.manifest_store import compact_manifest_store

    n4 = compact_manifest_store(spark, store)
    assert n4 == 4
    man2 = _latest_manifest(spark, store)
    assert len({d.split("/")[1] for d in man2["parts"].values()}) == 1
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want
    vacuum_manifest_store(spark, store, keep_manifests=1)
    data_dirs = [
        d for d in os.listdir(f"{store}/data") if d.startswith("c-")
    ]
    assert len(data_dirs) == 1
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want


def test_manifest_reader_sees_snapshots_only(spark, tmp_path):
    """Snapshot isolation — stronger than the rename swap's per-
    partition old-or-new: every successful read taken WHILE commits
    land must equal exactly one committed version of the WHOLE store
    (never a mix of hour A from version i and hour B from version j).
    Both hours are rewritten in every commit to maximize the mixing
    opportunity."""
    store = str(tmp_path / "race")
    both_hours = [(0, BASE, "click", 1.0), (1, BASE + HOUR_US, "click", 1.0)]
    merge_into_manifest_store(
        spark, _delta(spark, both_hours).localCheckpoint(), store, ["event_type"]
    )
    versions = [_totals(read_manifest_store(spark, store).drop("hour_ns"))]
    stop, seen, errs = threading.Event(), [], []

    def reader():
        while not stop.is_set():
            try:
                seen.append(_totals(read_manifest_store(spark, store).drop("hour_ns")))
            except Exception as exc:  # noqa: BLE001
                errs.append(repr(exc))

    t = threading.Thread(target=reader)
    t.start()
    try:
        for k in range(1, 6):
            rows = [
                (100 * k, BASE + 1_000_000, "click", float(k)),
                (100 * k + 1, BASE + HOUR_US + 1_000_000, "click", float(k)),
            ]
            merge_into_manifest_store(
                spark, _delta(spark, rows).localCheckpoint(), store, ["event_type"]
            )
            versions.append(_totals(read_manifest_store(spark, store).drop("hour_ns")))
    finally:
        stop.set()
        t.join()
    assert not errs, errs[:3]
    assert len(seen) >= 3
    committed = [json.dumps(sorted((str(k), v) for k, v in ver.items())) for ver in versions]
    for got in seen:
        key = json.dumps(sorted((str(k), v) for k, v in got.items()))
        assert key in committed, "read a state that was never a committed snapshot"


def test_unpublished_commit_dir_is_invisible_and_replay_merges(spark, tmp_path):
    """Crash before the manifest publish: the commit directory exists on
    disk but no reader resolves it, and the replaying merge produces the
    exact totals — no loss, no double count, no recovery step."""
    store = str(tmp_path / "crash")
    b0 = [(i, BASE + i * 1_000_000, "click", 1.0) for i in range(5)]
    merge_into_manifest_store(spark, _delta(spark, b0).localCheckpoint(), store, ["event_type"])
    before = _totals(read_manifest_store(spark, store).drop("hour_ns"))

    # simulate the crash: write the data directory a commit WOULD have
    # written, but never publish a manifest for it
    orphan = _delta(spark, [(99, BASE + 2_000_000, "click", 50.0)])
    (
        orphan.repartition("hour_ns")
        .write.mode("errorifexists")
        .partitionBy("hour_ns")
        .parquet(f"{store}/data/c-000000000002-deadbeef")
    )
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == before

    # the replayed batch now merges for real
    b1 = [(99, BASE + 2_000_000, "click", 50.0)]
    merge_into_manifest_store(spark, _delta(spark, b1).localCheckpoint(), store, ["event_type"])
    want = _totals(
        R.rollup_events(_events(spark, b0 + b1), R.MINUTE_NS, ["event_type"], "value")
    )
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want
    # vacuum reclaims the orphan (numbered <= newest kept commit)
    removed = vacuum_manifest_store(spark, store, keep_manifests=2)
    assert removed >= 1
    assert not os.path.exists(f"{store}/data/c-000000000002-deadbeef")
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want


def test_stream_rollup_manifest_exactly_once_and_restart(spark, tmp_path):
    """The streaming twin end-to-end: availableNow drain folds every
    micro-batch; totals match the batch rollup; a restart on the same
    checkpoint (replay) changes nothing — the batch watermark rides the
    manifest, so there is no write-then-mark window at all."""
    feed = tmp_path / "feed"
    feed.mkdir()
    all_rows = []
    for b in range(3):
        rows = [
            (100 * b + i, BASE + b * HOUR_US + i * 60_000_000, "click", float(i))
            for i in range(5)
        ]
        all_rows += rows
        with open(feed / f"b{b}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(
                    ("event_id", "ts_us", "event_type", "value"), r))) + "\n")
        os.utime(feed / f"b{b}.jsonl", (time.time() + b, time.time() + b))

    store, ckpt = str(tmp_path / "mstream"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )

    def run():
        q = stream_to_rollup_manifest(
            stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
            trigger_available_now=True,
        )
        assert q.awaitTermination(600)

    run()
    want = _totals(
        R.rollup_events(_events(spark, all_rows), R.MINUTE_NS, ["event_type"], "value")
    )
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want
    n_before = _latest_manifest(spark, store)["n"]
    assert manifest_last_batch(spark, store, ckpt) is not None
    run()  # restart, same checkpoint: no new commits, same totals
    assert _latest_manifest(spark, store)["n"] == n_before
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want
    # direct double-apply of an old batch id: skipped by the watermark
    last = manifest_last_batch(spark, store, ckpt)
    assert last is not None and last >= 0


def test_stream_hll_manifest_counts_distinct_and_replays(spark, tmp_path):
    """The HLL twin over the same commit primitive (part_col="day"):
    per-day distinct estimates from the manifest store match the batch
    sketch over all replayed events, late registers fold by MAX, and a
    restart on the same checkpoint is a no-op (watermark rides the
    manifest)."""
    from traceframe_spark.operators import sketch
    from traceframe_spark.streaming.manifest_store import stream_to_hll_manifest

    DAY_US = 86_400_000_000
    feed = tmp_path / "hllfeed"
    feed.mkdir()
    all_rows = []
    for b in range(3):
        rows = [
            (i, BASE + (i % 2) * DAY_US + b * 60_000_000, "u", float(i))
            for i in range(50 * b, 50 * b + 40)
        ]
        all_rows += rows
        with open(feed / f"b{b}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(
                    ("event_id", "ts_us", "event_type", "value"), r))) + "\n")
        os.utime(feed / f"b{b}.jsonl", (time.time() + b, time.time() + b))

    store, ckpt = str(tmp_path / "hllm"), str(tmp_path / "hllckpt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )

    def run():
        q = stream_to_hll_manifest(
            stream, store, ckpt, "event_id", trigger_available_now=True
        )
        assert q.awaitTermination(600)

    run()
    got = {
        r["day"]: r["est"]
        for r in sketch.hll_estimate_by(
            read_manifest_store(spark, store), ["day"]
        ).collect()
    }
    batch = _events(spark, all_rows).select(
        F.expr("ts div 86400000000000").alias("day"),
        *[F.col(c) for c in ("event_id",)],
    )
    want = {
        r["day"]: r["est"]
        for r in sketch.hll_estimate_by(
            batch.select(
                "day",
                sketch.hll_bucket_rho(F.col("event_id"), 10)[0].alias("bucket"),
                sketch.hll_bucket_rho(F.col("event_id"), 10)[1].alias("rho"),
            )
            .groupBy("day", "bucket")
            .agg(F.max("rho").alias("rho_max")),
            ["day"],
        ).collect()
    }
    assert got == want and len(got) == 2
    n_before = _latest_manifest(spark, store)["n"]
    run()  # replay: no new commits
    assert _latest_manifest(spark, store)["n"] == n_before


def test_time_travel_reads_pin_past_versions(spark, tmp_path):
    """read_manifest_store(version=n) reproduces commit n exactly while
    the store keeps ingesting — immutable data dirs make every
    surviving manifest a full consistent snapshot. Vacuumed versions
    fail loudly with the grace-window hint; surviving ones still read."""
    store = str(tmp_path / "tt")
    seen = {}
    for k in range(1, 5):
        merge_into_manifest_store(
            spark,
            _delta(spark, [(k, BASE + k * 1_000_000, "click", float(k))]).localCheckpoint(),
            store,
            ["event_type"],
        )
        seen[k] = _totals(read_manifest_store(spark, store).drop("hour_ns"))
    for k in range(1, 5):  # every version still reads back exactly
        assert _totals(read_manifest_store(spark, store, version=k).drop("hour_ns")) == seen[k]
    assert seen[1] != seen[4]  # the store really did change under the pins
    vacuum_manifest_store(spark, store, keep_manifests=2)
    assert _totals(read_manifest_store(spark, store, version=4).drop("hour_ns")) == seen[4]
    assert _totals(read_manifest_store(spark, store, version=3).drop("hour_ns")) == seen[3]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_manifest_store(spark, store, version=1)


@pytest.mark.volume
def test_manifest_randomized_crash_replay_equivalence(spark, tmp_path, monkeypatch):
    """Adversarial robustness pin: a seeded random schedule of folds
    where any batch may CRASH before its manifest publish (data
    directory written, commit invisible) and any published batch may be
    REPLAYED (at-least-once). After draining with the fold-loop's
    watermark discipline, the store must equal the one-shot batch
    rollup of every event — no loss from crashes, no double count from
    replays — across multiple random schedules."""
    import random

    from traceframe_spark.streaming import manifest_store as M

    real_publish = M._write_manifest

    for trial in range(3):
        rng = random.Random(100 + trial)
        store = str(tmp_path / f"rc{trial}")
        ckpt = f"ckpt-rc-{trial}"
        all_rows, batches = [], []
        eid = 0
        for b in range(6):
            rows = []
            for _ in range(rng.randint(1, 5)):
                rows.append(
                    (eid, BASE + rng.randint(0, 2) * HOUR_US + rng.randint(0, 59) * 60_000_000,
                     rng.choice(["click", "view"]), float(rng.randint(1, 9)))
                )
                eid += 1
            batches.append(rows)
            all_rows += rows

        def fold(bid, rows):
            last = manifest_last_batch(spark, store, ckpt)
            if last is not None and bid <= last:
                return  # the stream fn's watermark skip
            merge_into_manifest_store(
                spark, _delta(spark, rows).localCheckpoint(), store,
                ["event_type"], checkpoint=ckpt, batch_id=bid,
            )

        for bid, rows in enumerate(batches):
            if rng.random() < 0.4:
                # crash BEFORE the publish: data lands, commit doesn't
                def boom(*a, **kw):
                    raise IOError("injected crash before manifest publish")

                monkeypatch.setattr(M, "_write_manifest", boom)
                try:
                    with pytest.raises(IOError, match="injected crash"):
                        fold(bid, rows)
                finally:
                    monkeypatch.setattr(M, "_write_manifest", real_publish)
            fold(bid, rows)  # the replay (or the first clean apply)
            if rng.random() < 0.4:
                fold(bid, rows)  # at-least-once replay of a SUCCESSFUL batch

        want = _totals(
            R.rollup_events(_events(spark, all_rows), R.MINUTE_NS, ["event_type"], "value")
        )
        got = _totals(read_manifest_store(spark, store).drop("hour_ns"))
        assert got == want, f"trial {trial}"


def test_second_writer_commit_collision_fails_loudly(spark, tmp_path):
    """Single-writer store: if a racing writer published commit n
    between this writer's manifest read and its publish, the publish
    must raise (its .tmp never becomes the live manifest) rather than
    silently clobber or interleave pointers. Simulated at the publish
    primitive: two publishes of the same counter."""
    from traceframe_spark.streaming.manifest_store import _write_manifest

    store = str(tmp_path / "twowriter")
    merge_into_manifest_store(
        spark, _delta(spark, [(0, BASE, "click", 1.0)]).localCheckpoint(),
        store, ["event_type"],
    )
    man = dict(_latest_manifest(spark, store))
    man["n"] = 2
    _write_manifest(spark, store, man)  # the racing writer wins commit 2
    with pytest.raises(IOError, match="second writer"):
        _write_manifest(spark, store, man)  # this writer must fail loudly
    # the store still reads as the racing writer's committed state
    assert _latest_manifest(spark, store)["n"] == 2


def test_vacuum_keeps_grace_versions(spark, tmp_path):
    """vacuum keeps the newest K manifests and every directory they
    reference; older manifests and unreferenced dirs go; the store
    reads the same after."""
    store = str(tmp_path / "vac")
    for k in range(4):
        merge_into_manifest_store(
            spark,
            _delta(spark, [(k, BASE + k * 1_000_000, "click", float(k))]).localCheckpoint(),
            store,
            ["event_type"],
        )
    want = _totals(read_manifest_store(spark, store).drop("hour_ns"))
    removed = vacuum_manifest_store(spark, store, keep_manifests=2)
    assert removed >= 1
    manifests = sorted(
        n for n in os.listdir(f"{store}/_manifests")
        if n.startswith("m-") and n.endswith(".json")  # skip local-FS .crc sidecars
    )
    assert len(manifests) == 2
    assert _totals(read_manifest_store(spark, store).drop("hour_ns")) == want
    with pytest.raises(ValueError):
        vacuum_manifest_store(spark, store, keep_manifests=0)


def test_writer_lease_tripwire(spark, tmp_path):
    """The best-effort lease: a second writer fails LOUDLY naming the
    holder while the lease is live; an expired lease is reclaimed; a
    released lease frees the store; release with a stale token is a
    no-op that never unguards the current holder."""
    from traceframe_spark.streaming.manifest_store import (
        acquire_writer_lease,
        release_writer_lease,
        renew_writer_lease,
    )

    store = str(tmp_path / "leased")
    os.makedirs(store)
    tok = acquire_writer_lease(spark, store, owner="writer-a", ttl_s=900)
    with pytest.raises(IOError, match="held by 'writer-a'"):
        acquire_writer_lease(spark, store, owner="writer-b", ttl_s=900)
    # renewal keeps the same token current
    renew_writer_lease(spark, store, tok)
    with pytest.raises(IOError, match="held by"):
        acquire_writer_lease(spark, store, owner="writer-b", ttl_s=900)
    # stale-token release is a no-op: the holder stays guarded
    release_writer_lease(spark, store, "not-the-token")
    with pytest.raises(IOError, match="held by"):
        acquire_writer_lease(spark, store, owner="writer-b")
    # real release frees the store
    release_writer_lease(spark, store, tok)
    tok_b = acquire_writer_lease(spark, store, owner="writer-b", ttl_s=1)
    # the old holder's renew now fails loudly instead of writing on
    with pytest.raises(IOError, match="no longer current"):
        renew_writer_lease(spark, store, tok)
    # expiry: ttl_s=1 lease is reclaimable after it lapses
    time.sleep(1.2)
    tok_c = acquire_writer_lease(spark, store, owner="writer-c", ttl_s=900)
    assert tok_c != tok_b
    release_writer_lease(spark, store, tok_c)


def test_acquire_readback_detects_lost_reclaim_race(spark, tmp_path, monkeypatch):
    """After writing its lease, the acquirer re-reads the file and must
    fail unless ITS token survived — the delete-after-create
    interleaving (another writer's late delete destroys our fresh
    lease, then its create replaces it) is detected at acquire time
    instead of both writers proceeding. Simulated by making the
    read-back see an intruder's lease."""
    from traceframe_spark.streaming import manifest_store as MS

    store = str(tmp_path / "leased_race")
    os.makedirs(store)
    real_read = MS._read_small

    def intruded(spark_, full_path):
        if full_path.endswith("_lease.json"):
            return json.dumps(
                {"token": "intruder", "owner": "writer-b",
                 "acquired": time.time(), "ttl_s": 900}
            )
        return real_read(spark_, full_path)

    monkeypatch.setattr(MS, "_read_small", intruded)
    with pytest.raises(IOError, match="reclaim race"):
        MS.acquire_writer_lease(spark, store, owner="writer-a")


def test_renew_lost_create_window_raises_lease_lost(spark, tmp_path, monkeypatch):
    """renew's delete-then-recreate window: if a concurrent acquire
    lands between them, the re-create fails — and must surface as the
    documented lease-lost IOError, not a raw JVM exception (pre-fix the
    create failure propagated as Py4JJavaError). Simulated by making
    the delete a no-op so the file 'reappears' for the create."""
    from traceframe_spark.streaming import manifest_store as MS

    store = str(tmp_path / "leased_window")
    os.makedirs(store)
    tok = MS.acquire_writer_lease(spark, store, owner="writer-a")
    real_fs_path = MS._fs_path

    class _NoDelete:
        def __init__(self, fs):
            self._fs = fs

        def delete(self, p, recursive):
            return True  # the window: the file survives our delete

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(spark_, full_path):
        fs, p = real_fs_path(spark_, full_path)
        if full_path.endswith("_lease.json"):
            return _NoDelete(fs), p
        return fs, p

    monkeypatch.setattr(MS, "_fs_path", patched)
    with pytest.raises(IOError, match="no longer current"):
        MS.renew_writer_lease(spark, store, tok)
    monkeypatch.setattr(MS, "_fs_path", real_fs_path)
    MS.release_writer_lease(spark, store, tok)


def test_stream_rollup_manifest_lease_contract(spark, tmp_path):
    """lease=True self-enforces the single-writer contract on the
    rollup twin: a stream against a store whose lease is held fails AT
    START naming the holder; a normal run acquires, folds, and releases
    on termination; an expired (crashed-holder) lease is reclaimed at
    the next start."""
    from traceframe_spark.streaming import manifest_store as MS

    feed = tmp_path / "lease_feed"
    feed.mkdir()
    rows = [(i, BASE + i * 60_000_000, "click", float(i)) for i in range(5)]
    with open(feed / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(dict(zip(
                ("event_id", "ts_us", "event_type", "value"), r))) + "\n")
    store, ckpt = str(tmp_path / "lease_store"), str(tmp_path / "lease_ckpt")
    os.makedirs(store)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .withColumn("ts", F.col("ts_us") * 1000)
    )

    def run():
        q = stream_to_rollup_manifest(
            stream, store, ckpt, R.MINUTE_NS, ["event_type"], "value",
            lease=True, trigger_available_now=True,
        )
        assert q.awaitTermination(600)

    # a held lease refuses the stream AT START, naming the holder
    held = MS.acquire_writer_lease(spark, store, owner="other-writer")
    with pytest.raises(IOError, match="held by 'other-writer'"):
        run()
    MS.release_writer_lease(spark, store, held)

    run()
    assert read_manifest_store(spark, store).count() > 0
    # released on termination (listener fires async: poll briefly)
    for _ in range(60):
        if not os.path.exists(f"{store}/_lease.json"):
            break
        time.sleep(0.5)
    assert not os.path.exists(f"{store}/_lease.json")

    # crashed holder: an EXPIRED lease on disk is reclaimed at start
    with open(f"{store}/_lease.json", "w") as f:
        json.dump({"owner": "crashed", "pid": 0, "token": "t0",
                   "acquired": time.time() - 10_000, "ttl_s": 1}, f)
    run()  # restart on the same checkpoint: reclaim + no-op replay
    for _ in range(60):
        if not os.path.exists(f"{store}/_lease.json"):
            break
        time.sleep(0.5)
    assert not os.path.exists(f"{store}/_lease.json")


def test_compact_corpus_store_bin_packing(spark, tmp_path):
    """compact_corpus_store: 9 one-dir batches at bin_size=4 pack into
    bin dirs + the partial tail; rows byte-identical; per-value reads
    still return exactly that value's rows (the manifest's value->bin
    map + the physical partition column); second call is a no-op (the
    packed bins are skipped); a later batch re-opens only its own bin."""
    p = str(tmp_path / "corpus_bins")
    for b in range(9):
        df = spark.createDataFrame(
            [(b * 10 + i, f"doc{b}-{i}") for i in range(3)],
            "doc_id long, text string",
        )
        commit_merged_parts(
            df.withColumn("ingest_batch", F.lit(b)), p, "ingest_batch",
            shuffle=False,
        )
    before = sorted(
        (r["doc_id"], r["text"], r["ingest_batch"])
        for r in read_manifest_store(spark, p).collect()
    )
    assert len(set(_latest_manifest(spark, p)["parts"].values())) == 9
    assert compact_corpus_store(spark, p, bin_size=4) == 2  # bins 0-3, 4-7
    man = _latest_manifest(spark, p)
    dirs = set(man["parts"].values())
    assert len(dirs) == 3  # bin0, bin1, live tail 8
    after = sorted(
        (r["doc_id"], r["text"], r["ingest_batch"])
        for r in read_manifest_store(spark, p).collect()
    )
    assert after == before
    one = _read_parts(spark, p, man, ["5"])
    assert sorted(r["doc_id"] for r in one.collect()) == [50, 51, 52]
    assert compact_corpus_store(spark, p, bin_size=4) == 0  # already packed
    # a new batch lands in bin 2; only that bin rewrites next time
    df = spark.createDataFrame([(90, "doc9-0")], "doc_id long, text string")
    commit_merged_parts(
        df.withColumn("ingest_batch", F.lit(9)), p, "ingest_batch", shuffle=False
    )
    assert compact_corpus_store(spark, p, bin_size=4) == 1  # bin 2 only
    man3 = _latest_manifest(spark, p)
    assert len(set(man3["parts"].values())) == 3  # three full-ish bins
    allrows = sorted(
        r["doc_id"] for r in read_manifest_store(spark, p).collect()
    )
    assert allrows == sorted([b * 10 + i for b in range(9) for i in range(3)] + [90])
