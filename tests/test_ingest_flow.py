"""End-to-end INCREMENTAL ingest: the maintenance loop a 100 TB corpus
store actually runs — each arriving batch is quality-gated, exact- and
near-deduped against the STANDING corpus (never corpus-vs-itself
again), leakage-safely split, and appended. Pins that per-batch cost
follows the batch (gate = batch scan; cross-dedup = batch-vs-corpus
LSH bucket join; append = partitioned write) and that re-ingesting the
same batch is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from traceframe_spark.operators import dedup
from traceframe_spark.operators.sampling import leakage_safe_split
from traceframe_spark.operators.text import quality_gate

GOOD = (
    "the quick brown fox jumps over the lazy dog and then walks to a "
    "small house near the river where many other animals gather for "
    "food and water every single day of the year"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _ingest_batch(spark, batch, store_path, first=False):
    """One maintenance-loop turn: gate -> dedup within batch -> dedup
    against the standing store -> split -> append."""
    gated = batch.join(
        quality_gate(batch).filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    gated = dedup.exact_dedup(gated, ["text"], "doc_id")
    if not first:
        standing = spark.read.parquet(store_path)
        # exact cross-dedup on the shared content key, then near-dup subtract
        k = dedup.content_key("text")
        gated = (
            gated.withColumn("_k", k)
            .join(standing.select(k.alias("_k")).distinct(), "_k", "left_anti")
            .drop("_k")
        )
        gated = dedup.cross_near_dup_subtract(
            gated, standing, "doc_id", "text", threshold=0.7
        )
    out = leakage_safe_split(gated, {"train": 0.9, "val": 0.05, "test": 0.05})
    out.write.mode("append" if not first else "overwrite").partitionBy(
        "split"
    ).parquet(store_path)
    return out


def test_incremental_ingest_loop(spark, tmp_path):
    store = str(tmp_path / "corpus")

    batch1 = _docs(
        spark,
        [(1, GOOD), (2, GOOD.replace("fox", "wolf")), (3, "the of and")],
    )
    _ingest_batch(spark, batch1, store, first=True)
    v1 = spark.read.parquet(store)
    assert {r["doc_id"] for r in v1.collect()} == {1, 2}  # 3 failed the gate

    # batch 2: one genuinely new doc, one exact dup of doc 1, one near
    # dup of doc 1 (single-word edit), one in-batch dup pair
    new = GOOD.replace("river", "canyon").replace("fox", "bear").replace(
        "dog", "hen"
    ).replace("house", "cave").replace("animals", "people").replace(
        "water", "wine"
    ).replace("quick", "slow").replace("lazy", "busy")
    batch2 = _docs(
        spark,
        [
            (10, new),
            (11, GOOD),                      # exact dup of standing doc 1
            (12, GOOD.replace("day", "night")),  # near dup of standing doc 1
            (13, new + " extra trailing sentence for the pair"),
            (14, new + " extra trailing sentence for the pair"),  # in-batch dup
        ],
    )
    _ingest_batch(spark, batch2, store)
    v2 = spark.read.parquet(store)
    ids = {r["doc_id"] for r in v2.collect()}
    assert 11 not in ids  # exact cross-dup dropped
    assert 12 not in ids  # near cross-dup dropped
    assert 10 in ids and 13 in ids and 14 not in ids  # in-batch dedup kept min id

    # re-ingesting the SAME batch adds nothing (idempotent maintenance)
    _ingest_batch(spark, batch2, store)
    v3 = spark.read.parquet(store)
    assert v3.count() == v2.count()

    # split column survives as a partition and duplicates share splits
    assert set(v3.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
