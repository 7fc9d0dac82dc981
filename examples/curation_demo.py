"""End-to-end training-data curation tour on the synthetic corpus.

Run: python examples/curation_demo.py [sf_dir]

The pipeline a 100 TB pretraining corpus goes through, on the driver
testdata: profile → quality/language gate → PII scrub → exact +
near-duplicate removal → sequence packing → deterministic shard export.
Every step is a lazy DataFrame transform; the only driver-side data are
the tiny per-partition offsets in pack_sequences and this demo's show().
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import traceframe_spark as tfs
from traceframe_spark import sinks
from traceframe_spark.operators import dedup, text
from traceframe_spark.operators.profile import column_profile


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = tfs.get_spark(app_name="curation-demo", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 1. one-pass profile: what does the corpus look like?
    print("\n== column profile ==")
    column_profile(docs).filter(F.col("column").isin("doc_id", "text")).show(12, truncate=False)

    # 2. per-document signals, computed once, filtered on declaratively
    sig = docs.select(
        "doc_id",
        "text",
        text.lang_id(F.col("text")).alias("lang"),
        text.quality_score(F.col("text")).alias("quality"),
        text.repetition_ratio(F.col("text")).alias("repetition"),
        text.token_count(F.col("text")).alias("n_tokens"),
    )
    gated = sig.filter(
        (F.col("quality") >= 0.5) & (F.col("repetition") <= 0.5) & (F.col("lang") != "und")
    )
    n1 = gated.count()
    print(f"quality/lang/repetition gate: {n0} -> {n1}")

    # 3. PII scrub (counts first, then redact in place)
    pii = gated.select(F.sum(text.pii_counts(F.col("text"))["email"]).alias("emails")).first()
    scrubbed = gated.withColumn("text", text.redact_pii(F.col("text")))
    print(f"pii: {pii['emails']} emails redacted")

    # 4. dedup: exact content hash, then MinHash-LSH near-dups
    exact = dedup.exact_dedup(scrubbed, ["text"], "doc_id")
    n2 = exact.count()
    near_pairs = dedup.minhash_dedup_pairs(exact, "doc_id", "text", threshold=0.9)
    drop = near_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = exact.join(drop, "doc_id", "left_anti")
    n3 = kept.count()
    print(f"dedup: {n1} -> {n2} (exact) -> {n3} (near-dup, keep lowest id per pair)")

    # 5. pack into fixed-token training sequences
    packed = text.pack_sequences(kept, budget=512)
    seqs = packed.agg(F.max("seq_id")).first()[0] + 1
    toks = packed.agg(F.sum("n_tokens")).first()[0]
    print(f"packing: {toks} tokens -> {seqs} sequences of 512")

    # 6. deterministic shard export for the dataloader
    out = tempfile.mkdtemp(prefix="curated_shards_")
    sinks.write_training_shards(
        kept.join(packed.select("doc_id", "seq_id"), "doc_id"),
        out,
        n_shards=4,
        shuffle_key="doc_id",
        mode="overwrite",
    )
    back = spark.read.parquet(out)
    print(f"shards: {back.count()} rows across 4 files at {out}")
    spark.stop()


if __name__ == "__main__":
    main()
