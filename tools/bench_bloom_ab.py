"""A/B the ngram_novelty Bloom prefilter at 1x vs the 100x copy — the
SCALING.md evidence row for WHERE the prefilter pays (r07 shipped the
knob unmeasured; this records both factors so the registry query can
gate it by scale).

Both arms run the OPERATOR on the full corpus with the registry query's
exact split (doc_id % 10 < 3 = reference snapshot) and a noop sink, so
the comparison is plan-for-plan: the prefilter arm pays a Bloom build
(one aggregation of the reference grams to packed longs, broadcast)
plus k hash probes per gram, and in exchange the definitely-novel gram
mass skips the gram-key join; the plain arm shuffles every gram on both
sides. Answers are bit-identical by construction (Bloom miss => the
gram is guaranteed absent from the reference; false positives are
re-checked by the exact join), verified here once per corpus before
timing.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_bloom_ab.py \
      [--one /root/testdata/sf0.1] [--hundred /tmp/sparktrace_scale100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="/root/testdata/sf0.1")
    ap.add_argument("--hundred", default="/tmp/sparktrace_scale100")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from traceframe_spark.operators import text
    from traceframe_spark.plans import load_table
    from traceframe_spark.session import get_spark

    spark = get_spark(app_name="bench-bloom-ab")
    spark.range(1_000_000).select(F.sum("id")).collect()

    def novelty(sf_dir: str, prefilter: bool, split: str):
        d = load_table(spark, sf_dir, "documents")
        if split == "recrawl":
            # the registry query's split: reference and corpus drawn from
            # the same distribution -> LOW novelty (~6% of gram mass),
            # the re-crawl/mirror triage shape
            ref = d.filter(F.col("doc_id") % 10 < 3)
            corpus = d.filter(F.col("doc_id") % 10 >= 3)
        else:
            # cross-source split: half the sources are the snapshot, the
            # other half the new crawl -> HIGH novelty (~64% of gram
            # mass), the new-domain ingest shape the prefilter exists for
            src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
            ref = d.filter(src_num % 2 == 0)
            corpus = d.filter(src_num % 2 == 1)
        return text.ngram_novelty(corpus, ref, n=3, bloom_prefilter=prefilter)

    out: dict[str, dict[str, float]] = {}
    for split in ("recrawl", "cross_source"):
      for label, sf_dir in ((f"{split}_1x", args.one), (f"{split}_100x", args.hundred)):
        # answers must be bit-identical before the times mean anything
        mismatch = (
            novelty(sf_dir, True, split)
            .withColumnRenamed("n_novel", "n_novel_pf")
            .join(novelty(sf_dir, False, split), "doc_id")
            .filter(F.col("n_novel_pf") != F.col("n_novel"))
            .count()
        )
        assert mismatch == 0, f"{label}: prefilter changed {mismatch} answers"
        row = {}
        for arm, prefilter in (("plain", False), ("bloom", True)):
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                novelty(sf_dir, prefilter, split).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            row[arm] = round(best, 3)
        row["bloom_speedup"] = round(row["plain"] / row["bloom"], 2)
        out[label] = row
        print(label, row, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
