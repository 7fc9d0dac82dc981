"""Exact-ntile vs sampled-cutoff perplexity bucketing at volume (r14):
the measurement behind making the sampled cut the production default
of `text.perplexity_buckets` (the r13 verdict's #1 ask).

Both methods score the SAME 500k-document corpus against the same
stored bigram LM (trained once on a bounded slice), so the timed
difference is the CUT itself:

- exact  : ntile over Window.partitionBy(lang) — each language's
           whole (id, score) set sorts in ONE task; with
           lang_col=None the entire corpus lands on a single task
           (the engine's former scale-killer, kept as the
           oracle-replayable twin behind an explicit opt-in);
- sampled: md5 bottom-k cutoff derivation (two-pass prefix
           refinement, k=4096) + broadcast comparison cut — no task
           ever sorts more than ~k rows regardless of skew.

Reports, per method and per cut key (global / per-language): wall
time and the largest single-task sort the plan implies (rows under
the worst window key), plus the per-doc band agreement between the
two cuts on the bounded slice (via the registered
`perplexity_bucket_agreement` instrument). Prints one JSON line;
SCALING.md's r14 skew table cites it.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_ppl_cut_r14.py \
    [--sf /tmp/sparktrace_scale100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from traceframe_spark.operators import text as T  # noqa: E402
from traceframe_spark.plans import load_table  # noqa: E402
from traceframe_spark.plans.catalog import tmp_store  # noqa: E402
from traceframe_spark.session import get_spark  # noqa: E402

MOD = 1_000_000_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparktrace_scale100")
    args = ap.parse_args()

    spark = get_spark(
        app_name="ppl-cut-r14", master="local[16]", shuffle_partitions=64
    )
    d = load_table(spark, args.sf, "documents")
    n = d.count()
    lm = tmp_store("ppl_cut_lm_") + "/lm"
    T.write_bigram_lm(d.filter(F.col("doc_id") % MOD < 300), lm)

    lang_counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = {
        "sf": args.sf,
        "n_docs": n,
        "worst_window_rows": {
            "exact_global": n,                  # one task sorts everything
            "exact_per_lang": max(lang_counts.values()),
            "sampled": 4096,                    # bounded by sample_k
        },
        "timings": {},
    }

    def run(name, **kw):
        t0 = time.time()
        T.perplexity_buckets(d, lm, **kw).write.format("noop").mode(
            "overwrite"
        ).save()
        out["timings"][name] = round(time.time() - t0, 1)

    run("sampled_global")  # the production default, no opt-in needed
    run("sampled_per_lang", lang_col="lang")
    run("exact_per_lang", lang_col="lang", method="exact")
    run("exact_global", method="exact", allow_exact_global=True)

    # band fidelity on the bounded slice, via the registered instrument
    sl = d.filter(F.col("doc_id") % MOD < 300)
    ag = (
        T.perplexity_bucket_agreement(sl, lm, lang_col="lang")
        .agg(F.avg("agree").alias("a"), F.count("*").alias("n"))
        .first()
    )
    out["slice_agreement"] = {
        "n_docs": int(ag["n"]),
        "agree_frac": round(float(ag["a"]), 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
