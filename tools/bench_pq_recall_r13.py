"""Sampled-vs-trained PQ codebook recall (r13): price the quantizer
choice before fixing an index's books.

`pq_sample_codebooks` takes md5-bottom-16 corpus vectors as codewords —
SQL-replayable (the registry's verification default) but
quantization-weak versus Jégou et al. TPAMI 2011 §II's per-subspace
k-means, which `pq_train_codebooks` implements (Lloyd over a bounded
md5-ordered sample, seeded by the portable sample's picks).

For each variant this measures, via the REGISTERED instrument
(`ann_adc_agreement` — both argmaxes off one scored-pair table):

- recall@1 of ADC's top-1 against exact cosine's top-1 over a query
  sample, and
- the per-subspace quantization MSE over the training sample
  (driver-side numpy; the quantity Lloyd actually minimizes),

at the given sf dir. Prints one JSON line; SCALING.md's
sampled-vs-trained table cites it.

Usage: python tools/bench_pq_recall_r13.py [--sf /root/testdata/sf0.01]
       [--queries 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from traceframe_spark.operators import similarity as sim  # noqa: E402
from traceframe_spark.plans import load_table  # noqa: E402
from traceframe_spark.session import get_spark  # noqa: E402


def _mse(x: np.ndarray, cb: list[list[float]], m: int = 8) -> float:
    cbm = np.array(cb, dtype=np.float64)
    d = x.shape[1] // m
    tot = 0.0
    for s in range(m):
        sub = x[:, s * d : (s + 1) * d]
        sc = cbm[:, s * d : (s + 1) * d]
        d2 = ((sub[:, None, :] - sc[None, :, :]) ** 2).sum(axis=2)
        tot += d2.min(axis=1).sum()
    return float(tot / len(x))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    e = load_table(spark, args.sf, "embeddings").persist()
    n = e.count()
    q = e.filter(F.col("vec_id") < args.queries)

    books = {
        "sampled": sim.pq_sample_codebooks(e, "vec_id", "embedding"),
        "trained": sim.pq_train_codebooks(e, "vec_id", "embedding"),
    }
    # the MSE sample = the trained variant's own training rows
    rows = (
        e.select(
            F.md5(F.concat_ws("|", F.lit("pq"), F.col("vec_id").cast("string"))).alias("h"),
            "embedding",
        )
        .orderBy("h")
        .limit(16 * 64)
        .collect()
    )
    x = np.array([[float(v) for v in r["embedding"]] for r in rows], dtype=np.float64)

    out = {"sf": args.sf, "n_vectors": n, "n_queries": args.queries, "variants": {}}
    for name, cb in books.items():
        t0 = time.time()
        rec = (
            sim.ann_adc_agreement(e, q, "vec_id", "embedding", cb)
            .agg(F.avg("agree").alias("r"))
            .first()["r"]
        )
        out["variants"][name] = {
            "recall_at_1": round(float(rec), 4),
            "quant_mse": round(_mse(x, cb), 2),
            "sec": round(time.time() - t0, 1),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
