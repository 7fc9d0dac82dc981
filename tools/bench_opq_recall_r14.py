"""OPQ rotation recall at fixed code budget (r14): extend the r13
sampled-vs-trained quantizer pricing with Ge et al. CVPR 2013's
orthogonal rotation — the standard next recall lever once books are
trained.

Three variants at the SAME code budget (16 codewords, m=8, 8-byte
codes), all measured via the REGISTERED instrument
(`ann_adc_agreement`, both argmaxes off one scored-pair table):

- sampled   : md5-bottom-16 corpus vectors as codewords (the
              SQL-replayable registry default)
- trained   : per-subspace Lloyd k-means (`pq_train_codebooks`)
- trained+opq: the same Lloyd books trained in OPQ-rotated space
              (`opq_train_rotation` — eigenvalue allocation), LUT and
              codes rotated with the same matrix, exact side raw

plus each variant's quantization MSE over the training sample (the
quantity the rotation + Lloyd minimize; rotated variants measure in
rotated space, which is the space their codes live in — rotation
preserves L2, so the numbers are comparable).

Prints one JSON line; SCALING.md's r14 OPQ table cites it.

Usage: python tools/bench_opq_recall_r14.py [--sf /root/testdata/sf0.01]
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

    rot = sim.opq_train_rotation(e, "vec_id", "embedding")
    variants = {
        "sampled": (sim.pq_sample_codebooks(e, "vec_id", "embedding"), None),
        "trained": (sim.pq_train_codebooks(e, "vec_id", "embedding"), None),
        "trained_opq": (
            sim.pq_train_codebooks(e, "vec_id", "embedding", rotation=rot),
            rot,
        ),
    }
    # the MSE sample = the trained variants' own training rows
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
    rmat = np.array(rot, dtype=np.float64)

    out = {"sf": args.sf, "n_vectors": n, "n_queries": args.queries, "variants": {}}
    for name, (cb, rotation) in variants.items():
        t0 = time.time()
        rec = (
            sim.ann_adc_agreement(e, q, "vec_id", "embedding", cb, rotation=rotation)
            .agg(F.avg("agree").alias("r"))
            .first()["r"]
        )
        xm = x @ rmat.T if rotation is not None else x
        out["variants"][name] = {
            "recall_at_1": round(float(rec), 4),
            "quant_mse": round(_mse(xm, cb), 2),
            "sec": round(time.time() - t0, 1),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
