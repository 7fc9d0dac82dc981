"""Property suite: the PORTABLE hash families vs pure-Python hashlib
mirrors on random documents/vectors — a THIRD independent
implementation of the md5-derived contracts, complementing the DuckDB
oracles (one engine could agree with Spark by sharing a quirk; Python's
hashlib agreeing too pins the spec itself).

Mirrored here, from the operator docstrings:
- portable MinHash: h = int(md5(shingle)[:8hex], 16) mod P;
  sig[i] = min((a_i*h + b_i) mod P) with portable_family constants.
- portable SimHash: vote bit i from half-words of md5(shingle)
  (i<32 -> bits of hex[0:8]; else hex[8:16]); fp bit set iff vote>0.
- portable hyperplanes: w[i][j] = +-1 from bit 0 of md5(f"{i}_{j}")
  [:8hex]; sign bits over round-half-up 1e-6 quantized embeddings.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from traceframe_spark.operators import dedup, similarity

P = dedup.PORTABLE_P

HSET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TEXTS = st.text(
    alphabet=st.sampled_from("abcdefg hij"), min_size=0, max_size=60
)


def _py_char_shingles(t: str, n: int) -> list[str]:
    t = t.lower().strip()
    k = max(len(t) - (n - 1), 1)
    out, seen = [], set()
    for i in range(k):
        sh = t[i : i + n]
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def _py_minhash_sig(t: str, n_hashes: int, shingle_size: int) -> list[int]:
    sig = [P] * n_hashes
    fams = [dedup.portable_family(i) for i in range(n_hashes)]
    for sh in _py_char_shingles(t, shingle_size):
        h = int(hashlib.md5(sh.encode()).hexdigest()[:8], 16) % P
        for i, (a, b) in enumerate(fams):
            v = (a * h + b) % P
            if v < sig[i]:
                sig[i] = v
    return sig


def _py_simhash_fp(t: str, shingle_size: int) -> int:
    votes = [0] * 64
    for sh in _py_char_shingles(t, shingle_size):
        hx = hashlib.md5(sh.encode()).hexdigest()
        h1, h2 = int(hx[:8], 16), int(hx[8:16], 16)
        for i in range(64):
            bit = (h1 >> i) & 1 if i < 32 else (h2 >> (i - 32)) & 1
            votes[i] += bit * 2 - 1
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    # Spark longs are signed: bit 63 makes the value negative
    return fp - (1 << 64) if fp >= (1 << 63) else fp


class TestPortableHashContracts:
    @HSET
    @given(texts=st.lists(TEXTS, min_size=1, max_size=5, unique=True))
    def test_minhash_signature_matches_hashlib(self, spark, texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["id"]: list(r["sig"])
            for r in dedup.minhash_signatures(
                df, "doc_id", "text", n_hashes=16, shingle_size=5, portable=True
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_minhash_sig(t, 16, 5), (i, t)

    @HSET
    @given(texts=st.lists(TEXTS, min_size=1, max_size=5, unique=True))
    def test_simhash_fingerprint_matches_hashlib(self, spark, texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["id"]: r["fp"]
            for r in dedup.simhash_fingerprints(
                df, "doc_id", "text", shingle_size=4, portable=True
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_simhash_fp(t, 4), (i, t)

    @HSET
    @given(
        vecs=st.lists(
            st.lists(
                st.floats(-4, 4, allow_nan=False, width=32),
                min_size=8,
                max_size=8,
            ),
            min_size=1,
            max_size=4,
        )
    )
    def test_hyperplane_signature_matches_hashlib(self, spark, vecs):
        n_planes = 10
        w = similarity.portable_hyperplane_weights(n_planes, 8)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        sig_col = similarity.portable_hyperplane_signature(
            F.col("embedding"), w
        )
        got = {r["vec_id"]: r["s"] for r in df.select("vec_id", sig_col.alias("s")).collect()}
        import struct

        for i, v in enumerate(vecs):
            # mirror the float32 storage then the 1e-6 round-half-up grid
            q = [
                math.floor(struct.unpack("f", struct.pack("f", x))[0] * 1e6 + 0.5)
                for x in v
            ]
            expect = 0
            for p_i in range(n_planes):
                if sum(wj * xj for wj, xj in zip(w[p_i], q)) > 0:
                    expect |= 1 << p_i
            assert got[i] == expect, (i, v)
