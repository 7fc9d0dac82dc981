"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch iteration, Arrow-batched Pandas exchange with bounded batch sizes —
while the actual codec calls are STUBBED behind
:data:`HAVE_IMAGE_CODECS` (the runtime here ships no image/audio
libraries). Swap ``_decode_stub`` for a real PIL/ffmpeg call and nothing
else changes.

At 100 TB: binary payloads ride in parquet alongside their metadata;
``spark.sql.files.maxPartitionBytes`` bounds scan-task size, and the
decode step uses ``mapInPandas`` so each Python worker streams batches
instead of materializing a partition of images at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - codecs are absent in this runtime by design
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_CODECS = True
except ImportError:
    HAVE_IMAGE_CODECS = False

# Canonical multimodal column group: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image/jpeg, audio/wav, ...
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic synthetic media rows derived from a text column —
    test/bench stand-in for a real binary-ingest source."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("width"), (F.length(F.col(text_col)) % 640).cast("string"),
            F.lit("height"), F.lit("480"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': byte-histogram features. A real
    implementation decodes pixels/samples here; everything around it
    (batching, schema, partitioning) is production-shaped."""
    if HAVE_IMAGE_CODECS:
        raise NotImplementedError(
            "real image decode not wired in this runtime; see module docstring"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist, _ = np.histogram(arr % FEATURE_DIM, bins=FEATURE_DIM, range=(0, FEATURE_DIM))
    return (hist / arr.size).astype(np.float32)


def extract_media_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``; output one feature vector per media row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = [
                    _decode_stub(p if p is not None else b"") for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "media_type": chunk["media_type"].values,
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk["payload"]],
                        "features": [f.tolist() for f in feats],
                    }
                )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plan-side frame sampling for video payloads: derive frame indices
    from metadata without touching payload bytes (pruned scan), then a
    decode step would explode selected frames. Returns (media_id,
    frame_idx) pairs."""
    # try_cast: meta is free-form map<string,string>; a non-numeric
    # n_frames must sample zero frames, not kill the job under ANSI
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").try_cast("long"), F.lit(0)
    )
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx")
    ).filter(F.col("frame_idx") < n_frames)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake 'resize': linear byte re-sample to a size
    proportional to the target area. A real implementation decodes,
    resamples pixels, and re-encodes here (PIL ``Image.resize`` /
    ffmpeg scale filter); batching and schema around it are final."""
    if HAVE_IMAGE_CODECS:
        raise NotImplementedError(
            "real image resize not wired in this runtime; see module docstring"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    target = max(width * height // 64, 1)
    if arr.size == 0:
        return bytes(target)
    idx = np.linspace(0, arr.size - 1, target).astype(np.int64)
    return arr[idx].tobytes()


def resize_media(
    media: DataFrame, width: int, height: int, batch_rows: int = 256
) -> DataFrame:
    """Resize media payloads via Arrow-batched ``mapInPandas``; output
    rows keep MEDIA_SCHEMA with the payload replaced and ``meta``
    width/height updated — so resize composes with every other media
    op (feature extraction, frame sampling, parquet sinks) unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                payloads = [
                    _resize_stub(p if p is not None else b"", width, height)
                    for p in chunk["payload"]
                ]
                metas = []
                for m in chunk["meta"]:
                    m = dict(m) if m is not None else {}
                    m["width"] = str(width)
                    m["height"] = str(height)
                    metas.append(m)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "media_type": chunk["media_type"].values,
                        "payload": payloads,
                        "meta": metas,
                    }
                )

    return media.select("media_id", "media_type", "payload", "meta").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload content (lowest media_id
    survives). One shuffle keyed on the 64-bit payload hash for
    distribution, with the PAYLOAD ITSELF in the window key so a hash
    collision can never delete a distinct payload — "exact" means byte
    equality, the hash is only the shuffle key. Null payloads pass
    through undeduplicated (no bytes, nothing to be a duplicate of)."""
    from pyspark.sql.window import Window

    hashed = media.withColumn("_ph", F.xxhash64(F.col("payload")))
    w = Window.partitionBy("_ph", "payload").orderBy(F.col("media_id").asc())
    deduped = (
        hashed.filter(F.col("payload").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ph")
    )
    return deduped.unionByName(
        media.filter(F.col("payload").isNull())
    )


def media_near_dup_pairs(
    media: DataFrame, threshold: float = 0.98, bands: int = 4
) -> DataFrame:
    """Near-duplicate media pairs: decoded feature vectors (the stub's
    byte histogram; a real deployment's image/audio embedding) feed the
    same hyperplane-LSH bucket + exact-cosine machinery embedding dedup
    uses — perceptual dedup composes from the existing pieces instead of
    a new engine path. Output: (id_a, id_b, cosine)."""
    from traceframe_spark.operators.similarity import embedding_near_dup_pairs

    feats = extract_media_features(media).select("media_id", "features")
    return embedding_near_dup_pairs(
        feats, "media_id", "features",
        threshold=threshold, dim=FEATURE_DIM, bands=bands,
    )
