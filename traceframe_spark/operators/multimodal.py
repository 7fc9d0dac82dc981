"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partition-friendly batch iteration,
Arrow-batched Pandas exchange with bounded batch sizes — is real and
tested, and so is the PNG image path: :func:`decode_png` /
:func:`encode_png` implement the public PNG spec (8-bit grayscale / RGB
/ RGBA, all five scanline filters) on stdlib ``zlib``, so image decode
works in this runtime with no image libraries installed. Pillow, when
present, extends decode to every other raster format
(:data:`HAVE_IMAGE_CODECS`); formats that neither path can read fall
back to a clearly-fake deterministic byte-histogram
(:func:`_fake_features`) so pipelines stay runnable.

At 100 TB: binary payloads ride in parquet alongside their metadata;
``spark.sql.files.maxPartitionBytes`` bounds scan-task size, and the
decode step uses ``mapInPandas`` so each Python worker streams batches
instead of materializing a partition of images at once.
"""

from __future__ import annotations

import struct
import zlib
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

try:  # pragma: no cover - Pillow is optional; PNG works without it
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_CODECS = True
except ImportError:
    HAVE_IMAGE_CODECS = False

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color types with 8-bit samples we decode natively: code -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a uint8 array (H×W gray, H×W×3 RGB, or H×W×4 RGBA) as a
    non-interlaced 8-bit PNG (filter 0 scanlines, one IDAT). Pure
    stdlib — the deterministic inverse of :func:`decode_png`."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4 per the spec §9)."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(c, stride):
                line[x] = (int(line[x]) + int(line[x - c])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                a = int(line[x - c]) if x >= c else 0
                line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = line
        prev = line
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an H×W×C uint8 array
    (C ∈ {1, 2, 3, 4} for gray / gray+alpha / RGB / RGBA). Pure stdlib
    implementation of the public spec; raises ``ValueError`` on
    interlaced, paletted, or 16-bit images (Pillow handles those when
    installed)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"PNG: unsupported depth={depth} color_type={color_type}"
                )
            if interlace != 0:
                raise ValueError("PNG: interlaced images unsupported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (1 + width * c):
        raise ValueError("PNG: truncated pixel data")
    return _unfilter(raw, height, width, c)


def decode_image(payload: bytes, media_type: str = "") -> np.ndarray:
    """Decode an image payload to an H×W×C uint8 array: native PNG
    decoder first (by magic bytes, works in any runtime), Pillow for
    other formats when installed, else ``NotImplementedError`` — the
    honest boundary for codecs this runtime doesn't ship."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if HAVE_IMAGE_CODECS:  # pragma: no cover - Pillow absent here
        import io

        import PIL.Image

        arr = np.asarray(PIL.Image.open(io.BytesIO(payload)))
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise NotImplementedError(
        f"no decoder for media_type={media_type!r} in this runtime "
        "(native path covers PNG; install Pillow for other formats)"
    )

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


def synthesize_png_media(df: DataFrame, id_col: str, batch_rows: int = 256) -> DataFrame:
    """Deterministic REAL-PNG media rows derived from an id column: each
    id becomes an (id%13+1) × (id%7+1) RGB image whose flattened pixel
    i holds ``(id*31 + i) % 256``, encoded through :func:`encode_png`.
    Closed-form pixels make decoded width/height/channels/pixel_sum
    independently computable by a SQL oracle — the test/bench stand-in
    for a real binary-ingest source that still exercises a REAL codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids = chunk[id_col].astype(np.int64)
                payloads = []
                for i in ids:
                    w, h = int(i % 13 + 1), int(i % 7 + 1)
                    px = ((i * 31 + np.arange(w * h * 3, dtype=np.int64)) % 256).astype(
                        np.uint8
                    ).reshape(h, w, 3)
                    payloads.append(encode_png(px))
                yield pd.DataFrame(
                    {
                        "media_id": ids.values,
                        "media_type": "image/png",
                        "payload": payloads,
                        "meta": [{} for _ in payloads],
                    }
                )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic byte-histogram stand-in for formats with no decoder
    in this runtime — clearly fake, keeps pipelines runnable end-to-end."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist, _ = np.histogram(arr % FEATURE_DIM, bins=FEATURE_DIM, range=(0, FEATURE_DIM))
    return (hist / arr.size).astype(np.float32)


def _features_of(payload: bytes, media_type: str) -> np.ndarray:
    """Feature vector for one payload: REAL pixel-value histogram (16
    bins over 0..255) when a decoder can read it, byte-histogram fake
    otherwise."""
    try:
        px = decode_image(payload, media_type)
    except (NotImplementedError, ValueError):
        return _fake_features(payload)
    flat = px.reshape(-1)
    hist, _ = np.histogram(flat, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(flat.size, 1)).astype(np.float32)


def extract_media_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``; output one feature vector per media row (real
    pixel histograms for decodable images, byte-histogram fake
    otherwise)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = [
                    _features_of(p if p is not None else b"", t)
                    for p, t in zip(chunk["payload"], chunk["media_type"])
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


DECODE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def decode_image_meta(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL image decode as a distributed step: one row per decodable
    payload with (width, height, channels, pixel_sum) read from the
    actual pixel data — the values an oracle can verify. Undecodable
    payloads yield nulls (inspect with ``width IS NULL``) rather than
    failing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = {"media_id": [], "width": [], "height": [], "channels": [], "pixel_sum": []}
                for mid, p, t in zip(chunk["media_id"], chunk["payload"], chunk["media_type"]):
                    rows["media_id"].append(mid)
                    try:
                        px = decode_image(p if p is not None else b"", t)
                        rows["width"].append(px.shape[1])
                        rows["height"].append(px.shape[0])
                        rows["channels"].append(px.shape[2])
                        rows["pixel_sum"].append(int(px.astype(np.int64).sum()))
                    except (NotImplementedError, ValueError):
                        for k in ("width", "height", "channels", "pixel_sum"):
                            rows[k].append(None)
                yield pd.DataFrame(rows)

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=DECODE_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# audio: PCM WAV codec (public RIFF/WAVE spec, stdlib-only — the audio
# counterpart of the PNG path: a REAL decoder for the one format that
# needs no external libraries)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 PCM samples as a RIFF/WAVE file. ``samples`` is
    (n,) mono or (n, channels); little-endian 16-bit, the baseline PCM
    encoding every WAV reader accepts."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # C order: frames interleave channels
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV payload to (rate, int16 array of shape
    (n_frames, channels)). Walks the RIFF chunk list properly (skips
    unknown chunks, honors the word-alignment padding byte), so files
    with LIST/INFO metadata decode too. Non-PCM encodings (float,
    a-law, ...) raise ``NotImplementedError``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV is decoded natively (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    frames = np.frombuffer(data, dtype="<i2")
    n = len(frames) // channels
    return rate, frames[: n * channels].reshape(n, channels)


def synthesize_wav_media(df: DataFrame, id_col: str, batch_rows: int = 256) -> DataFrame:
    """Deterministic REAL-WAV media rows: id i becomes (i%50+10) mono
    frames at 8 kHz where frame j holds ``(i*37 + j*11) % 4096 - 2048``
    — closed-form samples, so decoded n_frames/sample_sum/abs_sum are
    independently computable by a SQL oracle, exactly like
    :func:`synthesize_png_media` does for pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids = chunk[id_col].astype(np.int64)
                payloads = []
                for i in ids:
                    n = int(i % 50 + 10)
                    s = (int(i) * 37 + np.arange(n, dtype=np.int64) * 11) % 4096 - 2048
                    payloads.append(encode_wav(s.astype(np.int16), rate=8000))
                yield pd.DataFrame(
                    {
                        "media_id": ids.values,
                        "media_type": "audio/wav",
                        "payload": payloads,
                        "meta": [{} for _ in payloads],
                    }
                )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("sample_sum", LongType()),
        StructField("abs_sum", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def decode_audio_meta(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL audio decode as a distributed step: per decodable payload,
    (rate, channels, n_frames, sample_sum, abs_sum, zero_crossings)
    read from the actual PCM frames — integer features an oracle can
    verify. Undecodable payloads yield nulls, not batch failures.
    ``zero_crossings`` counts strict sign changes between consecutive
    frames of channel 0 (zeros carry the preceding sign), the standard
    ZCR voice/noise discriminator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = {k.name: [] for k in AUDIO_META_SCHEMA.fields}
                for mid, p in zip(chunk["media_id"], chunk["payload"]):
                    rows["media_id"].append(mid)
                    try:
                        rate, s = decode_wav(p if p is not None else b"")
                        s64 = s.astype(np.int64)
                        ch0 = s64[:, 0]
                        sign = np.sign(ch0)
                        # propagate the previous sign through zeros
                        nz = sign != 0
                        idx = np.where(nz, np.arange(len(sign)), 0)
                        np.maximum.accumulate(idx, out=idx)
                        carried = sign[idx]
                        zc = int(np.sum(carried[1:] * carried[:-1] < 0))
                        rows["rate"].append(rate)
                        rows["channels"].append(s.shape[1])
                        rows["n_frames"].append(s.shape[0])
                        rows["sample_sum"].append(int(s64.sum()))
                        rows["abs_sum"].append(int(np.abs(s64).sum()))
                        rows["zero_crossings"].append(zc)
                    except (NotImplementedError, ValueError):
                        for k in (
                            "rate", "channels", "n_frames",
                            "sample_sum", "abs_sum", "zero_crossings",
                        ):
                            rows[k].append(None)
                yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
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


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Resize one payload. Decodable images get a REAL resize —
    decode, nearest-neighbor pixel resample, PNG re-encode (output is
    always PNG, the one format every runtime here can write).
    Undecodable payloads fall back to a deterministic linear byte
    re-sample so non-image media still flows through the pipeline."""
    try:
        px = decode_image(payload)
        ys = np.linspace(0, px.shape[0] - 1, height).round().astype(np.int64)
        xs = np.linspace(0, px.shape[1] - 1, width).round().astype(np.int64)
        return encode_png(px[ys][:, xs])
    except (NotImplementedError, ValueError):
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
                    _resize_payload(p if p is not None else b"", width, height)
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


# dHash luma grid: 8 rows x 9 columns; each row's 8 horizontal
# neighbor comparisons contribute 8 bits -> a 64-bit fingerprint.
DHASH_GW = 9
DHASH_GH = 8


def _luma_plane(px: np.ndarray) -> np.ndarray:
    """H×W integer luma from a decoded H×W×C uint8 array: ITU-R BT.601
    integer weights ``(299R + 587G + 114B) // 1000`` for color images,
    the first channel verbatim for gray/gray+alpha. Pure integer
    arithmetic so an external SQL oracle reproduces every value."""
    p = px.astype(np.int64)
    if p.shape[2] >= 3:
        return (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    return p[:, :, 0]


def _dhash64(px: np.ndarray) -> int:
    """64-bit difference hash (dHash) of a decoded image: block-mean
    the luma plane onto the 8×9 grid (cell (gy,gx) averages luma rows
    ``[gy*H//8, max((gy+1)*H//8, gy*H//8+1))`` — integer floor means,
    upsampling degenerates to nearest-pixel), then bit ``gy*8+gx`` is
    set iff ``grid[gy][gx] < grid[gy][gx+1]``. Every step is integer
    and closed-form, so the whole hash replays in ANSI SQL; constant
    brightness shifts (no mod-256 wrap) preserve every comparison —
    the perceptual invariance that makes this a near-dup key rather
    than a byte hash. Returned as a SIGNED 64-bit int (bit 63 is the
    sign bit), matching Spark/DuckDB BIGINT semantics."""
    luma = _luma_plane(px)
    h, w = luma.shape
    grid = np.empty((DHASH_GH, DHASH_GW), dtype=np.int64)
    for gy in range(DHASH_GH):
        y0 = gy * h // DHASH_GH
        y1 = max((gy + 1) * h // DHASH_GH, y0 + 1)
        for gx in range(DHASH_GW):
            x0 = gx * w // DHASH_GW
            x1 = max((gx + 1) * w // DHASH_GW, x0 + 1)
            block = luma[y0:y1, x0:x1]
            grid[gy, gx] = int(block.sum()) // block.size
    fp = 0
    for gy in range(DHASH_GH):
        for gx in range(DHASH_GW - 1):
            if grid[gy, gx] < grid[gy, gx + 1]:
                fp |= 1 << (gy * 8 + gx)
    if fp >= 1 << 63:
        fp -= 1 << 64
    return fp


DHASH_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("fp", LongType())]
)


def image_dhash(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """(id, fp) perceptual fingerprints for every DECODABLE image row
    via Arrow-batched ``mapInPandas`` (:func:`_dhash64` per payload).
    Rows whose payload is null or undecodable (foreign codec, corrupt
    bytes) emit NO row — the scorer contract; left-join back for
    passthrough. The payload never shuffles: the kernel runs inside
    the scan stage and only the 16-byte (id, fp) rows move."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids, fps = [], []
                for mid, payload, mtype in zip(
                    chunk["media_id"], chunk["payload"], chunk["media_type"]
                ):
                    if payload is None:
                        continue
                    try:
                        px = decode_image(bytes(payload), mtype)
                    except (NotImplementedError, ValueError):
                        continue
                    ids.append(mid)
                    fps.append(_dhash64(px))
                yield pd.DataFrame(
                    {"id": pd.Series(ids, dtype="int64"),
                     "fp": pd.Series(fps, dtype="int64")}
                )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 10, batch_rows: int = 256
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual hash: dHash the decoded
    luma grid (:func:`image_dhash`), then the SAME pigeonhole
    block-join + exact-hamming machinery text SimHash uses
    (operators/dedup.hamming_block_pairs) — image dedup composes from
    the existing banding engine instead of a new path. Output:
    (id_a, id_b, hamming), id_a < id_b.

    100 TB shape: payloads stay in the scan stage (only 16-byte
    fingerprints shuffle); candidate cost follows 16-bit-block bucket
    occupancy exactly like text SimHash; re-encoded/brightness-shifted
    copies land at hamming ~0 while byte hashes miss them entirely —
    the reason image corpora need a perceptual tier at all."""
    from traceframe_spark.operators.dedup import (
        _unpersist_with,
        hamming_block_pairs,
    )

    fp = image_dhash(media, batch_rows=batch_rows).persist()
    return _unpersist_with(hamming_block_pairs(fp, max_hamming), fp)


# --------------------------------------------------------------- video (Y4M)

Y4M_MAGIC = b"YUV4MPEG2"
# colorspace tag -> chroma subsampling factors (sx, sy); None = no chroma.
# Plane bytes are ceil(w/sx)*ceil(h/sy) — the ceil matters for odd
# dimensions with subsampled colorspaces (a 5x3 C420 frame carries
# 3*2=6 bytes per chroma plane, not 15//4=3).
_Y4M_CHROMA = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def _y4m_chroma_bytes(width: int, height: int, colorspace: str) -> int:
    """Total chroma bytes per frame (both planes) for a colorspace."""
    sub = _Y4M_CHROMA[colorspace]
    if sub is None:
        return 0
    sx, sy = sub
    return 2 * (-(-width // sx)) * (-(-height // sy))


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "mono"
) -> bytes:
    """Encode uint8 luma frames ``(n, h, w)`` as a YUV4MPEG2 (Y4M)
    stream — the public uncompressed video interchange format
    (mjpegtools/ffmpeg): one ASCII stream header, then ``FRAME\\n`` +
    planar pixel data per frame. ``mono`` writes the Y plane only;
    chroma colorspaces write neutral (128) chroma planes."""
    f = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    if f.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = f.shape
    num, den = fps
    if colorspace not in _Y4M_CHROMA:
        raise NotImplementedError(f"unsupported Y4M colorspace C{colorspace}")
    header = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{colorspace}\n".encode()
    chroma = bytes([128]) * _y4m_chroma_bytes(w, h, colorspace)
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        if chroma:
            out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode a Y4M payload to ``(width, height, fps_num, fps_den,
    y_frames)`` with ``y_frames`` the uint8 luma planes ``(n, h, w)``
    (chroma planes are parsed past, not returned — features here are
    luma-based). Handles per-frame parameter tails (``FRAME Xfoo\\n``)
    per the spec; unknown colorspace tags raise
    ``NotImplementedError``."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = None
    num, den = 30, 1
    colorspace = "420jpeg"  # spec default when no C tag is present
    for tok in payload[len(Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            num, den = (int(x) for x in t[1:].split(":"))
        elif t.startswith("C"):
            colorspace = t[1:]
    if width is None or height is None:
        raise ValueError("Y4M header missing W or H")
    if colorspace not in _Y4M_CHROMA:
        raise NotImplementedError(f"unsupported Y4M colorspace C{colorspace}")
    y_size = width * height
    frame_size = y_size + _y4m_chroma_bytes(width, height, colorspace)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) < frame_size:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(body[:y_size], dtype=np.uint8).reshape(height, width)
        )
        pos = fnl + 1 + frame_size
    y = np.stack(frames) if frames else np.zeros((0, height, width), np.uint8)
    return width, height, num, den, y


def synthesize_y4m_media(df: DataFrame, id_col: str, batch_rows: int = 256) -> DataFrame:
    """Deterministic REAL-Y4M media rows: id i becomes ``i % 8 + 2``
    mono frames of ``(i % 6 + 4) × (i % 4 + 3)`` where pixel
    ``(f, y, x) = (i*31 + f*17 + y*7 + x*3) % 256`` — closed-form, so
    decoded sums and inter-frame motion are recomputable by a SQL
    oracle, completing the image (PNG) / audio (WAV) / video (Y4M)
    triad of real codecs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                ids = chunk[id_col].astype(np.int64)
                payloads = []
                for i in ids:
                    i = int(i)
                    n, w, h = i % 8 + 2, i % 6 + 4, i % 4 + 3
                    f = np.arange(n)[:, None, None] * 17
                    y = np.arange(h)[None, :, None] * 7
                    x = np.arange(w)[None, None, :] * 3
                    frames = ((i * 31 + f + y + x) % 256).astype(np.uint8)
                    payloads.append(encode_y4m(frames, fps=(25, 1)))
                yield pd.DataFrame(
                    {
                        "media_id": ids.values,
                        "media_type": "video/x-yuv4mpeg",
                        "payload": payloads,
                        "meta": [{} for _ in payloads],
                    }
                )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("fps_num", LongType()),
        StructField("fps_den", LongType()),
        StructField("y_sum", LongType()),
        StructField("frame0_sum", LongType()),
        StructField("motion_sum", LongType()),
    ]
)


def decode_video_meta(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL video decode as a distributed step: per decodable payload,
    geometry, frame rate, luma sum, first-frame sum, and ``motion_sum``
    = Σ|frame_t − frame_{t−1}| (total temporal activity, the feature a
    frame-sampling or scene-cut pass keys on). Undecodable payloads
    yield nulls, not batch failures."""

    cols = [f.name for f in VIDEO_META_SCHEMA.fields if f.name != "media_id"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = {k.name: [] for k in VIDEO_META_SCHEMA.fields}
                for mid, p in zip(chunk["media_id"], chunk["payload"]):
                    rows["media_id"].append(mid)
                    try:
                        w, h, num, den, yf = decode_y4m(p if p is not None else b"")
                        y64 = yf.astype(np.int64)
                        motion = (
                            int(np.abs(y64[1:] - y64[:-1]).sum()) if len(y64) > 1 else 0
                        )
                        vals = {
                            "width": w,
                            "height": h,
                            "n_frames": len(y64),
                            "fps_num": num,
                            "fps_den": den,
                            "y_sum": int(y64.sum()),
                            "frame0_sum": int(y64[0].sum()) if len(y64) else 0,
                            "motion_sum": motion,
                        }
                        for k in cols:
                            rows[k].append(vals[k])
                    except (NotImplementedError, ValueError):
                        for k in cols:
                            rows[k].append(None)
                yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_META_SCHEMA
    )


def y4m_sample_frames(media: DataFrame, every_n: int = 2, batch_rows: int = 256) -> DataFrame:
    """REAL frame sampling: decode each Y4M payload, keep every
    ``every_n``-th frame (always including frame 0), re-encode. The
    physical shape a 100 TB video-curation pass needs — pure map-side
    ``mapInPandas``, no shuffle, output payloads shrink ~1/every_n.
    Output is always mono Y4M: the luma planes are what downstream
    features consume, so chroma planes of 420/444 inputs are dropped
    at re-encode rather than resampled."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows].copy()
                out = []
                for p in chunk["payload"]:
                    try:
                        _w, _h, num, den, yf = decode_y4m(p if p is not None else b"")
                        out.append(encode_y4m(yf[::every_n], fps=(num, den)))
                    except (NotImplementedError, ValueError):
                        out.append(None)
                chunk["payload"] = out
                yield chunk

    return media.mapInPandas(run, schema=media.schema)
