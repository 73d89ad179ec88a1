"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched pandas UDFs.

The Spark side is fully real — schemas, ``mapInPandas`` batch shape,
partition sizing, metadata propagation. Image decode is REAL for the
dependency-free formats (uncompressed 24-bit BMP, binary PPM/PGM —
pure numpy, see ``decode_bmp``/``decode_pnm``); compressed formats
(JPEG/PNG) and audio/video codecs are STUBBED (this environment has no
media libraries): they raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic content-hash-seeded
fake so the pipeline is testable end-to-end.

Design for 100 TB of media:
- binary payloads never cross a shuffle: every transform here is a
  narrow ``mapInPandas`` over the scan, and downstream aggregations
  carry only extracted features;
- batches are Arrow-sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — set it low (e.g. 64) for multi-MB payloads so a batch fits in
  executor memory;
- feature schemas are explicit StructTypes (no schema inference).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
        T.StructField("mean_luma", T.FloatType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


# ITU-R BT.601 luma weights (R, G, B)
_LUMA_RGB = np.array([0.299, 0.587, 0.114])


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, grayscale) decode to a 2D uint8
    luma array — pure numpy, no image library. Handles whitespace +
    ``#`` comments in the header; maxval must be <= 255."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload: magic {magic!r}")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    i += 1  # exactly one whitespace byte separates header from pixels
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=i).reshape(
        h, w, ch
    )
    if ch == 3:
        return (px.astype(np.float64) @ _LUMA_RGB).astype(np.uint8)
    return px[:, :, 0].copy()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit Windows BMP decode to a 2D uint8 luma array
    — pure numpy. Rows are 4-byte padded and stored bottom-up (top-down
    when the header height is negative); pixels are BGR."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP supported (got {bpp} bpp,"
            f" compression {compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset
    ).reshape(h, row_bytes)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return (px.astype(np.float64) @ _LUMA_RGB[::-1]).astype(np.uint8)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 payload (test/datagen helper)."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bpp bottom-up BMP."""
    import struct

    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + body.tobytes()


def _decode_image(payload: bytes, fake: bool):
    """Dispatch on magic bytes: BMP and binary PNM decode natively;
    anything else needs a real image library (PIL/turbojpeg plug in
    here) or ``fake=True`` for the deterministic test codec."""
    data = bytes(payload)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if not fake:
        raise NotImplementedError(
            "only uncompressed BMP and binary PPM/PGM decode natively;"
            " other formats require an image library not present in this"
            " environment — pass fake=True for the deterministic test codec"
        )
    # deterministic fake: pixels seeded by the content hash
    h = hashlib.sha1(data or b"").digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(8, 8), dtype=np.uint8)


def image_features(
    df: DataFrame,
    *,
    fake: bool = False,
    embedding_dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + feature-extract images via an Arrow-batched
    ``mapInPandas``: (media_id, n_bytes, sha1, mean_luma, embedding).

    The UDF sees only (id, payload) — column pruning keeps other
    metadata out of the Python worker."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    out.append((mid, None, None, None, None))
                    continue
                data = bytes(payload)
                img = _decode_image(data, fake)
                luma = float(img.mean())
                h = hashlib.sha1(data)
                rng = np.random.RandomState(int.from_bytes(h.digest()[:4], "big"))
                emb = rng.rand(embedding_dim).astype(np.float32)
                out.append((mid, len(data), h.hexdigest(), luma, emb.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "sha1", "mean_luma", "embedding"]
            )

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    fake: bool = False,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame_payload). Codec STUBBED — the
    fake path emits hash-derived frame stamps so batch shapes and the
    row-expansion topology are real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf[id_col], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a media library not present"
                        " in this environment; pass fake=True"
                    )
                digest = hashlib.sha1(bytes(payload)).digest()
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows.append((mid, i, ts, digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_payload"]
            )

    return df.select(id_col, "payload", "duration_ms").mapInPandas(sample, out_schema)


def media_summary(df: DataFrame, partition_key: str = "kind") -> DataFrame:
    """Payload-size/metadata summary per media kind — pure Catalyst,
    no decode: (kind, n, null_payloads, total_bytes, avg_bytes)."""
    return df.groupBy(partition_key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("payload").isNull().cast("long")).alias("null_payloads"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
        F.avg(F.length("payload").cast("double")).alias("avg_bytes"),
    )
