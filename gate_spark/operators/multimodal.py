"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched pandas UDFs.

The Spark side is fully real — schemas, ``mapInPandas`` batch shape,
partition sizing, metadata propagation — while the actual media codecs
are STUBBED (this environment has no image/audio libraries): decode
raises ``NotImplementedError`` unless ``fake=True``, which substitutes
a deterministic content-hash-seeded fake so the pipeline is testable
end-to-end.

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


def _decode_image(payload: bytes, fake: bool):
    """STUB: real deployments plug PIL/turbojpeg here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library not present in this"
            " environment; pass fake=True for the deterministic test codec"
        )
    # deterministic fake: pixels seeded by the content hash
    h = hashlib.sha1(payload or b"").digest()
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
