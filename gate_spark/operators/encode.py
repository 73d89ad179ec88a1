"""Embedding computation helper — the reference's ``compute_embeddings``
(gate/summarize.py:11-46: row-wise CLIP encode of text, or of images
loaded from path/URL) re-expressed as an Arrow-batched ``mapInPandas``
with a per-executor model instance.

The model itself is pluggable: pass ``encoder_factory`` returning a
callable ``list[str] -> np.ndarray`` (e.g. a sentence-transformers
model loaded once per executor — NOT per row, NOT per batch). Without
one, the deterministic hash-seeded stub encoder keeps the pipeline
testable in model-free environments; it preserves the contract
(fixed dim, unit-norm float32, equal text -> equal vector).

Out of the north-rule critical path (SURVEY.md §2.5) but part of the
reference's public API surface.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stub_encoder(dim: int = 32) -> Callable[[list], np.ndarray]:
    """Deterministic stand-in for a text/image embedding model:
    sha1-seeded unit vectors (equal input => equal embedding)."""

    def encode(texts: list) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha1(str(t).encode("utf-8", "ignore")).digest()[:4], "big"
            )
            v = np.random.RandomState(seed).standard_normal(dim).astype(np.float32)
            out[i] = v / max(float(np.linalg.norm(v)), 1e-12)
        return out

    return encode


def compute_embeddings(
    df: DataFrame,
    column: str,
    *,
    dim: int = 32,
    encoder_factory: Callable[[], Callable[[list], np.ndarray]] | None = None,
    output_col: str | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Append ``{column}_embedding`` (array<float>) computed by the
    encoder over Arrow batches (reference: gate/summarize.py:11-46;
    per-row ``pd.Series.apply`` there — vectorized batches here).

    The encoder is constructed once per Python worker (inside the
    iterator closure), so model load cost amortizes over the worker's
    whole partition stream.
    """
    out_name = output_col or f"{column}_embedding"
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_name, T.ArrayType(T.FloatType()))]
    )
    factory = encoder_factory or (lambda: stub_encoder(dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = factory()  # once per worker
        for pdf in batches:
            vals = pdf[column].astype(str).tolist()
            emb = encoder(vals)
            pdf = pdf.copy()
            pdf[out_name] = [row.tolist() for row in np.asarray(emb, dtype=np.float32)]
            yield pdf

    return df.mapInPandas(run, schema)
