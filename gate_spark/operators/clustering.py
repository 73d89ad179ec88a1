"""Column-clustering kernel (reference: gate/drift.py:505-596).

Groups correlated columns before drift scoring: blended similarity =
0.25 * cosine(name embeddings) + 0.75 * cosine(column-stat vectors)
(gate/drift.py:552-554), cluster count from a PCA explained-variance
elbow (gate/drift.py:556-566), average-linkage agglomerative clustering
on the similarity matrix — reproducing the reference's convention of
passing a *similarity* where a distance is expected
(gate/drift.py:568-573).

The reference embeds column names with a SentenceTransformer
(clip-ViT-B-32, gate/drift.py:543-546); model downloads are not
sandbox-safe, so the default embedder is a deterministic hashed
character-n-gram encoder with the same interface — pluggable via
``name_embedder`` for parity runs with the real model.

All inputs here are metadata-scale (rows = user-table columns), so this
is driver-side numpy by design.
"""

from __future__ import annotations

import hashlib
import typing

import numpy as np
import pandas as pd

from gate_spark import kernels

NAME_WEIGHT = 0.25  # gate/drift.py:552-554
VALUE_WEIGHT = 0.75
PCA_THRESHOLD = 0.95  # gate/drift.py:562
EMBED_DIM = 64


def hashed_name_embedder(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic char-3-gram hashing embedder: a stand-in for the
    reference's sentence-transformer that preserves the property
    'similar names -> similar vectors' without a model download."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        s = f"^^{t.lower()}$$"
        for j in range(len(s) - 2):
            gram = s[j : j + 3]
            h = int.from_bytes(hashlib.md5(gram.encode()).digest()[:8], "little")
            out[i, h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out


def compute_clusters(
    normalized: pd.DataFrame,
    partition_key: str,
    string_columns: list[str],
    float_columns: list[str],
    int_columns: list[str],
    embedding_columns: list[str],
    name_embedder: typing.Callable[[list[str]], np.ndarray] | None = None,
) -> pd.DataFrame:
    """(column, cluster) mapping (reference: gate/drift.py:505-596)."""
    from gate_spark.operators.drift import name_to_ec

    column_stats = normalized.pivot_table(
        index="column", columns=[partition_key, "statistic"], values="value"
    ).fillna(0.0)

    column_names = column_stats.index.tolist()
    types = {c: "string" for c in string_columns}
    types.update({c: "float" for c in float_columns})
    types.update({c: "int" for c in int_columns})
    emb_dims = [
        c for c in column_names if name_to_ec(c, embedding_columns) in embedding_columns
    ]
    for c in emb_dims:
        column_names.remove(c)

    embed = name_embedder or hashed_name_embedder
    name_vectors = embed(
        [f"{c} is of type {types.get(c, 'unknown')}" for c in column_names]
    )
    name_sim = kernels.cosine_similarity_matrix(name_vectors)
    value_sim = kernels.cosine_similarity_matrix(
        column_stats[column_stats.index.isin(column_names)].values
    )
    similarity = NAME_WEIGHT * name_sim + VALUE_WEIGHT * value_sim

    n_clusters = kernels.pca_elbow_k(similarity, PCA_THRESHOLD)
    labels = kernels.agglomerative_average(similarity, n_clusters)

    clusters = {column_names[i]: int(lbl) for i, lbl in enumerate(labels)}
    max_label = int(labels.max()) if len(labels) else -1
    # each embedding column's dimensions form their own cluster
    # (gate/drift.py:581-587)
    for i, ec in enumerate(embedding_columns):
        for name in column_stats.index.tolist():
            if name_to_ec(name, embedding_columns) == ec:
                clusters[name] = max_label + i + 1

    return (
        pd.DataFrame.from_dict(clusters, orient="index", columns=["cluster"])
        .reset_index()
        .rename(columns={"index": "column"})
    )
