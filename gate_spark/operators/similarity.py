"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an IVF
(inverted-file) variant as the scale path: vectors are assigned to the
nearest of C coarse centroids (trained on a driver-side sample), the
query probes only the ``nprobe`` nearest cells, and the candidate set
shrinks by ~C/nprobe. All distance math is Catalyst ``zip_with`` /
``aggregate`` expressions in double precision — no Python in the hot
path; the centroid table is broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (matches a SQL
    oracle's list_sum(list_transform(...)) fold exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cosine,
    rank), rank 1..k, self-match excluded, ties broken by neighbor id.

    The query side is broadcast (queries are the small side by
    construction); the corpus is scanned ONCE regardless of query
    count. Top-k per query uses a window over the (|queries| x |corpus|)
    score table — at scale, prefer many small query batches.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame, vec_col: str, num_cells: int, sample_rows: int = 20000, seed: int = 42
) -> np.ndarray:
    """Coarse centroids from a driver-side k-means over a bounded
    sample (sampling is distributed; the fit is metadata-scale)."""
    n = corpus.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = np.array(
        corpus.select(vec_col).sample(frac, seed=seed).limit(sample_rows).collect()
    ).reshape(-1, len(corpus.select(vec_col).first()[0]))
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(num_cells, len(sample)), replace=False)]
    for _ in range(10):  # Lloyd iterations on the sample
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cents)):
            pts = sample[assign == j]
            if len(pts):
                cents[j] = pts.mean(0)
    return cents


def _nearest_cells(vec: Column, centroids: np.ndarray, nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids — a codegen'd
    expression tree over the (broadcast-as-literals) centroid matrix."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(v)) for v in centroids[j]]),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(j).alias("cell"),
            )
            for j in range(len(centroids))
        ]
    )
    return F.transform(
        F.slice(F.array_sort(dists), 1, nprobe), lambda s: s["cell"]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF cells: corpus rows are joined
    only against queries probing their cell. Same output schema as
    :func:`cosine_topk`."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, corpus_vec, num_cells)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("_cv"),
        _nearest_cells(F.col(corpus_vec), centroids, 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.explode(_nearest_cells(F.col(query_vec), centroids, nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
