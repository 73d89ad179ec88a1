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
import pandas as pd
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
    # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2 as matmuls: the distance
    # matrix is (sample x cells), never the (sample x cells x dim)
    # broadcast tensor (which is 100s of GB at the C ~ sqrt(N) cells a
    # real index needs).
    s2 = (sample * sample).sum(axis=1)[:, None]
    for _ in range(10):  # Lloyd iterations on the sample
        d = s2 - 2.0 * (sample @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = d.argmin(1)
        for j in range(len(cents)):
            pts = sample[assign == j]
            if len(pts):
                cents[j] = pts.mean(0)
    return cents


def _nearest_cells_udf(spark, centroids: np.ndarray, nprobe: int):
    """Vectorized (Arrow-batched) nearest-cell assignment against a
    broadcast centroid matrix. Replaces the old literal-expression-tree
    formulation: the plan no longer carries O(num_cells x dim) literals,
    so ``num_cells`` can reach the ~sqrt(N) thousands a real IVF index
    needs — the matrix ships once per executor via a Spark broadcast
    and each Arrow batch is one (batch x dim) @ (dim x cells) matmul.

    Determinism: float64 math, stable argsort, ties broken by lower
    cell id — reproducible by a SQL oracle's ORDER BY dist, cell.
    """
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    take = max(1, nprobe)

    @pandas_udf("array<int>")
    def nearest(v: pd.Series) -> pd.Series:
        cents = bc.value
        x = np.array(v.tolist(), dtype=np.float64)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; the ||x||^2 term is
        # constant per row and cannot change the argsort -> omit it.
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :take].astype("int32")
        return pd.Series([list(r) for r in idx])

    return nearest


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
    centroids: np.ndarray | DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF cells: corpus rows are joined
    only against queries probing their cell. Same output schema as
    :func:`cosine_topk`.

    ``centroids`` may be a (cells x dim) numpy array, a DataFrame with
    columns (cell:int, vec:array) — collected driver-side in cell
    order; centroid tables are metadata-scale by construction — or
    None to train k-means on a corpus sample. Cell ids are row indices
    0..C-1.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(corpus, corpus_vec, num_cells)
    elif isinstance(centroids, DataFrame):
        rows = centroids.orderBy("cell").collect()
        centroids = np.array([r["vec"] for r in rows], dtype=np.float64)
    corpus_cell = _nearest_cells_udf(spark, centroids, 1)
    query_cells = _nearest_cells_udf(spark, centroids, nprobe)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("_cv"),
        F.element_at(corpus_cell(F.col(corpus_vec)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.explode(query_cells(F.col(query_vec))).alias("cell"),
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
