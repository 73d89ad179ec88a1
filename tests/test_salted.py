"""Salted two-phase aggregation must agree with the single-phase path
on a skewed table (heavy src0 holds ~50% of rows)."""

import numpy as np
import pytest

from gate_spark import summarize
from gate_spark.datagen import token_table


@pytest.fixture(scope="module")
def skewed(spark):
    df = token_table(spark, 4000, seed=21, heavy_frac=0.5, num_partitions=8)
    return df.selectExpr("source", "n_tok", "size(tokens) as tok_len", "doc_id").cache()


def _pdf(summary):
    return (
        summary.df.toPandas()
        .sort_values(["source", "column"])
        .reset_index(drop=True)
    )


def test_salted_matches_plain_exact(skewed):
    plain = _pdf(
        summarize(
            skewed, columns=["n_tok", "tok_len", "doc_id"], partition_key="source",
            distinct_mode="exact", quantile_mode="nearest", extras=True,
        )
    )
    salted = _pdf(
        summarize(
            skewed, columns=["n_tok", "tok_len", "doc_id"], partition_key="source",
            distinct_mode="exact", quantile_mode="nearest", extras=True, skew_salt=8,
        )
    )
    assert list(plain.columns) == list(salted.columns)
    assert len(plain) == len(salted)
    for c in plain.columns[2:]:
        a = plain[c].astype(float).to_numpy()
        b = salted[c].astype(float).to_numpy()
        # mean/stddev merge via sums: float32-identical, not bit-identical
        assert np.allclose(a, b, rtol=1e-5, atol=1e-6, equal_nan=True), c


def test_salted_hll_close(skewed):
    plain = _pdf(
        summarize(skewed, columns=["doc_id"], partition_key="source",
                  distinct_mode="exact")
    )
    salted = _pdf(
        summarize(skewed, columns=["doc_id"], partition_key="source",
                  distinct_mode="approx", skew_salt=8)
    )
    exact = plain["num_unique_values"].to_numpy(dtype=float)
    est = salted["num_unique_values"].to_numpy(dtype=float)
    assert np.all(np.abs(est - exact) / np.maximum(exact, 1) < 0.1)
