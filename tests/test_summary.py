"""Summarize correctness — cell-exact assertions mirroring the
reference's tests/test_summary.py plus DuckDB differentials."""

import math

import duckdb
import numpy as np
import pytest

from gate_spark import GATE_STATISTICS, summarize

F32 = np.float32


def _rows(summary, partition=None):
    pdf = summary.value(partition)
    return {r["column"]: r for _, r in pdf.iterrows()}


def test_summarize_tiny_exact(tiny_df):
    """Exact float32 values from the reference fixture
    (reference tests/test_summary.py:19-52, FIXTURES.md F2)."""
    s = summarize(
        tiny_df,
        columns=["string_col", "int_col", "float_col"],
        partition_key="grp",
        distinct_mode="exact",
        quantile_mode="nearest",
    )
    pdf = s.value()
    assert list(pdf.columns) == ["grp", "column"] + GATE_STATISTICS
    assert len(pdf) == 3
    rows = _rows(s)

    f = rows["float_col"]
    assert f["coverage"] == F32(1.0)
    assert f["mean"] == F32(0.1)
    assert f["p50"] == F32(0.1)
    assert f["p95"] == F32(0.2)
    assert math.isnan(f["num_unique_values"]) and math.isnan(f["occurrence_ratio"])

    i = rows["int_col"]
    assert i["coverage"] == F32(2 / 3)
    assert i["mean"] == F32(0.5)
    assert i["p50"] == F32(1.0)  # nearest-rank: round_half_up(0.5*(2-1)) = idx 1
    assert i["p95"] == F32(1.0)
    assert i["num_unique_values"] == F32(2.0)
    assert i["occurrence_ratio"] == F32(0.5)

    st = rows["string_col"]
    assert st["coverage"] == F32(1.0)
    assert st["num_unique_values"] == F32(2.0)
    assert st["occurrence_ratio"] == F32(2 / 3)
    assert math.isnan(st["mean"]) and math.isnan(st["p50"]) and math.isnan(st["p95"])


def test_reserved_partition_key(tiny_df):
    with pytest.raises(ValueError):
        summarize(tiny_df.withColumnRenamed("grp", "group"),
                  columns=["int_col"], partition_key="group")


def test_missing_columns(tiny_df):
    with pytest.raises(ValueError):
        summarize(tiny_df, columns=["nope"], partition_key="grp")
    with pytest.raises(ValueError):
        summarize(tiny_df, columns=["int_col"], partition_key="missing_key")
    with pytest.raises(ValueError):
        summarize(tiny_df, partition_key="grp")


def test_previous_schema_inheritance(tiny_df, tiny_df_2):
    """reference tests/test_summary.py:57-65."""
    s = summarize(tiny_df, columns=["string_col", "int_col", "float_col"],
                  partition_key="grp")
    s2 = summarize(tiny_df, previous=[s])
    assert set(s2.column_types) == set(s.column_types)
    with pytest.raises(ValueError):
        summarize(tiny_df_2, previous=[s])


def test_multi_partition_and_extras(small_df):
    s = summarize(
        small_df,
        columns=["string_col", "int_col", "float_col"],
        partition_key="grp",
        extras=True,
        distinct_mode="exact",
        quantile_mode="nearest",
    )
    pdf = s.value()
    assert sorted(pdf["grp"].unique()) == list("ABCDE")
    assert len(pdf) == 15
    # coverage + null_fraction = 1 everywhere they're both defined
    both = pdf.dropna(subset=["null_fraction"])
    assert np.allclose(both["coverage"] + both["null_fraction"], 1.0, atol=1e-6)
    # count present for all columns
    assert (pdf["count"] >= 0).all()


def test_bool_and_array_columns(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "p": ["x", "x", "y", "y"],
            "flag": [True, False, True, True],
            "tokens": [[1, 2, 3], [4, 5], [6], None],
        }
    )
    df = spark.createDataFrame(pdf)
    s = summarize(df, columns=["flag", "tokens"], partition_key="p",
                  distinct_mode="exact", quantile_mode="nearest")
    rows = {(r["p"], r["column"]): r for _, r in s.value().iterrows()}
    # bool treated as tinyint (gate/summary.py:188-191)
    assert rows[("x", "flag")]["mean"] == F32(0.5)
    assert rows[("y", "flag")]["mean"] == F32(1.0)
    # token arrays summarized over size(tokens)
    assert rows[("x", "tokens")]["mean"] == F32(2.5)
    assert rows[("y", "tokens")]["coverage"] == F32(0.5)
    assert rows[("y", "tokens")]["p50"] == F32(1.0)


def test_differential_against_duckdb(documents):
    """Pin semantics against an independent engine on real parquet:
    coverage / mean / exact distinct / occurrence_ratio / linear-interp
    quantiles must match DuckDB on sf0.001 documents."""
    s = summarize(
        documents,
        columns=["lang", "n_chars"],
        partition_key="source",
        distinct_mode="exact",
        quantile_mode="linear",
    )
    got = {
        (r["source"], r["column"]): r for _, r in s.value().iterrows()
    }
    con = duckdb.connect()
    exp = con.sql(
        """
        SELECT source,
               avg(CASE WHEN n_chars IS NOT NULL THEN 1.0 ELSE 0.0 END) AS coverage,
               avg(n_chars) AS mean,
               count(DISTINCT n_chars) AS ndv,
               quantile_cont(n_chars, 0.5) AS p50,
               quantile_cont(n_chars, 0.95) AS p95,
               count(DISTINCT lang) AS lang_ndv,
               (SELECT max(c)::DOUBLE / sum(c) FROM (
                   SELECT count(*) AS c FROM read_parquet('/root/testdata/sf0.001/documents.parquet') d2
                   WHERE d2.source = d.source AND lang IS NOT NULL GROUP BY lang)) AS lang_occ
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet') d
        GROUP BY source
        """
    ).fetchall()
    for source, coverage, mean, ndv, p50, p95, lang_ndv, lang_occ in exp:
        r = got[(source, "n_chars")]
        assert r["coverage"] == pytest.approx(coverage, rel=1e-6)
        assert r["mean"] == pytest.approx(mean, rel=1e-6)
        assert r["num_unique_values"] == ndv
        assert r["p50"] == pytest.approx(np.float32(p50), rel=1e-6)
        assert r["p95"] == pytest.approx(np.float32(p95), rel=1e-6)
        rl = got[(source, "lang")]
        assert rl["num_unique_values"] == lang_ndv
        assert rl["occurrence_ratio"] == pytest.approx(np.float32(lang_occ), rel=1e-6)


def test_approx_modes_close_to_exact(documents):
    """Scale-default sketch statistics stay within tolerance of exact."""
    approx = summarize(documents, columns=["n_chars"], partition_key="source").value()
    exact = summarize(
        documents, columns=["n_chars"], partition_key="source",
        distinct_mode="exact", quantile_mode="nearest",
    ).value()
    m = approx.merge(exact, on=["source", "column"], suffixes=("_a", "_e"))
    assert (
        (m["num_unique_values_a"] - m["num_unique_values_e"]).abs()
        <= 0.1 * m["num_unique_values_e"] + 2
    ).all()
    assert (m["p50_a"] - m["p50_e"]).abs().max() <= 0.05 * m["p50_e"].abs().max() + 1


def test_quantile_columns_subset(spark, small_df):
    """quantile_columns restricts p50/p95 to the named columns (id-like
    high-cardinality columns skip the percentile digest entirely)."""
    from gate_spark.operators.summarize import summarize

    s = summarize(
        small_df, columns=["int_col", "float_col"], partition_key="grp",
        quantile_mode="approx", quantile_columns=["float_col"],
    )
    pdf = s.df.toPandas()
    assert pdf[pdf["column"] == "int_col"]["p50"].isna().all()
    assert pdf[pdf["column"] == "float_col"]["p50"].notna().all()
    # the digest agg must not even appear in the plan for int_col
    plan = s.df._jdf.queryExecution().analyzed().toString()
    assert plan.count("percentile_approx") == 1
    s.unpersist()


def test_occ_value_modes_agree(documents):
    """occ_value_mode="hash" (64-bit value fingerprints in the
    occurrence shuffle, the pipeline scale default) must yield the same
    summary values as "exact" — counts per fingerprint equal counts per
    value up to 2^-64 collisions — and under distinct_mode="exact" the
    num_unique_values column must be IDENTICAL by construction, because
    exact-distinct columns are always counted over exact values
    (_occ_distinct_side; ADVICE round 4)."""
    kw = dict(columns=["lang", "doc_id", "n_chars"], partition_key="source")
    for dmode in ("approx", "exact"):
        a = summarize(documents, distinct_mode=dmode, occ_value_mode="hash", **kw)
        b = summarize(documents, distinct_mode=dmode, occ_value_mode="exact", **kw)
        pa = a.value().sort_values(["source", "column"]).reset_index(drop=True)
        pb = b.value().sort_values(["source", "column"]).reset_index(drop=True)
        assert (pa["occurrence_ratio"].fillna(-1) == pb["occurrence_ratio"].fillna(-1)).all(), dmode
        assert (pa["num_unique_values"].fillna(-1) == pb["num_unique_values"].fillna(-1)).all(), dmode
        a.unpersist(); b.unpersist()


def test_shared_occ_quantile_pass_matches_split_paths(documents):
    """Columns needing BOTH occurrence_ratio and nearest-rank quantiles
    ride one shared value-keyed pass when distinct_mode != "exact"
    (r6: the windowed quantile counts frame IS the occ cascade's first
    level). Every statistic must equal the split-path formulation that
    distinct_mode="exact" still uses — same fixture, cell-identical."""
    kw = dict(
        columns=["lang", "doc_id", "n_chars"],
        partition_key="source",
        quantile_mode="nearest",
        extras=True,
    )
    a = summarize(documents, distinct_mode="approx", **kw)  # shared pass
    b = summarize(documents, distinct_mode="exact", **kw)  # split paths
    pa = a.value().sort_values(["source", "column"]).reset_index(drop=True)
    pb = b.value().sort_values(["source", "column"]).reset_index(drop=True)
    for c in ["occurrence_ratio", "p50", "p95", "coverage", "mean",
              "count", "max", "min", "null_fraction", "stddev"]:
        assert (pa[c].fillna(-1) == pb[c].fillna(-1)).all(), c
    a.unpersist()
    b.unpersist()
