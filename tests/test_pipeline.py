"""One-scan validate_tokens pipeline: results must equal the
standalone operators it fuses."""

import pytest
from pyspark.sql import functions as F

from gate_spark import (
    MembershipConstraint,
    TokenArrayEquality,
    UniqueConstraint,
    VocabBoundsConstraint,
    evaluate_constraints,
    summarize,
    validate_tokens,
)
from gate_spark.datagen import token_table

DOMAIN = tuple(f"src{i}" for i in range(20))


@pytest.fixture(scope="module")
def tokens(spark):
    return token_table(
        spark, 3000, seed=13,
        dup_frac=0.01, mismatch_frac=0.02, oov_frac=0.01, baddomain_frac=0.01,
        num_partitions=8,
    ).cache()


@pytest.fixture(scope="module")
def result(tokens):
    r = validate_tokens(tokens, domain=DOMAIN, distinct_mode="exact",
                        quantile_mode="nearest")
    yield r
    r.unpersist()


def _sorted(pdf, cols):
    return pdf.sort_values(cols).reset_index(drop=True)


def test_verdicts_match_standalone(tokens, result):
    standalone, _ = evaluate_constraints(
        tokens,
        "source",
        [
            UniqueConstraint(name="unique_doc_id", column="doc_id"),
            TokenArrayEquality(),
            MembershipConstraint(name="source_membership", column="source", domain=DOMAIN),
            VocabBoundsConstraint(name="vocab_bounds", tokens_col="tokens", lo=0, hi=50257),
        ],
        key_column="doc_id",
    )
    a = _sorted(
        result.verdicts.toPandas()
        .replace({"constraint": {"token_array_equality": "eq"}}),
        ["partition", "constraint"],
    )
    b = standalone.toPandas()
    b["constraint"] = b["constraint"].replace(
        {TokenArrayEquality().name: "eq"}
    )
    b = _sorted(b, ["partition", "constraint"])
    assert (
        a[["partition", "violation_count", "row_count", "passed"]].values.tolist()
        == b[["partition", "violation_count", "row_count", "passed"]].values.tolist()
    )


def test_summary_matches_standalone(tokens, result):
    s = summarize(
        tokens, columns=["n_tok", "tokens", "doc_id"], partition_key="source",
        distinct_mode="exact", quantile_mode="nearest", extras=True,
        quantile_columns=["n_tok", "tokens"],  # pipeline skips id quantiles
    )
    a = _sorted(result.summary.df.toPandas(), ["source", "column"])
    b = _sorted(s.df.toPandas(), ["source", "column"])
    assert a.equals(b)


def test_violation_rows_and_drift_shape(tokens, result):
    v = result.violations.toPandas()
    total = result.verdicts.toPandas()["violation_count"].sum()
    assert len(v) == total
    d = result.drift.toPandas()
    assert set(d.columns) == {"partition", "score", "score_percentile", "is_drifted"}
    assert len(d) == tokens.select("source").distinct().count()
    psi = result.distribution.toPandas()
    assert len(psi) == len(d)


def test_uniqueness_join_plan_shape(tokens, result):
    """The scale claim, pinned on the physical plan: below the counted
    dup threshold the verdicts/violations actions use a broadcast-hash
    join of the dup set (no full-table shuffle); forcing the fallback
    switches to one shared persisted shuffle join."""
    # the dupes join lives in the violations frame (the ONE full-frame
    # action; verdicts now derive from its persisted output)
    plan = result.violations._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert result.flagged_cache is not None  # cached dup set handle

    fallback = validate_tokens(
        tokens, domain=DOMAIN, compute_drift=False,
        broadcast_dupes_threshold=0,
    )
    # no forced hint in the fallback: AQE is free to pick the strategy
    # (on tiny test data it converts to broadcast at runtime); the
    # structural guarantee is the SHARED persisted join result
    assert fallback.flagged_cache is not None
    assert fallback.flagged_cache.storageLevel.useMemory  # persisted
    assert fallback.verdicts.count() > 0
    fallback.unpersist()


def test_driver_drift_matches_spark_formulation(tokens, result):
    """drift_scores_driver (pipeline fast path) must equal the Spark
    drift_scores formulation value-for-value."""
    import numpy as np

    from gate_spark.operators.drift import drift_scores

    a = _sorted(result.drift.toPandas(), ["partition"])
    b = _sorted(drift_scores(result.summary, k=3).toPandas(), ["partition"])
    assert a["partition"].tolist() == b["partition"].tolist()
    assert np.allclose(a["score"], b["score"], rtol=1e-9, equal_nan=True)
    assert np.allclose(
        a["score_percentile"], b["score_percentile"], rtol=1e-12
    )
    assert a["is_drifted"].tolist() == b["is_drifted"].tolist()


def test_metadata_frames_are_jvm_local_scans(result):
    """No per-pass metadata-scale frame may be Python-RDD-backed:
    a `Scan ExistingRDD` over parallelized pickles schedules Python
    workers whose creation serializes under the PythonWorkerFactory
    monitor (jstack-profiled at 37-45 s per force at 64M rows). The
    verdicts / distribution / drift outputs must be LocalTableScan —
    serialized once driver-side, scanned pure-JVM."""
    for name in ("verdicts", "distribution", "drift"):
        frame = getattr(result, name)
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" in plan, (name, plan)
        assert "ExistingRDD" not in plan, (name, plan)
