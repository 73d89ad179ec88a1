"""Constraint suite: injected-violation counts on the deterministic
token table (north-rule suite: uniqueness, token-array referential
integrity, membership, vocab bounds)."""

import pytest
from pyspark.sql import functions as F

from gate_spark import (
    ExpressionConstraint,
    MembershipConstraint,
    NotNullConstraint,
    TokenArrayEquality,
    UniqueConstraint,
    VocabBoundsConstraint,
    evaluate_constraints,
)
from gate_spark.datagen import token_table


@pytest.fixture(scope="module")
def tokens(spark):
    return token_table(
        spark,
        4000,
        seed=7,
        dup_frac=0.02,
        mismatch_frac=0.03,
        oov_frac=0.01,
        baddomain_frac=0.015,
        num_partitions=8,
    ).cache()


CONSTRAINTS = [
    UniqueConstraint(name="unique_doc_id", column="doc_id"),
    TokenArrayEquality(),
    MembershipConstraint(
        name="source_membership",
        column="source",
        domain=tuple(f"src{i}" for i in range(20)),
    ),
    VocabBoundsConstraint(name="vocab_bounds", tokens_col="tokens", lo=0, hi=50257),
    NotNullConstraint(name="tokens_not_null", column="tokens"),
]


def test_verdict_counts_match_injection(tokens):
    verdicts, violations = evaluate_constraints(
        tokens, "source", CONSTRAINTS, key_column="doc_id"
    )
    v = verdicts.toPandas()
    totals = v.groupby("constraint")[["violation_count", "row_count"]].sum()
    n = totals["row_count"].iloc[0]
    assert n == 4000 * len(CONSTRAINTS) / len(CONSTRAINTS)

    # injected fractions are deterministic-uniform; expect within 2x band
    frac = {
        c: totals.loc[c, "violation_count"] / 4000
        for c in totals.index
    }
    assert 0.01 < frac["unique_doc_id"] < 0.06  # dup rows count twice (both rows flagged)
    assert 0.015 < frac[TokenArrayEquality().name] < 0.06
    assert 0.007 < frac["source_membership"] < 0.03
    assert 0.005 < frac["vocab_bounds"] < 0.02
    assert frac["tokens_not_null"] == 0.0

    # violations rows == sum of violation counts
    assert violations.count() == int(totals["violation_count"].sum())


def test_violation_rows_are_real_violations(tokens):
    _, violations = evaluate_constraints(
        tokens, "source", CONSTRAINTS, key_column="doc_id"
    )
    sample = violations.where(
        F.col("constraint") == TokenArrayEquality().name
    ).limit(5).toPandas()
    bad_ids = set(sample["key"])
    if bad_ids:
        rows = tokens.where(F.col("doc_id").isin(list(bad_ids))).collect()
        assert all(r["n_tok"] != len(r["tokens"]) for r in rows)


def test_passed_flag_consistency(tokens):
    verdicts, _ = evaluate_constraints(tokens, "source", CONSTRAINTS)
    bad = verdicts.where(
        (F.col("passed") & (F.col("violation_count") > 0))
        | (~F.col("passed") & (F.col("violation_count") == 0))
    )
    assert bad.count() == 0


def test_unique_constraint_tolerates_reserved_user_columns(spark):
    # a user table that already has columns named like the join's old
    # internals must not break or be silently dropped (ADVICE round 4)
    df = spark.createDataFrame(
        [("a", "p", 1, ["x"]), ("a", "p", 2, ["y"]), ("b", "q", 3, ["z"])],
        "doc_id string, part string, _kh int, _dup_keys array<string>",
    )
    verdicts, violations = evaluate_constraints(
        df, "part", [UniqueConstraint(name="u", column="doc_id")], key_column="doc_id"
    )
    v = {r["partition"]: r["violation_count"] for r in verdicts.collect()}
    assert v == {"p": 2, "q": 0}
    # user columns survive prepare() untouched
    prepared = UniqueConstraint(name="u", column="doc_id").prepare(df)
    assert "_kh" in prepared.columns and "_dup_keys" in prepared.columns
    assert prepared.where(F.col("_kh").isNull()).count() == 0


def test_vocab_bounds_minmax_matches_exists(spark):
    # the codegen'd array_min/array_max formulation must agree with the
    # element-wise exists() semantics on null-free token arrays,
    # including empty and NULL arrays (VERDICT round 4 item 2)
    rows = [
        ("ok", [0, 5, 10]),
        ("low", [-1, 5]),
        ("high", [5, 99]),
        ("both", [-3, 120]),
        ("edge_lo", [0]),
        ("edge_hi", [49]),  # hi=50 exclusive
        ("at_hi", [50]),
        ("empty", []),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    c = VocabBoundsConstraint(name="vb", tokens_col="tokens", lo=0, hi=50)
    got = {
        r["doc_id"]: r["_f"]
        for r in df.select("doc_id", c.flag(df).alias("_f")).collect()
    }
    exists_ref = {
        r["doc_id"]: r["_f"]
        for r in df.select(
            "doc_id",
            F.coalesce(
                F.exists("tokens", lambda x: (x < F.lit(0)) | (x >= F.lit(50))),
                F.lit(False),
            ).alias("_f"),
        ).collect()
    }
    assert got == exists_ref
    assert got["low"] and got["high"] and got["both"] and got["at_hi"]
    assert not (got["ok"] or got["edge_lo"] or got["edge_hi"] or got["empty"] or got["null"])


def test_max_violation_examples_cap(tokens):
    _, violations = evaluate_constraints(
        tokens, "source", CONSTRAINTS, key_column="doc_id", max_violation_examples=3
    )
    counts = (
        violations.groupBy("partition", "constraint").count().toPandas()["count"]
    )
    assert counts.max() <= 3
