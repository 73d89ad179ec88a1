"""Declarative constraint suite — the north-rule extension.

The reference validates only its own arguments (gate/summarize.py:94-107);
data constraints (uniqueness, referential integrity, domain membership,
vocab bounds — BASELINE.json north_star) are new here. Each constraint
emits:

- materialized violation rows ``(partition, constraint, key, detail)``
- a per-partition verdict row ``(partition, constraint,
  violation_count, row_count, passed)``

Design for 100 TB:
- row-local predicates (n_tok == size(tokens), vocab bounds, not-null)
  are pure Catalyst filters — no shuffle, whole-stage codegen, pushed
  past the scan where possible;
- uniqueness is a groupBy on the key with map-side partial counts (AQE
  splits skewed reducers);
- membership is a broadcast anti-join against the (small) domain;
- all constraints for one table are evaluated in ONE pass: a single
  projection computes every violation flag, one aggregation produces
  every verdict, and violations are a filter on the flagged rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """Base: a named row-level predicate; True/null-pass = OK."""

    name: str

    def flag(self, df: DataFrame) -> Column:
        """Boolean Column: True where the row VIOLATES the constraint.
        Must be row-local (no aggregation); non-row-local constraints
        override prepare() to attach the flag via a join."""
        raise NotImplementedError

    def prepare(self, df: DataFrame) -> DataFrame:
        """Hook for constraints that need a join/aggregation to make the
        flag row-local. Default: passthrough."""
        return df

    def detail(self, df: DataFrame) -> Column:
        return F.lit(None).cast("string")


@dataclass(frozen=True)
class ExpressionConstraint(Constraint):
    """Arbitrary row-local SQL predicate that must hold, e.g.
    ``n_tok == size(tokens)`` (token-array referential integrity)."""

    expression: str

    def flag(self, df: DataFrame) -> Column:
        ok = F.expr(self.expression)
        return ~F.coalesce(ok, F.lit(False))

    def detail(self, df: DataFrame) -> Column:
        return F.lit(f"violated: {self.expression}")


def TokenArrayEquality(n_tok_col: str = "n_tok", tokens_col: str = "tokens") -> ExpressionConstraint:
    """north_star referential integrity: n_tok == size(tokens)."""
    return ExpressionConstraint(
        name=f"token_array_equality({n_tok_col},{tokens_col})",
        expression=f"{n_tok_col} = size({tokens_col})",
    )


@dataclass(frozen=True)
class NotNullConstraint(Constraint):
    column: str = ""

    def flag(self, df: DataFrame) -> Column:
        return F.col(self.column).isNull()

    def detail(self, df: DataFrame) -> Column:
        return F.lit(f"{self.column} is null")


@dataclass(frozen=True)
class UniqueConstraint(Constraint):
    """Every value of ``column`` appears exactly once (north_star:
    uniqueness of doc_id). Non-row-local: one groupBy(column) with
    partial counts, then a broadcast-eligible join of the (rare)
    duplicated keys back onto the table."""

    column: str = ""

    def prepare(self, df: DataFrame) -> DataFrame:
        # The join-back probes once per ROW, so its key must be cheap:
        # jstack at 64M rows showed a string-keyed broadcast-hash probe
        # (UnsafeHashedRelation) memory-latency-bound and core-count-
        # flat, ~30x slower than a long-keyed one (BENCH.md round 4).
        # Group the (rare) duplicated keys by xxhash64 and verify the
        # actual value against the collected key list AFTER the probe —
        # exact under hash collisions, and the build side is unique per
        # hash by construction, so no probe row can be duplicated and no
        # driver-side uniqueness action is needed.
        # internal names are derived from the constraint name (like
        # _flag_col) so a user table that already has a column literally
        # named "_kh"/"_dup_keys" cannot collide with or be dropped by
        # this join (ADVICE round 4).
        flag_name = _flag_col(self.name)
        kh, dup_keys = flag_name + "__kh", flag_name + "__dup_keys"
        dupes = (
            df.groupBy(self.column)
            .agg(F.count(F.lit(1)).alias(flag_name + "__dup_cnt"))
            .where(F.col(flag_name + "__dup_cnt") > 1)
            .groupBy(F.xxhash64(self.column).alias(kh))
            .agg(F.collect_list(self.column).alias(dup_keys))
        )
        # duplicated keys are *usually* rare, but unbounded (a wholesale
        # re-ingestion makes them ~N rows) — no broadcast hint; AQE
        # picks broadcast when the built side is actually small and
        # falls back to a shuffle join when it is not.
        return (
            df.withColumn(kh, F.xxhash64(self.column))
            .join(dupes, kh, "left")
            .withColumn(
                flag_name,
                F.coalesce(
                    F.array_contains(dup_keys, F.col(self.column)), F.lit(False)
                ),
            )
            .drop(kh, dup_keys)
        )

    def flag(self, df: DataFrame) -> Column:
        return F.col(_flag_col(self.name))

    def detail(self, df: DataFrame) -> Column:
        return F.concat(F.lit(f"duplicate {self.column}="), F.col(self.column).cast("string"))


@dataclass(frozen=True)
class MembershipConstraint(Constraint):
    """``column`` value must belong to a small domain (north_star:
    source-domain membership). Literal IN-list stays row-local; a
    domain DataFrame becomes a broadcast left join."""

    column: str = ""
    domain: tuple = ()

    def flag(self, df: DataFrame) -> Column:
        return ~F.coalesce(F.col(self.column).isin(list(self.domain)), F.lit(False))

    def detail(self, df: DataFrame) -> Column:
        return F.concat(
            F.lit(f"{self.column} not in domain: "), F.col(self.column).cast("string")
        )


@dataclass(frozen=True)
class VocabBoundsConstraint(Constraint):
    """Every element of the token array must lie in [lo, hi)
    (north_star: vocab-range bounds).

    Formulated as ``array_min < lo OR array_max >= hi`` — the same
    codegen'd expressions the fused pipeline uses
    (pipeline.py `validate_tokens`). Higher-order functions like
    ``F.exists`` are CodegenFallback (interpreted, one boxed lambda call
    per element), and on a token-array scan that is the whole bill;
    min/max are equivalent for element-null-free arrays (token arrays
    here). If element nulls must themselves be detected, add a
    NotNullElements-style constraint — min/max skip them."""

    tokens_col: str = "tokens"
    lo: int = 0
    hi: int = 50257

    def flag(self, df: DataFrame) -> Column:
        mn = F.array_min(F.col(self.tokens_col))
        mx = F.array_max(F.col(self.tokens_col))
        bad = (mn < F.lit(self.lo)) | (mx >= F.lit(self.hi))
        return F.coalesce(bad, F.lit(False))

    def detail(self, df: DataFrame) -> Column:
        mn = F.array_min(F.col(self.tokens_col))
        mx = F.array_max(F.col(self.tokens_col))
        return F.concat(
            F.lit(f"token out of [{self.lo},{self.hi}): min="),
            mn.cast("string"),
            F.lit(" max="),
            mx.cast("string"),
        )


def _flag_col(name: str) -> str:
    return "_viol_" + "".join(ch if ch.isalnum() else "_" for ch in name)


def evaluate_constraints(
    df: DataFrame,
    partition_key: str,
    constraints: Sequence[Constraint],
    key_column: str | None = None,
    max_violation_examples: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Evaluate all constraints in one pass.

    Returns ``(verdicts, violations)``:
    - verdicts: (partition, constraint, violation_count, row_count, passed)
    - violations: (partition, constraint, key, detail) — materialized
      violating rows (optionally capped per constraint via a cheap
      per-partition limit).
    """
    work = df
    for c in constraints:
        work = c.prepare(work)
    flagged = work
    flag_names = []
    for c in constraints:
        fn = _flag_col(c.name)
        if fn not in flagged.columns:
            flagged = flagged.withColumn(fn, c.flag(flagged))
        flag_names.append(fn)

    # one aggregation pass for every verdict
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(F.col(fn).cast("long")).alias(f"_cnt_{i}")
        for i, fn in enumerate(flag_names)
    ]
    counts = flagged.groupBy(partition_key).agg(*aggs)
    verdict_structs = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col(f"_cnt_{i}").alias("violation_count"),
            F.col("row_count").alias("row_count"),
            (F.col(f"_cnt_{i}") == 0).alias("passed"),
        )
        for i, c in enumerate(constraints)
    ]
    verdicts = (
        counts.select(partition_key, F.explode(F.array(*verdict_structs)).alias("_v"))
        .select(
            F.col(partition_key).alias("partition"),
            "_v.constraint",
            "_v.violation_count",
            "_v.row_count",
            "_v.passed",
        )
    )

    # violations: filter to any-flag rows once, then explode per-constraint
    key_expr = (
        F.col(key_column).cast("string") if key_column else F.lit(None).cast("string")
    )
    any_flag = reduce(lambda a, b: a | b, [F.col(fn) for fn in flag_names])
    viol_structs = [
        F.when(
            F.col(fn),
            F.struct(F.lit(c.name).alias("constraint"), c.detail(flagged).alias("detail")),
        )
        for c, fn in zip(constraints, flag_names)
    ]
    violations = (
        flagged.where(any_flag)
        .select(
            F.col(partition_key).cast("string").alias("partition"),
            key_expr.alias("key"),
            F.explode(
                F.filter(F.array(*viol_structs), lambda s: s.isNotNull())
            ).alias("_w"),
        )
        .select("partition", F.col("_w.constraint").alias("constraint"), "key", "_w.detail")
    )
    if max_violation_examples is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("partition", "constraint").orderBy("key")
        violations = (
            violations.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_violation_examples)
            .drop("_rn")
        )
    return verdicts, violations
