"""Per-partition column summaries — the engine's flagship operator.

Computes, for every (partition, column) pair, the reference's six
statistics (coverage, mean, num_unique_values, occurrence_ratio, p50,
p95 — reference: gate/summary.py:207-277) plus north-rule extras
(count, min, max, null_fraction, stddev) as ONE Spark job:

- one ``groupBy(partition_key).agg(...)`` pass for every
  simple/sketch statistic (the reference scans the table six times,
  gate/summary.py:207-258; we fuse into a single scan + shuffle with
  map-side partial aggregation, so a heavy partition never concentrates
  raw rows on one reducer),
- one melt -> ``groupBy(partition, column, value)`` ->
  ``groupBy(partition, column)`` cascade for occurrence_ratio (and
  exact distinct counts), again fully partial-aggregated,
- an optional sort-based cascade for exact nearest-rank quantiles
  (gate parity mode; the scale default is the mergeable
  ``percentile_approx`` sketch).

All emitted statistic values are float32, matching the reference
(gate/summary.py:211-253; float32 artifacts asserted in
tests/test_summary.py:33).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gate_spark.functions.stats import (
    EXTRA_BY_TYPE,
    EXTRA_STATISTICS,
    GATE_STATISTICS,
    TYPE_TO_STATISTICS,
)

RESERVED_PARTITION_KEY = "group"  # reference: gate/summarize.py:94-95


def _qident(name: str) -> str:
    """Backtick-quote a column name for generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def _qlit(s: str) -> str:
    """Single-quote a string literal for generated SQL."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def type_to_statistics(type_class: str) -> list[str]:
    """Statistics computed for a type class (gate/statistics.py:12-49)."""
    return list(TYPE_TO_STATISTICS[type_class])


def classify_type(dtype: T.DataType) -> str | None:
    """Map a Spark type to a gate type class (gate/summary.py:176-195)."""
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType),
    ):
        return "array"
    return None


@dataclass
class Summary:
    """All partitions' summaries as one long-format DataFrame.

    The reference splits into one ``Summary`` object per partition
    (gate/summary.py:352-403); we keep a single DataFrame keyed by the
    partition column — "one summary per partition" is a filter.
    """

    df: DataFrame
    partition_key: str
    column_types: dict[str, str]
    statistics_list: list[str]
    embedding_column_map: dict[str, str] = field(default_factory=dict)
    embedding_dims: dict[str, int] = field(default_factory=dict)
    examples: dict = field(default_factory=dict)  # (partition, key_col) -> pandas
    centroids: dict = field(default_factory=dict)  # (partition, key_col) -> ndarray

    def statistics(self) -> list[str]:
        return list(self.statistics_list)

    @property
    def columns(self) -> list[str]:
        """Summarized column names (regular + embedding value columns)."""
        return list(self.column_types) + list(self.embedding_column_map.values())

    @property
    def string_columns(self) -> list[str]:
        return [c for c, t in self.column_types.items() if t == "string"]

    @property
    def float_columns(self) -> list[str]:
        return [c for c, t in self.column_types.items() if t == "float"]

    @property
    def int_columns(self) -> list[str]:
        return [c for c, t in self.column_types.items() if t in ("int", "bool", "array")]

    @property
    def embedding_columns(self) -> list[str]:
        return list(self.embedding_column_map.values())

    def partitions(self) -> list:
        rows = self.df.select(self.partition_key).distinct().orderBy(self.partition_key).collect()
        return [r[0] for r in rows]

    def unpersist(self) -> None:
        """Release the cached summary table (summarize() persists it:
        the table is metadata-scale, but its lineage is the full input
        aggregation — without the cache every consumer action, e.g.
        partitions() then detect_drift's collect, re-scans the input)."""
        self.df.unpersist()

    def value(self, partition=None):
        """Summary rows as pandas, optionally for one partition
        (mirrors Summary.value(), gate/summary.py:45-60)."""
        df = self.df
        if partition is not None:
            df = df.where(F.col(self.partition_key) == F.lit(partition))
        pdf = df.toPandas()
        return pdf.sort_values([self.partition_key, "column"]).reset_index(drop=True)


def _validate(
    df: DataFrame,
    columns: Sequence[str] | None,
    embedding_column_map: dict[str, str] | None,
    partition_key: str | None,
    previous: Sequence[Summary] | None,
) -> tuple[list[str], dict[str, str], str]:
    """Argument validation mirroring gate/summarize.py:94-107 and
    gate/summary.py:159-204 (reserved key, schema inheritance)."""
    if previous:
        prev = previous[0]
        partition_key = prev.partition_key
        columns = list(prev.column_types)
        embedding_column_map = dict(prev.embedding_column_map)
    if partition_key == RESERVED_PARTITION_KEY:
        raise ValueError(
            f"partition_key may not be the reserved name {RESERVED_PARTITION_KEY!r}"
        )
    if not columns and not embedding_column_map:
        raise ValueError(
            "You must pass `columns` and/or `embedding_column_map`, or non-empty"
            " `previous` summaries to inherit a schema from."
        )
    if not partition_key:
        raise ValueError("partition_key is required")
    if partition_key not in df.columns:
        raise ValueError(
            f"Partition key {partition_key!r} not found in dataframe columns"
            f" {df.columns}"
        )
    requested = list(columns or [])
    emap = dict(embedding_column_map or {})
    missing = [c for c in requested + list(emap) + list(emap.values()) if c not in df.columns]
    if missing:
        raise ValueError(f"Columns {missing} not found in dataframe columns {df.columns}")
    return requested, emap, partition_key


def summarize(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    embedding_column_map: dict[str, str] | None = None,
    partition_key: str | None = None,
    previous: Sequence[Summary] | None = None,
    *,
    distinct_mode: str = "approx",  # "approx" (HLL, scale default) | "exact"
    quantile_mode: str = "approx",  # "approx" | "nearest" (gate parity) | "linear" | "sketch" (KLL)
    extras: bool = False,  # add count/min/max/null_fraction/stddev (north-rule)
    accuracy: int = 10000,
    compute_embedding_examples: bool = True,
    skew_salt: int | None = None,  # explicit two-phase salted aggregation
    quantile_columns: Sequence[str] | None = None,
    persist: bool = True,
    occ_value_mode: str = "exact",  # "hash": 64-bit value fingerprints for the
    # occurrence/exact-distinct shuffle (near-unique columns: same result,
    # ~3x fewer shuffle bytes; see _occurrence_and_distinct)
    sketch_k: int = 200,  # KLL size for quantile_mode="sketch"; k >= group
    # row count means the sketch never compacts and p50/p95 are exact
    # (bit-identical to quantile_mode="nearest")
) -> Summary:
    """Compute per-partition summaries (reference entry point:
    gate/summarize.py:49-117 -> Summary.fromRaw gate/summary.py:148-403).

    Returns a :class:`Summary` whose ``df`` is the long-format table
    ``(partition_key, column, coverage, mean, num_unique_values,
    occurrence_ratio, p50, p95[, extras...])`` with float32 values.

    ``quantile_columns`` restricts p50/p95 to a subset of the numeric
    columns (others get null). This matters at scale: a
    ``percentile_approx`` digest over a high-cardinality column (e.g.
    a 10^9-distinct id) carries ~accuracy samples per map partial, and
    Spark's final per-group digest merge is single-threaded — one
    straggler task can burn minutes-to-hours of serial CPU merging
    hundreds of fat partials. Quantiles of id-like columns are
    meaningless; exclude them and the digests that remain (bounded
    domains like token lengths) stay small and merge in milliseconds.
    """
    requested, emap, partition_key = _validate(
        df, columns, embedding_column_map, partition_key, previous
    )

    column_types: dict[str, str] = {}
    for c in requested:
        tclass = classify_type(df.schema[c].dataType)
        if tclass is None:
            raise ValueError(
                f"Column {c!r} has unknown type {df.schema[c].dataType} —"
                " supported: string, float, int, bool, array<numeric>"
            )
        column_types[c] = tclass

    stats_order = list(GATE_STATISTICS) + (list(EXTRA_STATISTICS) if extras else [])

    parts = []
    if column_types:
        parts.append(
            _scalar_summary(
                df,
                partition_key,
                column_types,
                distinct_mode=distinct_mode,
                quantile_mode=quantile_mode,
                extras=extras,
                accuracy=accuracy,
                skew_salt=skew_salt,
                quantile_columns=quantile_columns,
                sketch_k=sketch_k,
                occ_value_mode=occ_value_mode,
            )
        )

    embedding_dims: dict[str, int] = {}
    examples: dict = {}
    centroids: dict = {}
    if emap:
        from gate_spark.operators.embedding import embedding_summary

        emb_long, embedding_dims, examples, centroids = embedding_summary(
            df,
            partition_key,
            emap,
            quantile_mode=quantile_mode,
            accuracy=accuracy,
            compute_examples=compute_embedding_examples,
        )
        # align to the scalar summary's column set
        for s in stats_order:
            if s not in emb_long.columns:
                emb_long = emb_long.withColumn(s, F.lit(None).cast("float"))
        parts.append(emb_long.select(partition_key, "column", *stats_order))

    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
    out = out.selectExpr(
        _qident(partition_key),
        "`column`",
        *[f"CAST({s} AS FLOAT) AS {s}" for s in stats_order],
    )
    # the summary table is metadata-scale (partitions x columns rows)
    # but its lineage is the full input aggregation: persist so the
    # usual consumer sequence (partitions() -> drift collect -> value())
    # pays for ONE scan of the raw table, not one per action. At 300
    # summarized columns this is a >2x end-to-end saving; release via
    # Summary.unpersist(). Long-lived sessions that summarize many
    # tables and never unpersist accumulate cached lineage pinning full
    # input aggregations — single-action consumers should pass
    # ``persist=False`` instead (the cache buys nothing for one
    # action). (Streaming inputs cannot persist — the streaming path in
    # streaming.py has its own incremental topology.)
    if persist and not df.isStreaming:
        out = out.persist()
    return Summary(
        df=out,
        partition_key=partition_key,
        column_types=column_types,
        statistics_list=stats_order,
        embedding_column_map=emap,
        embedding_dims=embedding_dims,
        examples=examples,
        centroids=centroids,
    )


def _scalar_summary(
    df: DataFrame,
    partition_key: str,
    column_types: dict[str, str],
    *,
    distinct_mode: str,
    quantile_mode: str,
    extras: bool,
    accuracy: int,
    skew_salt: int | None = None,
    quantile_columns: Sequence[str] | None = None,
    sketch_k: int = 200,
    occ_value_mode: str = "exact",
) -> DataFrame:
    cols = list(column_types)

    # working projection: bool -> tinyint (gate/summary.py:188-191),
    # array -> size() so token arrays summarize over their lengths
    # (SURVEY.md §1.3). Column pruning: only requested columns are read.
    working = [F.col(partition_key)]
    for c in cols:
        t = column_types[c]
        if t == "bool":
            working.append(F.col(c).cast("tinyint").alias(c))
        elif t == "array":
            working.append(
                F.when(F.col(c).isNull(), F.lit(None).cast("long"))
                .otherwise(F.size(c).cast("long"))
                .alias(c)
            )
        else:
            working.append(F.col(c))
    wdf = df.select(*working)
    # NOT repartitioned on under-parallelized inputs (unlike the text
    # operators): an interleaved A/B on a 6M-row single-row-group file
    # showed no reliable win (guard-on min 14.07 s vs guard-off 13.65 s
    # across 3 alternating trials) and a clear LOSS at 600 k rows
    # (0.90 -> 1.21 s) — serializing the rows through a round-robin
    # exchange costs as much as the single-task codegen'd aggregation
    # saves. See session.ensure_scan_parallelism and OPTIMIZATION_r06.md.

    eff_type = {
        c: ("int" if column_types[c] in ("bool", "array") else column_types[c]) for c in cols
    }
    needs_numeric = {c for c in cols if eff_type[c] in ("int", "float")}
    needs_quantile = (
        needs_numeric
        if quantile_columns is None
        else needs_numeric & set(quantile_columns)
    )
    needs_distinct = {
        c for c in cols if "num_unique_values" in TYPE_TO_STATISTICS[column_types[c]]
    }
    needs_occ = {
        c for c in cols if "occurrence_ratio" in TYPE_TO_STATISTICS[column_types[c]]
    }

    if skew_salt:
        # ---- explicit two-phase salted aggregation (north rule: "skew
        # from heavy source partitions handled with salted aggregation +
        # two-phase merge of mergeable sketches"). Phase 1 groups by
        # (partition, salt) building mergeable partials — counts, sums,
        # sum-of-squares, min/max, HLL sketches; phase 2 merges per
        # partition. A reducer therefore never receives more than
        # 1/salt of a heavy partition's phase-1 output. Quantiles and
        # occurrence_ratio always use the value-keyed cascades below,
        # which are skew-proof by construction (the value IS the salt).
        long_df = _salted_scalar_pass(
            wdf, partition_key, cols, eff_type, column_types,
            needs_numeric, needs_distinct,
            distinct_mode=distinct_mode, extras=extras,
            stats_order=list(GATE_STATISTICS) + (list(EXTRA_STATISTICS) if extras else []),
            skew_salt=skew_salt,
        )
        occ_cols = sorted(needs_occ | (needs_distinct if distinct_mode == "exact" else set()))
        if occ_cols:
            side = _occ_distinct_side(
                wdf, partition_key, needs_occ, needs_distinct,
                distinct_mode, occ_value_mode,
            )
            long_df = long_df.join(side, [partition_key, "column"], "left")
            long_df = long_df.withColumn(
                "occurrence_ratio",
                F.when(F.col("column").isin(sorted(needs_occ)), F.col("_occ"))
                .otherwise(F.col("occurrence_ratio")),
            )
            if distinct_mode == "exact":
                long_df = long_df.withColumn(
                    "num_unique_values",
                    F.when(
                        F.col("column").isin(sorted(needs_distinct)),
                        F.col("_ndv").cast("double"),
                    ).otherwise(F.col("num_unique_values")),
                )
            long_df = long_df.drop("_occ", "_ndv")
        num_cols = sorted(needs_quantile)
        if num_cols:
            if quantile_mode == "sketch":
                qside = _kll_quantiles(
                    wdf, partition_key, num_cols, (0.5, 0.95), k=sketch_k
                )
            else:
                qside = _nearest_rank_quantiles(wdf, partition_key, num_cols, (0.5, 0.95))
            long_df = long_df.join(qside, [partition_key, "column"], "left")
            long_df = (
                long_df.withColumn("p50", F.coalesce(F.col("_p50"), F.col("p50")))
                .withColumn("p95", F.coalesce(F.col("_p95"), F.col("p95")))
                .drop("_p50", "_p95")
            )
        stats_order = list(GATE_STATISTICS) + (list(EXTRA_STATISTICS) if extras else [])
        return long_df.select(partition_key, "column", *stats_order)

    # ---- pass 1: everything expressible as a single partial-aggregable
    # groupBy — one scan, one (tiny) shuffle. Expressions are built as
    # generated SQL compiled by ONE parser call each: the Column-algebra
    # formulation paid ~6 py4j round trips per aggregate (hundreds per
    # summarize() call — profiled at ~0.48 s of driver time per call at
    # 5 columns, ~3x more than the whole string route; the compiled
    # Catalyst expressions are identical).
    agg_strs: list[str] = []
    agged_cols: set[str] = set()

    def _agg(sql: str, alias: str) -> None:
        agg_strs.append(f"{sql} AS {alias}")
        agged_cols.add(alias)

    for i, c in enumerate(cols):
        q = _qident(c)
        d = f"CAST({q} AS DOUBLE)"
        _agg(f"avg(CAST(({q} IS NOT NULL) AS DOUBLE))", f"c{i}__coverage")
        if c in needs_numeric:
            _agg(f"avg({d})", f"c{i}__mean")
            if quantile_mode == "approx" and c in needs_quantile:
                _agg(
                    f"percentile_approx({d}, array(0.5D, 0.95D), {int(accuracy)})",
                    f"c{i}__q",
                )
            elif quantile_mode == "linear" and c in needs_quantile:
                _agg(f"percentile({d}, array(0.5D, 0.95D))", f"c{i}__q")
        if c in needs_distinct and distinct_mode == "approx":
            _agg(f"approx_count_distinct({q})", f"c{i}__num_unique_values")
        if extras:
            _agg(f"count({q})", f"c{i}__count")
            _agg(f"avg(CAST(({q} IS NULL) AS DOUBLE))", f"c{i}__null_fraction")
            if c in needs_numeric:
                _agg(f"max({d})", f"c{i}__max")
                _agg(f"min({d})", f"c{i}__min")
                _agg(f"stddev_samp({d})", f"c{i}__stddev")
    agged = wdf.groupBy(partition_key).agg(
        *[F.expr(s) for s in agg_strs]
    )

    # reshape the one-row-per-partition aggregate into long format with
    # an explode over per-column structs — this happens on the already
    # aggregated (metadata-scale) result, not on raw data. The whole
    # explode(array(named_struct(...)...)) tree is ONE generated-SQL
    # expression (at 300 columns the per-stat Column loop was thousands
    # of py4j calls).
    stats_order = list(GATE_STATISTICS) + (list(EXTRA_STATISTICS) if extras else [])
    structs = []
    for i, c in enumerate(cols):
        available = set(TYPE_TO_STATISTICS[column_types[c]])
        if extras:
            available |= set(EXTRA_BY_TYPE[column_types[c]])
        fields = ["'column'", _qlit(c)]
        for s in stats_order:
            name = f"c{i}__{s}"
            if s not in available:
                src = "CAST(NULL AS DOUBLE)"
            elif s in ("p50", "p95") and quantile_mode in ("approx", "linear"):
                src = (
                    f"element_at(c{i}__q, {1 if s == 'p50' else 2})"
                    if c in needs_quantile
                    else "CAST(NULL AS DOUBLE)"
                )
            elif name in agged_cols:
                src = f"CAST({name} AS DOUBLE)"
            else:
                src = "CAST(NULL AS DOUBLE)"
            fields.append(f"'{s}'")
            fields.append(src)
        structs.append(f"named_struct({', '.join(fields)})")
    long_df = agged.select(
        partition_key,
        F.expr(f"explode(array({', '.join(structs)}))").alias("_s"),
    ).select(partition_key, "_s.*")

    # Columns needing BOTH occurrence_ratio and nearest-rank quantiles
    # share ONE value-keyed pass: the quantile machinery's windowed
    # (partition, column, value, _cnt) frame is exactly the occ
    # cascade's first level, so max/sum fold into the same final
    # aggregation (one melt + one shuffle instead of two of each).
    # Gated to distinct_mode != "exact": the shared melt keys by the
    # DOUBLE value, and a distinct count over doubles is not "exact"
    # for int values beyond 2^53 — the exact-label contract keeps its
    # string-keyed cascade. occurrence_ratio itself is unchanged for
    # any value in double's exact-integer range (int-class occ columns;
    # the 2^53 caveat parallels the documented 2^-64 hash-mode trade).
    shared = (
        needs_quantile & needs_occ
        if quantile_mode == "nearest" and distinct_mode != "exact"
        else set()
    )

    # ---- pass 2: occurrence_ratio (+ exact distinct) via melt ->
    # two-level aggregation (gate/summary.py:240-249; S8 mapping).
    occ_alone = needs_occ - shared
    occ_cols = sorted(occ_alone | (needs_distinct if distinct_mode == "exact" else set()))
    if occ_cols:
        side = _occ_distinct_side(
            wdf, partition_key, occ_alone, needs_distinct,
            distinct_mode, occ_value_mode,
        )
        long_df = long_df.join(side, [partition_key, "column"], "left")
        long_df = long_df.withColumn(
            "occurrence_ratio",
            F.when(
                F.col("column").isin(sorted(occ_alone)), F.col("_occ")
            ).otherwise(F.col("occurrence_ratio")),
        )
        if distinct_mode == "exact":
            long_df = long_df.withColumn(
                "num_unique_values",
                F.when(
                    F.col("column").isin(sorted(needs_distinct)),
                    F.col("_ndv").cast("double"),
                ).otherwise(F.col("num_unique_values")),
            )
        long_df = long_df.drop("_occ", "_ndv")

    if shared:
        pairs = _melt(wdf, partition_key, sorted(shared), "double")
        qocc = nearest_rank_quantiles_from_pairs(
            pairs, [partition_key, "column"], (0.5, 0.95), with_occ=True
        )
        long_df = long_df.join(qocc, [partition_key, "column"], "left")
        long_df = (
            long_df.withColumn("p50", F.coalesce(F.col("_p50"), F.col("p50")))
            .withColumn("p95", F.coalesce(F.col("_p95"), F.col("p95")))
            .withColumn(
                "occurrence_ratio",
                F.when(
                    F.col("column").isin(sorted(shared)), F.col("_occ")
                ).otherwise(F.col("occurrence_ratio")),
            )
            .drop("_p50", "_p95", "_occ")
        )

    # ---- pass 3: exact nearest-rank quantiles (gate parity), or the
    # KLL mergeable sketch (unbounded continuous columns — "nearest"
    # assumes bounded value cardinality, percentile_approx has the
    # profiled serial digest merge; see gate_spark/kll.py).
    if quantile_mode in ("nearest", "sketch"):
        num_cols = sorted(needs_quantile - shared)
        if num_cols:
            if quantile_mode == "nearest":
                qside = _nearest_rank_quantiles(wdf, partition_key, num_cols, (0.5, 0.95))
            else:
                qside = _kll_quantiles(
                    wdf, partition_key, num_cols, (0.5, 0.95), k=sketch_k
                )
            long_df = long_df.join(qside, [partition_key, "column"], "left")
            long_df = (
                long_df.withColumn("p50", F.coalesce(F.col("_p50"), F.col("p50")))
                .withColumn("p95", F.coalesce(F.col("_p95"), F.col("p95")))
                .drop("_p50", "_p95")
            )

    return long_df.select(partition_key, "column", *stats_order)


def _salted_scalar_pass(
    wdf: DataFrame,
    partition_key: str,
    cols: list[str],
    eff_type: dict[str, str],
    column_types: dict[str, str],
    needs_numeric: set,
    needs_distinct: set,
    *,
    distinct_mode: str,
    extras: bool,
    stats_order: list[str],
    skew_salt: int,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(partition, salt) building
    mergeable partials, then groupBy(partition) merging them.

    Mergeable state per column: (rows, non-null count, sum, sum-of-
    squares, min, max[, HLL sketch]). mean = Σsum/Σn; stddev_samp via
    the sum-of-squares identity (adequate for the approximate scale
    path; the exact path uses Catalyst's single-pass stddev_samp).
    Distinct uses hll_sketch_agg/hll_union_agg — the sketch merge is
    exact with respect to the sketch, so salting changes nothing.
    """
    salt = F.pmod(F.spark_partition_id(), F.lit(skew_salt)).alias("_salt")
    p1_aggs: list = []
    for i, c in enumerate(cols):
        col = F.col(c)
        p1_aggs.append(F.count(F.lit(1)).alias(f"c{i}__rows"))
        p1_aggs.append(F.count(col).alias(f"c{i}__n"))
        if c in needs_numeric:
            d = col.cast("double")
            p1_aggs.append(F.sum(d).alias(f"c{i}__sum"))
            p1_aggs.append(F.sum(d * d).alias(f"c{i}__sumsq"))
            p1_aggs.append(F.min(d).alias(f"c{i}__min"))
            p1_aggs.append(F.max(d).alias(f"c{i}__max"))
        if c in needs_distinct and distinct_mode == "approx":
            p1_aggs.append(F.hll_sketch_agg(col.cast("string")).alias(f"c{i}__hll"))
    phase1 = wdf.groupBy(F.col(partition_key), salt).agg(*p1_aggs)

    p2_aggs: list = []
    for i, c in enumerate(cols):
        p2_aggs.append(F.sum(f"c{i}__rows").alias(f"c{i}__rows"))
        p2_aggs.append(F.sum(f"c{i}__n").alias(f"c{i}__n"))
        if c in needs_numeric:
            p2_aggs.append(F.sum(f"c{i}__sum").alias(f"c{i}__sum"))
            p2_aggs.append(F.sum(f"c{i}__sumsq").alias(f"c{i}__sumsq"))
            p2_aggs.append(F.min(f"c{i}__min").alias(f"c{i}__min"))
            p2_aggs.append(F.max(f"c{i}__max").alias(f"c{i}__max"))
        if c in needs_distinct and distinct_mode == "approx":
            p2_aggs.append(
                F.hll_sketch_estimate(F.hll_union_agg(f"c{i}__hll")).alias(f"c{i}__ndv")
            )
    merged = phase1.groupBy(partition_key).agg(*p2_aggs)

    structs = []
    for i, c in enumerate(cols):
        available = set(TYPE_TO_STATISTICS[column_types[c]])
        if extras:
            available |= set(EXTRA_BY_TYPE[column_types[c]])
        rows_ = F.col(f"c{i}__rows").cast("double")
        n = F.col(f"c{i}__n").cast("double")
        exprs: dict[str, "F.Column"] = {
            "coverage": n / rows_,
            "num_unique_values": (
                F.col(f"c{i}__ndv").cast("double")
                if c in needs_distinct and distinct_mode == "approx"
                else F.lit(None).cast("double")
            ),
            "occurrence_ratio": F.lit(None).cast("double"),
            "p50": F.lit(None).cast("double"),
            "p95": F.lit(None).cast("double"),
        }
        if c in needs_numeric:
            s, ss = F.col(f"c{i}__sum"), F.col(f"c{i}__sumsq")
            exprs["mean"] = s / n
            exprs["count"] = n
            exprs["min"] = F.col(f"c{i}__min")
            exprs["max"] = F.col(f"c{i}__max")
            exprs["stddev"] = F.when(
                n > 1, F.sqrt(F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0)))
            )
        else:
            exprs["mean"] = F.lit(None).cast("double")
            exprs["count"] = n
            exprs["min"] = F.lit(None).cast("double")
            exprs["max"] = F.lit(None).cast("double")
            exprs["stddev"] = F.lit(None).cast("double")
        exprs["null_fraction"] = (rows_ - n) / rows_
        fields = [F.lit(c).alias("column")]
        for st in stats_order:
            src = exprs.get(st, F.lit(None).cast("double"))
            if st not in available:
                src = F.lit(None).cast("double")
            fields.append(src.cast("double").alias(st))
        structs.append(F.struct(*fields))
    return merged.select(
        partition_key, F.explode(F.array(*structs)).alias("_s")
    ).select(partition_key, "_s.*")


def _melt(
    df: DataFrame, partition_key: str, cols: Iterable[str], cast: str
) -> DataFrame:
    """(partition, column, value) triples for the given columns — one
    scan, rows multiplied by len(cols) but immediately aggregated with
    map-side combine by callers. One generated-SQL explode expression
    (see the plan-construction note in _scalar_summary)."""
    structs = [
        f"named_struct('column', {_qlit(c)},"
        f" 'value', CAST({_qident(c)} AS {cast}))"
        for c in cols
    ]
    return (
        df.select(
            partition_key,
            F.expr(f"explode(array({', '.join(structs)}))").alias("_cv"),
        )
        .select(partition_key, "_cv.column", "_cv.value")
        .where(F.col("value").isNotNull())
    )


def _occ_distinct_side(
    df: DataFrame,
    partition_key: str,
    needs_occ: set,
    needs_distinct: set,
    distinct_mode: str,
    occ_value_mode: str,
) -> DataFrame:
    """Occurrence/exact-distinct side table with the "exact" contract
    enforced: a column whose ``num_unique_values`` is reported under
    ``distinct_mode="exact"`` is ALWAYS counted over exact values, even
    when ``occ_value_mode="hash"`` — a distinct count over 64-bit
    fingerprints is fingerprint-exact, not exact, and the API must not
    silently weaken the label (ADVICE round 4). Hash fingerprints apply
    only to columns feeding occurrence_ratio alone, where counts per
    fingerprint equal counts per value up to 2^-64 collisions and the
    ratio is unchanged. The two column sets are disjoint, so total
    shuffled pairs match the single-pass formulation; the only extra
    cost in the mixed regime is a second melt scan of the (persisted)
    input."""
    exact_cols = sorted(needs_distinct) if distinct_mode == "exact" else []
    hash_ok = sorted(set(needs_occ) - set(exact_cols))
    occ_cols = sorted(set(needs_occ) | set(exact_cols))
    if occ_value_mode != "hash" or not exact_cols:
        return _occurrence_and_distinct(
            df, partition_key, occ_cols, value_mode=occ_value_mode
        )
    side = _occurrence_and_distinct(df, partition_key, exact_cols, value_mode="exact")
    if hash_ok:
        side = side.unionByName(
            _occurrence_and_distinct(df, partition_key, hash_ok, value_mode="hash")
        )
    return side


def _occurrence_and_distinct(
    df: DataFrame, partition_key: str, cols: list[str], value_mode: str = "exact"
) -> DataFrame:
    """max-frequency ratio + exact distinct per (partition, column).

    Values are compared within a column only, so each column's NATIVE
    value is its own equality key; the first-level aggregation is one
    ``groupingSets((pk, col_i) for each column)`` pass (r6 — replaces
    the string-melt cascade: grouping by native values instead of
    string casts was a measured 21% on the cascade at 6 M rows and the
    win grows with rows, since the per-row cast is gone; counts per
    native value equal counts per string cast — the cast is injective
    within a column — so every emitted statistic is identical). The
    aggregate is high-cardinality and partial-aggregated, so heavy
    values combine map-side (skew-safe). Null handling pinned by the
    reference fixture: denominator excludes nulls
    (tests/test_summary.py:46-48 — 2/3 for [cat,dog,dog]).

    ``value_mode="hash"`` groups by ``xxhash64(string value)`` instead
    of the value. On a near-unique column (e.g. a doc id) map-side
    combine cannot shrink this shuffle — every row crosses the wire —
    so the 8-byte fingerprint cuts shuffle bytes and comparator cost
    several-fold (the round-4 long-keys lesson). Counts per 64-bit
    fingerprint equal counts per value up to 2^-64 collisions, so
    occurrence_ratio and the exact distinct count are unchanged in
    practice; keep ``"exact"`` where bit-exact SQL parity is checked.

    Dispatch: the grouping-sets form only for <= 8 columns. Above
    that, Expand's duplicated rows carry every grouping column (one
    UnsafeRow field per column, nulls included), so shuffle bytes grow
    linearly with column count where the melt's stay constant — and
    Spark caps grouping sets at 64 anyway (the 300-column wide path
    stays on the single-scan melt cascade; both forms are
    value-identical).
    """
    if len(cols) > 8:
        return _occurrence_and_distinct_melt(df, partition_key, cols, value_mode)
    k = len(cols)
    names = [f"_occ_v{i}" for i in range(k)]
    if value_mode == "hash":
        proj = [
            f"xxhash64(CAST({_qident(c)} AS STRING)) AS {n}"
            for c, n in zip(cols, names)
        ]
    else:
        proj = [f"{_qident(c)} AS {n}" for c, n in zip(cols, names)]
    src = df.selectExpr(_qident(partition_key), *proj)
    first = src.groupingSets(
        [[partition_key, n] for n in names], partition_key, *names
    ).agg(F.expr("grouping_id() AS _gid"), F.expr("count(1) AS _cnt"))
    # one linear projection maps each grouping set back to its column
    # name and drops null-valued groups — no per-column plan branches
    # (grouping_id bit for value column j is 1 << (k-1-j); the
    # partition-key bit is never set since it is in every set)
    gid = lambda i: sum(1 << (k - 1 - j) for j in range(k) if j != i)
    col_case = "CASE _gid " + " ".join(
        f"WHEN {gid(i)} THEN {_qlit(c)}" for i, c in enumerate(cols)
    ) + " END"
    keep_case = "CASE _gid " + " ".join(
        f"WHEN {gid(i)} THEN ({names[i]} IS NOT NULL)" for i in range(k)
    ) + " ELSE false END"
    counts = first.where(F.expr(keep_case)).selectExpr(
        _qident(partition_key), f"{col_case} AS column", "_cnt"
    )
    return counts.groupBy(partition_key, "column").agg(
        (F.max("_cnt") / F.sum("_cnt")).cast("double").alias("_occ"),
        F.count(F.lit(1)).alias("_ndv"),
    )


def _occurrence_and_distinct_melt(
    df: DataFrame, partition_key: str, cols: list[str], value_mode: str
) -> DataFrame:
    """Wide-column form of :func:`_occurrence_and_distinct`: one
    string-typed melt of all columns (single scan regardless of column
    count, constant-width shuffle rows), then the two-level value
    cascade. Value-identical to the grouping-sets form — the string
    cast is injective within a column."""
    pairs = _melt(df, partition_key, cols, "string")
    if value_mode == "hash":
        pairs = pairs.select(
            partition_key, "column", F.xxhash64("value").alias("value")
        )
    counts = pairs.groupBy(partition_key, "column", "value").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return counts.groupBy(partition_key, "column").agg(
        (F.max("_cnt") / F.sum("_cnt")).cast("double").alias("_occ"),
        F.count(F.lit(1)).alias("_ndv"),
    )


def _nearest_rank_quantiles(
    df: DataFrame, partition_key: str, cols: list[str], qs: tuple[float, ...]
) -> DataFrame:
    """Exact nearest-rank quantiles: polars `interpolation="nearest"`
    semantics — value at index round_half_up(q * (n-1)) of the sorted
    non-null values (evidence: p50 of [0,1] = 1.0,
    reference tests/test_summary.py:38).

    Distributed as: melt -> count duplicates (partial agg) -> one
    window sort per (partition, column) over *distinct* values ->
    rank-range selection. Only engaged in gate-parity mode; the scale
    default is the percentile_approx sketch.
    """
    pairs = _melt(df, partition_key, cols, "double")
    return nearest_rank_quantiles_from_pairs(pairs, [partition_key, "column"], qs)


def _kll_quantiles(
    df: DataFrame,
    partition_key: str,
    cols: list[str],
    qs: tuple[float, ...],
    k: int = 200,
) -> DataFrame:
    """KLL-sketch quantiles (``quantile_mode="sketch"``): the scale
    path for *unbounded continuous* columns, where the value-keyed
    exact cascade would sort data-scale distinct sets and
    percentile_approx pays its serial per-group digest merge. Map-side
    partial sketches + parallel per-(partition, column) merges — see
    gate_spark/kll.py for the shape argument."""
    from gate_spark.kll import kll_quantiles_from_pairs

    pairs = _melt(df, partition_key, cols, "double")
    return kll_quantiles_from_pairs(pairs, [partition_key, "column"], qs, k=k)


def nearest_rank_quantiles_from_pairs(
    pairs: DataFrame, keys: list[str], qs: tuple[float, ...],
    with_occ: bool = False,
) -> DataFrame:
    """Nearest-rank quantiles over a (keys..., value) pair table; one
    output column ``_p{q*100}`` per requested quantile. The window sort
    runs over *distinct* values per key (duplicates pre-counted with
    map-side combine), so a key with billions of rows but bounded value
    cardinality sorts a small set. Generated SQL (plan-construction
    note in _scalar_summary); target rank is 1-based with SQL round =
    HALF_UP for positives, matching polars' round-half-away-from-zero."""
    kq = [_qident(k) for k in keys]
    kl = ", ".join(kq)
    counts = pairs.groupBy(*keys, "value").agg(F.expr("count(1) AS _cnt"))
    cum = counts.selectExpr(
        *kq,
        "value",
        "_cnt",
        f"sum(_cnt) OVER (PARTITION BY {kl} ORDER BY value) AS _cum",
        f"sum(_cnt) OVER (PARTITION BY {kl}) AS _n",
    )
    sel_exprs = [
        F.expr(
            f"max(CASE WHEN CAST(round({q!r}D * (_n - 1), 0) AS BIGINT) + 1"
            f" BETWEEN _cum - _cnt + 1 AND _cum THEN value END)"
            f" AS _p{int(q * 100)}"
        )
        for q in qs
    ]
    if with_occ:
        # occurrence_ratio rides the SAME windowed counts frame: the
        # (keys, value, _cnt) rows are exactly what the occ cascade's
        # first level produces, so max/sum fold in the same final
        # aggregation — one value-keyed pass serves both statistics.
        sel_exprs.append(
            F.expr("CAST(max(_cnt) / sum(_cnt) AS DOUBLE) AS _occ")
        )
    return cum.groupBy(*keys).agg(*sel_exprs)
