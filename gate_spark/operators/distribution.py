"""Distribution-drift statistics: PSI and KS (north-rule extras).

The reference's drift check is z-scored summary deviation + kNN
(gate/drift.py); the north rule adds Population Stability Index and a
Kolmogorov-Smirnov statistic. Both are computed from ONE histogram
aggregation:

1. bin edges: equi-depth edges from ``percentile_approx`` over the
   whole column (a mergeable sketch; one pass);
2. per-(partition, bin) counts: one ``groupBy`` with map-side combine
   — the only shuffle, carrying at most partitions x bins rows;
3. PSI/KS per partition against the pooled counts of all *other*
   partitions, computed on the tiny histogram table with window
   functions — no second pass over raw data.

Everything is a Catalyst expression; at 10^12 rows the cost is one
scan + one (partitions x bins)-row shuffle.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PSI_EPS = 1e-6


def _bin_expr(value: Column, inner_edges: list[float]) -> Column:
    """Bucket index 0..len(edges): count of edges <= value. A short
    chain of codegen'd comparisons — no UDF."""
    if not inner_edges:
        return F.lit(0)
    terms = [(value >= F.lit(float(e))).cast("int") for e in inner_edges]
    return reduce(add, terms)


def compute_bin_edges(
    df: DataFrame, value_col: str, num_bins: int = 10, accuracy: int = 10000
) -> list[float]:
    """Equi-depth inner edges (num_bins - 1 of them) from a mergeable
    quantile sketch over the full column."""
    qs = [i / num_bins for i in range(1, num_bins)]
    row = df.select(
        F.percentile_approx(
            F.col(value_col).cast("double"), F.array(*[F.lit(q) for q in qs]), accuracy
        ).alias("e")
    ).first()
    edges = sorted(set(row["e"] or []))
    return [float(e) for e in edges]


def partition_histograms(
    df: DataFrame, partition_key: str, value_col: str, inner_edges: list[float]
) -> DataFrame:
    """(partition, bin, bin_count) — one scan, one tiny shuffle."""
    value = F.col(value_col).cast("double")
    return (
        df.where(value.isNotNull())
        .select(F.col(partition_key).alias("partition"), _bin_expr(value, inner_edges).alias("bin"))
        .groupBy("partition", "bin")
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def psi_ks_from_histogram(hist: DataFrame) -> DataFrame:
    """PSI + KS per partition vs the pooled histogram of all other
    partitions, from a (partition, bin, bin_count) table.

    PSI = sum over bins (p - q) * ln(p / q), with epsilon-floored
    proportions; KS = max |CDF_p - CDF_q| over bin edges.
    """
    # densify: every partition needs a row for every bin
    parts = hist.select("partition").distinct()
    bins = hist.select("bin").distinct()
    dense = (
        parts.crossJoin(bins)
        .join(hist, ["partition", "bin"], "left")
        .withColumn("bin_count", F.coalesce(F.col("bin_count"), F.lit(0)))
    )
    totals = dense.groupBy("partition").agg(F.sum("bin_count").alias("part_total"))
    global_bins = dense.groupBy("bin").agg(F.sum("bin_count").alias("global_bin"))
    global_total = dense.agg(F.sum("bin_count").alias("gt"))

    enriched = (
        dense.join(totals, "partition")
        .join(global_bins, "bin")
        .crossJoin(F.broadcast(global_total))
        .withColumn("others_bin", F.col("global_bin") - F.col("bin_count"))
        .withColumn("others_total", F.col("gt") - F.col("part_total"))
        .withColumn(
            "p",
            F.greatest(F.col("bin_count") / F.col("part_total"), F.lit(PSI_EPS)),
        )
        .withColumn(
            "q",
            F.greatest(F.col("others_bin") / F.col("others_total"), F.lit(PSI_EPS)),
        )
    )
    w = (
        Window.partitionBy("partition")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = enriched.withColumn("cdf_p", F.sum("p").over(w)).withColumn(
        "cdf_q", F.sum("q").over(w)
    )
    return cdf.groupBy("partition").agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.max(F.abs(F.col("cdf_p") - F.col("cdf_q"))).alias("ks"),
    )


def distribution_drift(
    df: DataFrame,
    partition_key: str,
    value_col: str,
    num_bins: int = 10,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    accuracy: int = 10000,
    edges: list[float] | None = None,
) -> DataFrame:
    """Per-partition PSI/KS drift verdicts for one numeric column.

    Returns (partition, psi, ks, psi_drifted, ks_drifted). Pass
    explicit ``edges`` to pin binning (oracle parity / stable
    cross-run comparisons); default derives equi-depth edges from a
    quantile sketch.
    """
    if edges is None:
        edges = compute_bin_edges(df, value_col, num_bins, accuracy)
    hist = partition_histograms(df, partition_key, value_col, edges)
    scores = psi_ks_from_histogram(hist)
    return scores.select(
        "partition",
        "psi",
        "ks",
        (F.col("psi") >= F.lit(psi_threshold)).alias("psi_drifted"),
        (F.col("ks") >= F.lit(ks_threshold)).alias("ks_drifted"),
    )


def psi(hist_current: dict[int, int], hist_baseline: dict[int, int]) -> float:
    """Driver-side PSI between two small histograms (utility/tests)."""
    import math

    bins = sorted(set(hist_current) | set(hist_baseline))
    tc = sum(hist_current.values()) or 1
    tb = sum(hist_baseline.values()) or 1
    total = 0.0
    for b in bins:
        p = max(hist_current.get(b, 0) / tc, PSI_EPS)
        q = max(hist_baseline.get(b, 0) / tb, PSI_EPS)
        total += (p - q) * math.log(p / q)
    return total


def ks_statistic(hist_current: dict[int, int], hist_baseline: dict[int, int]) -> float:
    """Driver-side KS from two small histograms (utility/tests)."""
    bins = sorted(set(hist_current) | set(hist_baseline))
    tc = sum(hist_current.values()) or 1
    tb = sum(hist_baseline.values()) or 1
    cp = cq = 0.0
    best = 0.0
    for b in bins:
        cp += hist_current.get(b, 0) / tc
        cq += hist_baseline.get(b, 0) / tb
        best = max(best, abs(cp - cq))
    return best
