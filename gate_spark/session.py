"""SparkSession construction tuned for this engine.

Local mode is the sandbox proxy for a multi-executor cluster: shuffle
partitions are matched to cores, AQE is enabled for runtime skew
handling, and Arrow is enabled so every pandas UDF crosses the
JVM/Python boundary in columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gate_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to the core count — on a real cluster this would
    be ~2-3x total executor cores; AQE coalesces the rest.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_scan_parallelism(df, factor: int = 1):
    """Guard against grossly under-parallelized inputs (optimization
    guide §2.5 "input skew": one unsplittable file, or a single parquet
    row group — Spark assigns a row group to ONE task, so the whole map
    side of every downstream stage runs on one core while the rest of
    the cluster idles).

    Returns ``df`` round-robin-repartitioned to ``factor`` x the
    session's default parallelism when its scan resolves to fewer than
    half that many partitions; a no-op for streaming inputs and for any
    input that already splits (every real multi-file table at scale, so
    no extra shuffle is ever added on a 100 TB path). Only worth
    applying where per-row compute dominates a small shuffle (measured:
    3x on the interpreted-HOF text operators at sf0.1; a LOSS on
    codegen'd numeric aggregation, where serializing the rows costs
    more than the single-task aggregation saves — so summarize does NOT
    use it). Round-robin repartition is deterministic under task
    retries (spark.sql.execution.sortBeforeRepartition default)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * 2 <= target:
        return df.repartition(target)
    return df
