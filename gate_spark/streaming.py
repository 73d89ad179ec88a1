"""Structured Streaming extension: incremental per-partition summaries.

The reference is batch-only — its incremental story is "pass
previous_summaries back in" (gate/summarize.py:54), and the north rule
requires resumable batch, not streaming (SURVEY.md §2.6). This module
is the additive streaming path for when partitions arrive as a stream
(e.g. an events firehose): a windowed groupBy aggregation maintains the
same statistics incrementally, with a watermark bounding state for
late data.

Statistics kept streaming-mergeable: count, coverage, mean, stddev
(sum/sumsq), approx-distinct (HLL). Quantiles and occurrence_ratio are
not streaming-safe in one pass (non-mergeable without sketch state in
the agg buffer) — for those, run the batch summarize over completed
windows (the lambda-architecture split the checkpoint store enables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_column_stats(
    stream_df: DataFrame,
    time_col: str,
    columns: list[str],
    *,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    partition_key: str | None = None,
) -> DataFrame:
    """Windowed incremental stats for numeric columns over an event-time
    stream: one row per (window, [partition_key], column) in the same
    long format as the batch summary.

    Works identically on a batch DataFrame (window() is a plain
    grouping expression), which is how the tests pin batch/stream
    parity; on a stream add ``.writeStream`` with a checkpoint dir.
    """
    is_streaming = stream_df.isStreaming
    # watermarks require TIMESTAMP (parquet may surface TIMESTAMP_NTZ)
    src = stream_df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if is_streaming:
        src = src.withWatermark(time_col, watermark)

    keys = [F.window(F.col(time_col), window_duration).alias("window")]
    if partition_key:
        keys.append(F.col(partition_key))

    aggs: list[Column] = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.avg(col.isNotNull().cast("double")).alias(f"{c}__coverage"),
            F.avg(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__stddev"),
            F.approx_count_distinct(c).alias(f"{c}__num_unique_values"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
        ]
    wide = src.groupBy(*keys).agg(*aggs)

    stats = ["count", "coverage", "mean", "stddev", "num_unique_values", "min", "max"]
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            *[F.col(f"{c}__{s}").cast("double").alias(s) for s in stats],
        )
        for c in columns
    ]
    out_keys = ["window"] + ([partition_key] if partition_key else [])
    return wide.select(*out_keys, F.explode(F.array(*structs)).alias("_s")).select(
        *out_keys, "_s.*"
    )


def stream_parquet_dir(
    spark, path: str, schema, time_col: str, **kwargs
) -> DataFrame:
    """Convenience: file-source stream over a parquet directory
    (new files are micro-batches; use trigger(availableNow=True) for
    catch-up-then-stop semantics)."""
    return spark.readStream.schema(schema).parquet(path)


def run_available_now(stats_df: DataFrame, checkpoint_dir: str, table_name: str):
    """Drain everything currently available into an in-memory sink and
    stop — deterministic incremental processing for tests/backfills."""
    q = (
        stats_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
