"""Streaming incremental stats (batch/stream parity via availableNow)
and the pluggable embedding encoder."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gate_spark.operators.encode import compute_embeddings, stub_encoder
from gate_spark.streaming import (
    run_available_now,
    streaming_column_stats,
    stream_parquet_dir,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark, events, tmp_path):
    cols = ["value", "user_id"]
    edges = {"value": [float(x) for x in range(0, 2000, 25)]}
    occ = dict(occ_columns=["user_id"], occ_width=128, occ_depth=2)
    batch = streaming_column_stats(
        events, "ts", cols, window_duration="1 day", partition_key="event_type",
        hist_edges=edges, **occ,
    ).toPandas()

    # the file source streams a DIRECTORY of micro-batch files
    stream_dir = str(tmp_path / "events_stream")
    events.where(F.col("event_id") % 2 == 0).write.parquet(stream_dir)
    events.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(stream_dir)
    stream = stream_parquet_dir(spark, stream_dir, events.schema, "ts")
    stats = streaming_column_stats(
        stream, "ts", cols, window_duration="1 day", partition_key="event_type",
        hist_edges=edges, **occ,
    )
    run_available_now(stats, str(tmp_path / "ckpt"), "stream_stats")
    streamed = spark.sql("SELECT * FROM stream_stats").toPandas()

    key = ["window", "event_type", "column"]
    batch["wstart"] = batch["window"].apply(lambda w: str(w["start"]))
    batch["window"] = batch["window"].astype(str)
    streamed["window"] = streamed["window"].astype(str)
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["count", "coverage", "mean", "stddev", "min", "max", "p50", "p95",
              "occurrence_ratio"]:
        assert np.allclose(a[c].astype(float), b[c].astype(float), equal_nan=True)

    # streaming occurrence_ratio: the heavy-hitters estimate NEVER
    # undershoots the true max-frequency ratio and overshoots by at
    # most the collision mass (expected 1/width per hash row; assert
    # 4x slack). Columns not listed in occ_columns report null.
    assert a[a["column"] == "value"]["occurrence_ratio"].isna().all()
    au = a[a["column"] == "user_id"]
    assert au["occurrence_ratio"].notna().all()
    raw_u = (
        events.select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
            "user_id",
        )
        .toPandas()
        .dropna(subset=["user_id"])
    )
    checked = 0
    for (day, et), grp in raw_u.groupby(["day", "event_type"]):
        true_ratio = grp["user_id"].value_counts().iloc[0] / len(grp)
        row = au[(au["wstart"] == str(day)) & (au["event_type"] == et)]
        assert len(row) == 1
        est = float(row["occurrence_ratio"].iloc[0])
        assert est >= true_ratio - 1e-12, (day, et, est, true_ratio)
        assert est <= true_ratio + 4.0 / 128, (day, et, est, true_ratio)
        checked += 1
    assert checked > 0

    # streaming quantiles are real values: within one bin width of the
    # exact batch percentile for the histogrammed column; null for the
    # column given no edges
    av = a[a["column"] == "value"]
    assert av["p50"].notna().all() and av["p95"].notna().all()
    assert a[a["column"] == "user_id"]["p50"].isna().all()
    # the histogram quantile brackets the NEAREST-RANK order statistic
    # (the value at index ceil(q*n)): first edge strictly above it, at
    # most one bin width away (quantiles_from_hist attribution rule)
    raw = (
        events.select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
            "value",
        )
        .toPandas()
        .dropna(subset=["value"])
    )
    for (day, et), grp in raw.groupby(["day", "event_type"]):
        vals = np.sort(grp["value"].to_numpy())
        row = av[(av["wstart"] == str(day)) & (av["event_type"] == et)]
        assert len(row) == 1
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            rank_val = vals[int(np.ceil(q * len(vals))) - 1]
            p = float(row[col].iloc[0])
            assert rank_val < p <= rank_val + 25.0 or p == vals[-1]


def test_compute_embeddings_contract(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different text")],
        ["doc_id", "text"],
    )
    out = compute_embeddings(df, "text", dim=16).toPandas().set_index("doc_id")
    assert all(len(v) == 16 for v in out["text_embedding"])
    # deterministic: equal text -> equal embedding; unit norm
    e1, e2, e3 = (np.asarray(out.loc[i, "text_embedding"]) for i in (1, 2, 3))
    assert np.array_equal(e1, e2)
    assert not np.array_equal(e1, e3)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5


def test_custom_encoder_factory(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    calls = []

    def factory():
        calls.append(1)  # once per worker, not per row
        return lambda texts: np.ones((len(texts), 4), dtype=np.float32)

    out = compute_embeddings(df, "text", encoder_factory=factory).first()
    assert list(out["text_embedding"]) == [1.0, 1.0, 1.0, 1.0]


def test_stub_encoder_batch_shape():
    enc = stub_encoder(8)
    m = enc(["a", "b", "a"])
    assert m.shape == (3, 8)
    assert np.allclose(m[0], m[2])
