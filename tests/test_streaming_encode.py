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
    batch = streaming_column_stats(
        events, "ts", cols, window_duration="1 day", partition_key="event_type"
    ).toPandas()

    # the file source streams a DIRECTORY of micro-batch files
    stream_dir = str(tmp_path / "events_stream")
    events.where(F.col("event_id") % 2 == 0).write.parquet(stream_dir)
    events.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(stream_dir)
    stream = stream_parquet_dir(spark, stream_dir, events.schema, "ts")
    stats = streaming_column_stats(
        stream, "ts", cols, window_duration="1 day", partition_key="event_type"
    )
    run_available_now(stats, str(tmp_path / "ckpt"), "stream_stats")
    streamed = spark.sql("SELECT * FROM stream_stats").toPandas()

    key = ["window", "event_type", "column"]
    batch["window"] = batch["window"].astype(str)
    streamed["window"] = streamed["window"].astype(str)
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["count", "coverage", "mean", "stddev", "min", "max"]:
        assert np.allclose(a[c].astype(float), b[c].astype(float), equal_nan=True)


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
