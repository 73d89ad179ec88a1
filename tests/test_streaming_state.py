"""Custom stateful streaming operator (applyInPandasWithState):
micro-batch PSI vs accumulated history, with state restored from the
streaming checkpoint across query restarts — the property a real
firehose deployment depends on."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gate_spark.streaming import incremental_drift

EDGES = [-1.0, -0.5, 0.0, 0.5, 1.0]


def _write_batch(spark, path, rng, spec):
    """spec: {partition: (mu, n)} — one file per batch so each
    availableNow run is one deterministic micro-batch."""
    frames = [
        pd.DataFrame(
            {"partition": [p] * n, "value": rng.normal(mu, 1.0, n)}
        )
        for p, (mu, n) in sorted(spec.items())
    ]
    (
        spark.createDataFrame(pd.concat(frames, ignore_index=True))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def _run(spark, path, ckpt, out_dir, schema="partition string, value double", **kw):
    """One availableNow pass into a parquet sink (the memory sink
    cannot recover from a checkpoint; parquet can). Returns the LATEST
    verdict row per partition (max total_rows)."""
    stream = spark.readStream.schema(schema).parquet(path)
    out = incremental_drift(
        stream, "partition", "value",
        inner_edges=EDGES, psi_threshold=0.2, min_history=1000, **kw,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    latest: dict = {}
    for r in rows:
        if (
            r["partition"] not in latest
            or r["total_rows"] > latest[r["partition"]]["total_rows"]
        ):
            latest[r["partition"]] = r
    return latest


def test_incremental_drift_state_survives_restart(spark, tmp_path):
    data = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.RandomState(7)

    # batch 1: baseline history for both partitions
    _write_batch(spark, data, rng, {"A": (0.0, 2000), "B": (0.0, 2000)})
    first = _run(spark, data, ckpt, str(tmp_path / "out"))
    assert first["A"]["total_rows"] == 2000
    assert first["A"]["psi"] is None  # no history yet
    assert abs(first["A"]["mean"]) < 0.1 and abs(first["A"]["stddev"] - 1.0) < 0.1

    # batch 2 in a NEW query on the same checkpoint: A stays on-
    # distribution, B shifts by +2 sigma. State must come back from the
    # checkpoint (not from reprocessing batch 1 - the file source only
    # reads the new file).
    _write_batch(spark, data, rng, {"A": (0.0, 1500), "B": (2.0, 1500)})
    second = _run(spark, data, ckpt, str(tmp_path / "out"))
    assert second["A"]["batch_rows"] == 1500
    assert second["A"]["total_rows"] == 3500  # history restored
    assert second["A"]["psi"] is not None and second["A"]["psi"] < 0.05
    assert second["A"]["drifted"] is False
    assert second["B"]["psi"] > 1.0
    assert second["B"]["drifted"] is True
    # running moments blend history + drifted batch
    assert 0.7 < second["B"]["mean"] < 1.1


def _write_cat_batch(spark, path, rng, spec):
    """spec: {partition: (n, top_frac)} — categorical column 'cat' with
    one heavy value at ~top_frac plus a uniform tail of 200 values."""
    frames = []
    for p, (n, top_frac) in sorted(spec.items()):
        heavy = rng.rand(n) < top_frac
        cats = np.where(heavy, "TOP", rng.randint(0, 200, n).astype(str))
        frames.append(
            pd.DataFrame(
                {"partition": [p] * n, "value": rng.normal(0, 1, n), "cat": cats}
            )
        )
    (
        spark.createDataFrame(pd.concat(frames, ignore_index=True))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def test_stateful_cms_occurrence_survives_restart(spark, tmp_path):
    """VERDICT r4 item 6: the stateful operator now carries the
    count-min occurrence_ratio rows in _DRIFT_STATE. Pins (same error
    contract as the windowed path): (a) the running estimate never
    undershoots the true accumulated max-frequency ratio, (b) overshoot
    stays within the collision bound, (c) merging across a query
    RESTART equals a single-run sketch bit-for-bit (checkpoint carries
    the CMS)."""
    rng = np.random.RandomState(13)
    data = str(tmp_path / "in")
    kw = dict(
        schema="partition string, value double, cat string",
        occ_col="cat", occ_width=64, occ_depth=2,
    )

    _write_cat_batch(spark, data, rng, {"A": (3000, 0.6)})
    first = _run(spark, data, str(tmp_path / "ck1"), str(tmp_path / "o1"), **kw)
    _write_cat_batch(spark, data, rng, {"A": (2000, 0.3)})
    second = _run(spark, data, str(tmp_path / "ck1"), str(tmp_path / "o1"), **kw)

    # true accumulated ratio over both batches
    pdf = spark.read.parquet(data).toPandas()
    true_ratio = (pdf["cat"] == "TOP").mean()  # TOP dominates by design
    est = second["A"]["occurrence_ratio"]
    assert second["A"]["occ_rows"] == 5000
    assert est >= true_ratio - 1e-12  # never undershoots
    assert est <= true_ratio + 4 / 64  # collision bound (width=64)

    # restart-merge == single-run: fresh checkpoint over the SAME files
    # in one pass must give the identical estimate
    single = _run(spark, data, str(tmp_path / "ck2"), str(tmp_path / "o2"), **kw)
    assert single["A"]["occurrence_ratio"] == est
    assert single["A"]["occ_rows"] == 5000

    # the plain path still reports nulls, not errors
    nul = _run(
        spark, data, str(tmp_path / "ck3"), str(tmp_path / "o3"),
        schema="partition string, value double, cat string",
    )
    assert nul["A"]["occurrence_ratio"] is None and nul["A"]["occ_rows"] == 0
