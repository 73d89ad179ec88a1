"""Micro-bench: does the KLL quantile merge parallelize?

Two measurements backing quantile_mode="sketch" (VERDICT r3 ask #4):

1. numpy merge cost — the worst case a single (partition, column)
   group pays in phase 2: merging M per-split sketches sequentially.
   This is the term that is SERIAL per group (like percentile_approx's
   QuantileSummaries merge); it must be milliseconds, not minutes.

2. Spark wall time of the quantile pass over a continuous
   high-cardinality column at local[8] vs local[32] (fresh JVM per
   config, min of TRIALS timed passes after a warm-up), for
   quantile_mode="sketch" vs "approx" (percentile_approx,
   accuracy=10000). Scaling efficiency T8/(4*T32) per mode shows which
   merge topology lets added cores help.

Usage:
  python tools/kll_bench.py            # numpy bench + orchestrate both
  python tools/kll_bench.py --run 8 sketch   # internal single config
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SPARK_GRAFT_KLL_ROWS", "16000000"))
TRIALS = int(os.environ.get("SPARK_GRAFT_KLL_TRIALS", "2"))
PARTS = 8  # partition-key values


def numpy_merge_bench() -> dict:
    import numpy as np

    from gate_spark.kll import KLLSketch

    rng = np.random.RandomState(5)
    out = {}
    for m in (64, 256, 1024):
        parts = []
        for _ in range(m):
            p = KLLSketch(200)
            p.update_many(rng.lognormal(3, 1.5, size=50_000))
            parts.append(p.to_json())
        t0 = time.perf_counter()
        acc = KLLSketch(200)
        for blob in parts:
            acc.merge(KLLSketch.from_json(blob))
        dt = time.perf_counter() - t0
        out[f"merge_{m}_partials_ms"] = round(dt * 1000, 1)
        out[f"state_items_after_{m}"] = int(sum(b.size for b in acc.levels))
    return out


def _input(spark):
    from pyspark.sql import functions as F

    # deterministic continuous high-cardinality column: every value
    # distinct (id-derived), heavy-tailed via exp — the shape that
    # breaks the value-keyed exact mode and stresses digest merges.
    return (
        spark.range(ROWS)
        .repartition(256)
        .select(
            (F.col("id") % PARTS).cast("string").alias("part"),
            (F.exp((F.col("id") % 997).cast("double") / 100.0)
             + F.col("id").cast("double") * 1e-9).alias("x"),
        )
    )


def run_one(cores: int, mode: str) -> None:
    from gate_spark.session import get_spark
    from gate_spark.operators.summarize import summarize

    spark = get_spark(f"kll_bench_{cores}", cores=cores,
                      shuffle_partitions=max(32, cores))
    df = _input(spark).persist()
    df.count()  # materialize input off the clock
    times = []
    for trial in range(TRIALS + 1):  # first pass = JIT warm-up
        t0 = time.perf_counter()
        s = summarize(df, columns=["x"], partition_key="part",
                      quantile_mode=mode, persist=False)
        s.df.collect()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"cores": cores, "mode": mode,
                      "warmup": round(times[0], 2),
                      "min": round(min(times[1:]), 2),
                      "all": [round(t, 2) for t in times[1:]]}))


def main() -> None:
    if "--run" in sys.argv:
        i = sys.argv.index("--run")
        run_one(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    print("numpy merge bench:", json.dumps(numpy_merge_bench()))
    results = {}
    for cores in (8, 32):
        for mode in ("sketch", "approx"):
            p = subprocess.run(
                [sys.executable, __file__, "--run", str(cores), mode],
                capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            results[(cores, mode)] = r["min"]
            print(line)
    for mode in ("sketch", "approx"):
        t8, t32 = results[(8, mode)], results[(32, mode)]
        print(f"{mode}: T8={t8}s T32={t32}s eff={t8 / (4 * t32):.2f}")


if __name__ == "__main__":
    main()
