"""Micro-benchmark: interpreted-HOF vs Arrow-matmul embedding paths.

Round-2 VERDICT item #1: the sign-LSH bucketing and candidate cosine
verification ran on Catalyst higher-order functions — CodegenFallback,
interpreted + boxed per element, paying ``dim x planes x bands``
multiply-adds per row. This tool measures both formulations on the
same generated vectors so the speedup is a recorded fact, not a claim.

The vector table is generated as pure Catalyst expressions (seeded
xxhash64 per (id, dim) — no driver materialization, no RNG on
executors), so both paths scan identical data.

Usage: python tools/embedding_bench.py
Env:   EMB_BENCH_ROWS (default 1_000_000, arrow paths)
       EMB_BENCH_ROWS_HOF (default 50_000 — the HOF path is the slow
       one being deprecated; its throughput is measured at a smaller
       row count and reported as rows/sec)
       EMB_BENCH_DIM (default 64), EMB_BENCH_CORES (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROWS = int(os.environ.get("EMB_BENCH_ROWS", "1000000"))
ROWS_HOF = int(os.environ.get("EMB_BENCH_ROWS_HOF", "50000"))
DIM = int(os.environ.get("EMB_BENCH_DIM", "64"))
CORES = int(os.environ.get("EMB_BENCH_CORES", "32"))
NUM_PLANES, NUM_BANDS = 16, 4


def vectors(spark, n: int):
    """(vec_id, vec: array<float>) — deterministic, Catalyst-only."""
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64("id", F.lit(i)), F.lit(2000001)).cast("double")
                / 1000000.0
                - 1.0
            ).cast("float")
            for i in range(DIM)
        ]
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("vec"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from gate_spark.operators import dedup as dd
    from gate_spark.operators import similarity as sim
    from gate_spark.session import get_spark

    spark = get_spark(
        "embedding_bench", cores=CORES,
        extra_conf={"spark.sql.shuffle.partitions": str(CORES)},
    )
    results: dict[str, dict] = {}

    # ---- sign-LSH bucketing: all bands' bucket keys per row ----------
    def buckets_arrow(n):
        v = vectors(spark, n)
        out = v.select(
            "vec_id",
            F.posexplode(
                dd._sign_buckets_udf(NUM_BANDS, NUM_PLANES)(F.col("vec"))
            ).alias("band", "bucket"),
        )
        force(out)

    def buckets_hof(n):
        v = vectors(spark, n)
        out = v.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            dd._signature_bucket_hof(
                                F.col("vec"), b, NUM_PLANES, "xxhash"
                            ).alias("bucket"),
                        )
                        for b in range(NUM_BANDS)
                    ]
                )
            ).alias("_bb"),
        ).select("vec_id", "_bb.band", "_bb.bucket")
        force(out)

    buckets_arrow(10_000)  # warm-up: JIT + python workers
    buckets_hof(1_000)
    t_arrow = timed(lambda: buckets_arrow(ROWS))
    t_hof = timed(lambda: buckets_hof(ROWS_HOF))
    results["sign_lsh_bucketing"] = {
        "dim": DIM, "planes": NUM_PLANES, "bands": NUM_BANDS,
        "arrow_rows": ROWS, "arrow_sec": round(t_arrow, 2),
        "arrow_rows_per_sec": round(ROWS / t_arrow),
        "hof_rows": ROWS_HOF, "hof_sec": round(t_hof, 2),
        "hof_rows_per_sec": round(ROWS_HOF / t_hof),
        "speedup": round((ROWS / t_arrow) / (ROWS_HOF / t_hof), 1),
    }
    print(json.dumps({"sign_lsh_bucketing": results["sign_lsh_bucketing"]}))

    # ---- pairwise cosine verification over 1M candidate pairs --------
    def pairs(n):
        v = vectors(spark, n + 1)
        a = v.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("_va"))
        b = v.select(
            (F.col("vec_id") - 1).alias("id_a"), F.col("vec").alias("_vb")
        )
        return a.join(b, "id_a")

    def cosine_arrow(n):
        force(
            pairs(n).select(
                "id_a",
                sim.cosine_pairs_udf()(F.col("_va"), F.col("_vb")).alias("cos"),
            )
        )

    def cosine_hof(n):
        force(
            pairs(n).select(
                "id_a", sim.cosine_expr(F.col("_va"), F.col("_vb")).alias("cos")
            )
        )

    cosine_arrow(10_000)
    cosine_hof(1_000)
    t_arrow = timed(lambda: cosine_arrow(ROWS))
    t_hof = timed(lambda: cosine_hof(ROWS_HOF))
    results["cosine_verification"] = {
        "dim": DIM,
        "arrow_pairs": ROWS, "arrow_sec": round(t_arrow, 2),
        "arrow_pairs_per_sec": round(ROWS / t_arrow),
        "hof_pairs": ROWS_HOF, "hof_sec": round(t_hof, 2),
        "hof_pairs_per_sec": round(ROWS_HOF / t_hof),
        "speedup": round((ROWS / t_arrow) / (ROWS_HOF / t_hof), 1),
    }
    print(json.dumps({"cosine_verification": results["cosine_verification"]}))

    os.makedirs("/root/repo/.scratch", exist_ok=True)
    with open("/root/repo/.scratch/embedding_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
