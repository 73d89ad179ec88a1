"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Generates the north-rule canonical input — ``(doc_id: string,
tokens: array<int>, n_tok: int, source: string)`` — entirely with
Catalyst expressions over ``spark.range``: every field is a pure
function of the row id via seeded xxhash64, so the table is
bit-identical across runs, partitionings, and cluster sizes, and
generation itself distributes (no driver-side data, no Python UDFs).

Knobs (all deterministic fractions):
- ``heavy_frac``: share of rows in the heavy ``src0`` partition
  (Zipf-style skew — the salting/AQE test target);
- ``dup_frac``: rows that reuse the previous row's doc_id
  (uniqueness-constraint violations);
- ``mismatch_frac``: rows with n_tok != size(tokens)
  (referential-integrity violations);
- ``oov_frac``: rows whose first token is >= vocab_size
  (vocab-bounds violations);
- ``baddomain_frac``: rows with an unknown source
  (membership violations);
- ``drift_source``: one source whose token-length distribution is
  shifted x2 (PSI/KS/z-score drift target, mirroring the reference's
  drifted-last-partition fixture, tests/conftest.py:82-136).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50257
NUM_SOURCES = 20
# token values are sliced out of a seeded pool instead of hashed
# per-element: higher-order functions (F.transform) evaluate
# INTERPRETED with boxed arithmetic — jstack of the 16M-row generate
# job showed every executor thread in ArrayTransform.nullSafeEval /
# BoxesRunTime, i.e. ~n_tok boxed xxhash evals per row and massive
# young-gen churn. A slice of a pool literal is one array copy per row.
#
# Pool size matters beyond the generator itself: the literal is part of
# the plan, the plan rides in every TASK BINARY, and a cached
# DataFrame's InMemoryTableScan keeps its full lineage (for partition
# recompute) — so every downstream stage scanning the cache re-ships
# and Java-deserializes the literal per task. jstack of the round-3
# 64M x local[8] run caught the "distribution" stage's executor
# threads inside ObjectInputStream.readArray on a 1.4 MB task binary;
# at 8 cores that fixed per-task tax costs 4x the wall-clock it costs
# at 32. 4k entries (16 KB) keeps the statistical shape (slices just
# overlap more — irrelevant to length/vocab/hash validation) and drops
# the task binary by ~10x.
POOL_SIZE = 1 << 12


def _u(id_col: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) from the row id."""
    return (F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)


def token_table(
    spark: SparkSession,
    num_rows: int,
    *,
    seed: int = 42,
    vocab_size: int = VOCAB_SIZE,
    num_sources: int = NUM_SOURCES,
    heavy_frac: float = 0.5,
    dup_frac: float = 0.0,
    mismatch_frac: float = 0.0,
    oov_frac: float = 0.0,
    baddomain_frac: float = 0.0,
    drift_source: str | None = None,
    mean_len: float = 128.0,
    sigma: float = 1.0,
    max_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic token table of ``num_rows`` sequences."""
    rng = spark.range(0, num_rows, numPartitions=num_partitions)
    rid = F.col("id")

    # source: heavy_frac of rows -> src0; rest uniform over src1..srcN-1
    u_src = _u(rid, seed + 1)
    source = F.when(u_src < heavy_frac, F.lit("src0")).otherwise(
        F.concat(
            F.lit("src"),
            (F.pmod(F.xxhash64(rid, F.lit(seed + 2)), F.lit(num_sources - 1)) + 1).cast(
                "string"
            ),
        )
    )
    if baddomain_frac > 0:
        source = F.when(
            _u(rid, seed + 3) < baddomain_frac, F.lit("srcUNKNOWN")
        ).otherwise(source)

    # length: clipped lognormal via Box-Muller from two seeded uniforms
    mu = math.log(mean_len)
    u1 = F.greatest(_u(rid, seed + 4), F.lit(1e-9))
    u2 = _u(rid, seed + 5)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    log_len = F.lit(mu) + F.lit(sigma) * z
    if drift_source is not None:
        log_len = F.when(source == drift_source, log_len + math.log(2.0)).otherwise(
            log_len
        )
    length = F.least(
        F.greatest(F.exp(log_len).cast("int"), F.lit(1)), F.lit(max_len)
    )

    # one JVM-side array Literal (np.ndarray -> functions.lit builds a
    # single Literal node, NOT a 64k-child CreateArray; and unlike a
    # broadcast-join pool column it is never copied into per-row
    # UnsafeRow buffers)
    pool = np.random.RandomState(seed + 6).randint(
        0, vocab_size, size=POOL_SIZE + max_len + 1, dtype=np.int32
    )
    start = F.pmod(F.xxhash64(rid, F.lit(seed + 6)), F.lit(POOL_SIZE)) + 1
    tokens = F.slice(F.lit(pool), start, length)
    if oov_frac > 0:
        tokens = F.when(
            _u(rid, seed + 7) < oov_frac,
            F.concat(F.array(F.lit(int(vocab_size + 123))), tokens),
        ).otherwise(tokens)

    n_tok = F.size(tokens)
    if mismatch_frac > 0:
        n_tok = F.when(_u(rid, seed + 8) < mismatch_frac, n_tok + 1).otherwise(n_tok)

    doc_src = F.when(
        (F.lit(dup_frac > 0)) & (_u(rid, seed + 9) < dup_frac) & (rid > 0),
        rid - 1,
    ).otherwise(rid)
    doc_id = F.format_string("doc-%012d", doc_src)

    return rng.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.cast("int").alias("n_tok"),
        source.alias("source"),
    )


def write_token_table(
    spark: SparkSession, path: str, num_rows: int, partition_by_source: bool = True, **knobs
) -> None:
    """Materialize the table as parquet, partitioned by ``source`` so
    the engine's partition-pruned incremental reads work (Iceberg
    partition-spec analogue; parquet fallback per SURVEY.md §7.1)."""
    df = token_table(spark, num_rows, **knobs)
    w = df.write.mode("overwrite")
    if partition_by_source:
        w = w.partitionBy("source")
    w.parquet(path)
