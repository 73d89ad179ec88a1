"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (dm4ml/gate has no dedup), these are the
standard web-scale text dedup family, each expressed as pure Spark
DataFrame transformations (JVM-side codegen — no Python in the hot
path):

- exact duplicates: hash group-by on the content hash;
- MinHash + LSH: shingle -> k min-hashes -> band buckets -> bucket
  self-join for candidate pairs;
- SimHash: per-token hash bit-votes folded into a b-bit signature;
- n-gram Jaccard: exact set similarity on gram-bucket candidate pairs;
- embedding cosine near-duplicates: sign-LSH bucketing + verified
  cosine on candidates.

Scale notes (100 TB):
- every candidate-pair generator bounds bucket fan-out (a bucket with
  B members yields B^2 pairs — ``max_bucket_size`` caps it; pass an
  ``observation=`` to count dropped bucket memberships after an
  action, so the drop is measurable, not silent);
- hashes default to ``xxhash64`` (JVM, one instruction per row);
  ``hash_mode="md5"`` derives hashes from md5 hex so a DuckDB oracle
  can reproduce them bit-for-bit (correctness gate only — md5 is ~10x
  slower);
- group-bys carry (id, hash) pairs, never raw text, past the first
  shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"\s+"
# Java-regex-equivalent \s class for Python UDFs: Java's \s is ASCII-only
# ([ \t\n\x0b\f\r]) while Python's \s is Unicode-aware (NBSP,  ,
# 　, ...). Python-side tokenization must use THIS class so the
# scale paths split text identically to the Catalyst F.split paths
# (ADVICE round 5: Unicode whitespace silently diverged the two).
PY_WORD_SPLIT_RE = r"[ \t\n\x0b\f\r]+"


@dataclass
class DedupResult:
    """Near-duplicate pairs plus their audit channel.

    A plain result object (not attributes monkey-patched onto a
    DataFrame, which silently vanish after any further ``.filter`` /
    ``.select`` / serialization):

    - ``pairs`` — the near-duplicate pair DataFrame (primary output);
    - ``dropped_bucket_members`` — lazy audit of (id, band, bucket,
      bucket_size) rows excluded by the ``max_bucket_size`` cap; count
      it after an action to measure what the cap dropped;
    - ``signatures`` — the persisted signature table (MinHash path
      only); call :meth:`unpersist` once pairs are materialized, or the
      cached blocks live until the session ends.
    """

    pairs: DataFrame
    dropped_bucket_members: DataFrame
    signatures: Optional[DataFrame] = field(default=None)

    def unpersist(self) -> "DedupResult":
        if self.signatures is not None:
            self.signatures.unpersist()
        return self


def _hash64(col: Column, seed: int, mode: str) -> Column:
    """64-bit-ish hash of a string column. ``xxhash`` is the scale
    default; ``md5`` is reproducible in DuckDB via
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`` (60 bits,
    non-negative)."""
    if mode == "md5":
        salted = F.concat(F.lit(f"{seed}|"), col)
        return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    return F.xxhash64(F.lit(seed), col)


def word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-grams of a text column, as an array of strings.

    NOTE: ``transform``/``slice`` are higher-order functions —
    CodegenFallback, i.e. INTERPRETED with one boxed lambda evaluation
    per element, not codegen'd (profiled at ~60% of the whole MinHash
    signature stage). This expression form is kept for the md5 oracle
    path, which must build the exact shingle strings a SQL twin can
    reproduce; the scale path uses :func:`shingle_hash_udf`, which
    skips the strings entirely (5x measured, BENCH.md round 5)."""
    words = F.split(text, WORD_SPLIT_RE)
    if n == 1:
        return F.array_distinct(words)
    grams = F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    return F.array_distinct(grams)


def shingle_hash_udf(n: int):
    """Arrow-batched distinct word-shingle 64-bit hashes:
    ``array<long>`` per document, no shingle strings ever leave the
    Python worker. One fixed-key pandas hash pass (deterministic across
    processes/restarts) over the batch's flattened shingle set, then an
    offset split back to rows — measured 5x faster than the
    ``transform``+``slice``+``concat_ws`` HOF chain, which is
    interpreted per element (CodegenFallback). MinHash only needs A
    64-bit hash per shingle, not a particular one, so the hash-family
    swap is semantics-free; downstream permutation hashes re-hash the
    8-byte base either way."""
    import re as _re

    @F.pandas_udf("array<long>")
    def _shingles(texts: pd.Series) -> pd.Series:
        pat = _re.compile(PY_WORD_SPLIT_RE)
        flat: list = []
        counts: list = []
        for t in texts:
            if t is None:
                counts.append(0)
                continue
            ws = pat.split(t)
            m = len(ws) - n + 1
            if m <= 0:
                counts.append(0)
                continue
            sh = {" ".join(ws[i : i + n]) for i in range(m)} if n > 1 else set(ws)
            flat.extend(sh)
            counts.append(len(sh))
        if flat:
            h = (
                pd.util.hash_pandas_object(pd.Series(flat), index=False)
                .astype("int64")
                .to_numpy()
            )
        else:
            h = np.empty(0, dtype=np.int64)
        parts = np.split(h, np.cumsum(counts)[:-1]) if counts else []
        return pd.Series([p.tolist() for p in parts])

    return _shingles


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 finalizer (public-domain mixing constants):
    full-avalanche 64-bit mix of a uint64 array."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _minhash_sig_batch(
    texts: list, n: int, num_perm: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized MinHash signatures for one batch of texts: returns
    (valid mask, (n_valid x num_perm) int64 signature matrix).

    1. split each text on the Java-``\\s``-equivalent class and hash
       the batch's FLAT word list once (``hash_pandas_object`` — one
       vectorized pass; no shingle strings are ever built);
    2. shingle hash = order-dependent polynomial combine of n
       consecutive word hashes + splitmix64 avalanche, via shifted
       slices of the flat word-hash array (no per-shingle Python);
    3. per permutation p: remix with a seeded splitmix64 and take the
       per-document segmented min (``np.minimum.reduceat``).

    Duplicate shingles are NOT deduplicated — a min over a multiset
    equals the min over its support, so the signature is identical and
    the distinct-set pass (the most Python-loop-heavy part of
    :func:`shingle_hash_udf`) is skipped. MinHash needs *a*
    deterministic 64-bit hash family, not a particular one, so the
    family is semantics-free (same argument as shingle_hash_udf);
    values are deterministic across processes and restarts. Documents
    with no shingles (null text, or fewer than n words) are invalid in
    the mask — callers drop them, mirroring how explode dropped them."""
    import re as _re

    pat = _re.compile(PY_WORD_SPLIT_RE)
    flat: list = []
    counts = np.empty(len(texts), dtype=np.int64)
    for k, t in enumerate(texts):
        if t is None:
            counts[k] = 0
            continue
        ws = pat.split(t)
        flat.extend(ws)
        counts[k] = len(ws)
    m = counts - (n - 1)  # shingles per doc (<=0 -> none)
    valid = m > 0
    nv = int(np.count_nonzero(valid))
    if not nv:
        return valid, np.empty((0, num_perm), dtype=np.int64)
    wh = (
        pd.util.hash_pandas_object(pd.Series(flat), index=False)
        .to_numpy()
        .astype(np.uint64)
    )
    word_starts = np.concatenate(([0], np.cumsum(np.maximum(counts, 0))[:-1]))
    mv = m[valid]
    tot = int(mv.sum())
    # first-word flat index of every shingle: doc start + local
    # offset (concatenated arange trick — no Python loop)
    ends = np.cumsum(mv)
    first = (
        np.repeat(word_starts[valid], mv)
        + np.arange(tot, dtype=np.int64)
        - np.repeat(ends - mv, mv)
    )
    sh = np.zeros(tot, dtype=np.uint64)
    for j in range(n):  # order-dependent combine of n word hashes
        sh = sh * np.uint64(0x100000001B3) + wh[first + j]
    sh = _splitmix64(sh)
    starts = np.concatenate(([0], ends[:-1]))
    sig = np.empty((nv, num_perm), dtype=np.int64)
    for p in range(num_perm):
        x = _splitmix64(
            sh ^ np.uint64((p * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        ).view(np.int64)
        sig[:, p] = np.minimum.reduceat(x, starts)
    return valid, sig


def _minhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, n: int, num_perm: int
) -> DataFrame:
    """(id, sig) via ``mapInArrow`` over :func:`_minhash_sig_batch`:
    the signature is complete when the scan stage emits it — zero
    shuffles. mapInArrow rather than a pandas UDF because the output
    ListArray is assembled directly from the signature matrix and a
    stride-``num_perm`` offsets vector (no per-row Python lists, no
    pandas object-Series round trip — measured 1.8x on the whole
    stage)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("sig", T.ArrayType(T.LongType()))]
    )

    def gen(batches):
        for b in batches:
            texts = b.column(text_col).to_pylist()
            valid, sig = _minhash_sig_batch(texts, n, num_perm)
            nv = len(sig)
            if not nv:
                continue
            values = pa.array(sig.ravel(), type=pa.int64())
            offsets = pa.array(np.arange(nv + 1, dtype=np.int32) * num_perm)
            sig_arr = pa.ListArray.from_arrays(offsets, values)
            ids = b.column(id_col).filter(pa.array(valid))
            yield pa.RecordBatch.from_arrays(
                [ids, sig_arr],
                schema=pa.schema(
                    [pa.field(id_col, ids.type), pa.field("sig", pa.list_(pa.int64()))]
                ),
            )

    return df.select(id_col, text_col).mapInArrow(gen, out_schema)


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash"
) -> DataFrame:
    """Rows whose content appears more than once: (id, group_size).

    One groupBy on the content hash (map-side partial counts), then a
    join of the duplicated hashes back — mirrors the uniqueness
    constraint plan (constraints.py UniqueConstraint). The join strategy
    is left to AQE: duplicate sets are *usually* tiny (broadcast), but a
    wholesale re-ingestion can make them ~N rows, and a forced broadcast
    hint would turn that data-quality incident into a driver OOM.
    Hash collisions: xxhash64 at 2^64 makes false groups negligible;
    pass ``hash_mode="md5"`` for the oracle-checked variant.
    """
    h = _hash64(F.col(text_col), 0, hash_mode).alias("_h")
    hashed = df.select(F.col(id_col), h)
    groups = (
        hashed.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    return (
        hashed.join(groups, "_h")
        .select(id_col, "group_size")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    shingle_size: int = 3,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures over word shingles.

    Base-hash modes:
    - ``hash_mode="xxhash"`` (scale default): the whole signature is
      computed inside the scan stage by an Arrow ``mapInArrow`` batch
      kernel (:func:`_minhash_sig_batch`) — no shingle strings, no
      explode, no groupBy shuffle (r6; previously the shingle hashes
      were exploded and min-aggregated with ``num_perm`` JVM hash
      expressions, which made the signature stage shuffle
      |id| x |shingle| rows and pay 32 xxhash64 calls per shingle row).
    - ``hash_mode="md5"`` (oracle parity): exact shingle strings via
      :func:`word_shingles` exploded and min-aggregated per permutation
      with the md5-derived 60-bit hash a DuckDB twin reproduces
      bit-for-bit. The k hashes are k independent seeded hashes of the
      same shingle (idiomatic alternative to affine re-hashing; avoids
      64-bit overflow semantics that a SQL oracle cannot reproduce).
    """
    if hash_mode == "md5":
        pairs = df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), shingle_size)).alias("_sh"),
        )
        aggs = [
            F.min(_hash64(F.col("_sh"), i, hash_mode)).alias(f"_m{i}")
            for i in range(num_perm)
        ]
        sigs = pairs.groupBy(id_col).agg(*aggs)
        return sigs.select(
            id_col, F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
        )
    # scale path: the FULL signature is computed inside one Arrow batch
    # pass — no explode, no num_perm JVM hash exprs, no groupBy
    # shuffle; docs with no shingles are dropped, exactly as explode
    # used to drop them (measurements in OPTIMIZATION_r06.md).
    return _minhash_signatures_arrow(df, id_col, text_col, shingle_size, num_perm)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_bands: int,
    rows_per_band: int,
    max_bucket_size: int = 1000,
    bucket_mode: str = "hash",  # "hash" (scale) | "concat" (oracle parity)
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from banded LSH: (id_a, id_b, n_bands) where the
    pair collided in ``n_bands`` bands (id_a < id_b).

    Each band's slice of the signature is a bucket key; the self-join is
    per (band, bucket) so only same-bucket pairs materialize. Buckets
    larger than ``max_bucket_size`` are dropped (degenerate content —
    e.g. empty docs — would otherwise square). The drop is measurable,
    not silent: returns ``(pairs, dropped)`` where ``dropped`` is the
    lazy (id, band, bucket, bucket_size) audit of rows excluded by the
    cap; count it to audit a run. (A ``df.observe`` metric was
    rejected: AQE's empty-relation propagation can prune the
    CollectMetrics node when every bucket is dropped, which is
    precisely when the signal matters.)

    ``bucket_mode="hash"`` (the scale default) keys each bucket by
    ``xxhash64(band, slice...)`` — an 8-byte long instead of a
    concatenated string of the band's signature values. The window
    count, the self-join shuffle, and the join comparator all run on
    long keys (the round-4 uniqueness-probe lesson: string-keyed hash
    relations are memory-latency-bound). A 2^-64 bucket-hash collision
    only ever ADDS a candidate pair, which the downstream
    ``est_jaccard >= threshold`` verification filters — LSH is already
    candidate-generation + verify, so approximation lives where the
    algorithm already has it. ``bucket_mode="concat"`` keeps the exact
    string bucket a SQL oracle can reproduce (used by hash_mode="md5").
    """
    def _slice(b: int) -> list:
        return [
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]

    if bucket_mode == "hash":
        def _bucket(b: int):
            return F.xxhash64(F.lit(b), *_slice(b))
    else:
        def _bucket(b: int):
            return F.concat_ws(",", *[e.cast("string") for e in _slice(b)])

    bands = sig_df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _bucket(b).alias("bucket"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("_bb"),
    ).select(id_col, "_bb.band", "_bb.bucket")
    w = Window.partitionBy("band", "bucket")
    sized = bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
    bounded = sized.where(F.col("_bsz") <= max_bucket_size)
    left = bounded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = bounded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    pairs = left.join(right, ["band", "bucket"]).where(F.col("id_a") < F.col("id_b"))
    out = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands"))
    dropped = sized.where(F.col("_bsz") > max_bucket_size).select(
        id_col, "band", "bucket", F.col("_bsz").alias("bucket_size")
    )
    return out, dropped


def minhash_estimated_jaccard(
    sig_df: DataFrame, pairs: DataFrame, id_col: str, num_perm: int
) -> DataFrame:
    """Attach the signature-agreement Jaccard estimate to candidate
    pairs: fraction of matching minhash slots."""
    a = sig_df.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    b = sig_df.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    agree = F.size(
        F.filter(
            F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return joined.select(
        "id_a",
        "id_b",
        "n_bands",
        (agree.cast("double") / F.lit(float(num_perm))).alias("est_jaccard"),
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 32,
    num_bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "xxhash",
    max_bucket_size: int = 1000,
) -> DedupResult:
    """End-to-end MinHash-LSH near-duplicate pairs: ``result.pairs`` =
    (id_a, id_b, n_bands, est_jaccard) with est_jaccard >= threshold.

    Returns a :class:`DedupResult`; ``result.signatures`` is the
    persisted signature table — callers that materialize the pairs
    should ``result.unpersist()`` afterwards (or the cached blocks live
    until the session ends; on a cluster this would be a scratch-table
    write instead of a cache), and ``result.dropped_bucket_members`` is
    the lazy audit of rows excluded by ``max_bucket_size``.
    """
    assert num_perm % num_bands == 0, "num_perm must be divisible by num_bands"
    rows_per_band = num_perm // num_bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_size, hash_mode)
    # signatures are consumed three times (banding + both sides of the
    # estimate join); persist so raw text is shingled+hashed exactly
    # once — at scale this is the "signature table" materialization.
    sigs = sigs.persist()
    pairs, dropped = lsh_candidate_pairs(
        sigs, id_col, num_bands, rows_per_band, max_bucket_size,
        bucket_mode="concat" if hash_mode == "md5" else "hash",
    )
    est = minhash_estimated_jaccard(sigs, pairs, id_col, num_perm)
    out = est.where(F.col("est_jaccard") >= F.lit(threshold))
    return DedupResult(pairs=out, dropped_bucket_members=dropped, signatures=sigs)


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(id, simhash) b-bit SimHash over words (with multiplicity).

    Per word: one 64-bit hash; each of the b low bits votes +1/-1.
    One explode + one groupBy(id) with b small sums — all codegen.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), WORD_SPLIT_RE)).alias("_w")
    )
    h = _hash64(F.col("_w"), 0, hash_mode)
    votes = words.select(
        id_col,
        *[
            (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_b{b}")
            for b in range(bits)
        ],
    )
    sums = votes.groupBy(id_col).agg(
        *[F.sum(f"_b{b}").alias(f"_s{b}") for b in range(bits)]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"_s{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select(id_col, sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_gram_df: int = 100,
    gram_mode: str = "hash",  # "hash" (scale) | "exact" (oracle parity)
) -> DataFrame:
    """Word-n-gram Jaccard near-duplicates:
    (id_a, id_b, jaccard) with jaccard >= threshold, id_a < id_b.

    ``gram_mode="hash"`` (the scale default) replaces each gram with
    its xxhash64 right after the explode, so every downstream shuffle —
    the document-frequency groupBy, the rare-gram join, the candidate
    self-join, and the collect_set/array_intersect verification — runs
    on 8-byte longs instead of multi-word strings (the round-4
    uniqueness-probe lesson). Jaccard is then exact over 64-bit gram
    fingerprints: a cross-doc fingerprint collision (≈ |gram set|² /
    2^64 per pair) could inflate one intersection by 1 — the standard
    fingerprinting trade accepted by content-dedup systems.
    ``gram_mode="exact"`` keeps raw gram strings end to end (the
    SQL-reproducible variant the DuckDB oracle checks).

    Candidates share >= 1 gram. Grams appearing in more than
    ``max_gram_df`` docs are excluded from candidate *generation* (a
    stopword-gram joins everything to everything) but, to keep Jaccard
    exact, NOT from the intersection — each candidate doc's FULL gram
    set is gathered once (``collect_set`` over docs semi-joined down to
    candidate ids) and the exact intersection is ``array_intersect`` on
    the pair table. No stage ever self-joins the full gram table: the
    only self-join is on *rare* grams (df <= max_gram_df bounds its
    fan-out), and everything downstream is linear in candidates — a
    stopword gram present in millions of docs costs one groupBy row,
    not 10^12 join rows.
    """
    if gram_mode == "hash":
        # Arrow-batched distinct gram hashes: same 5x-over-HOF win as
        # the MinHash signature stage (BENCH.md round 5) — the
        # transform/slice/concat_ws chain is interpreted per element.
        grams = df.select(
            F.col(id_col),
            F.explode(shingle_hash_udf(n)(F.col(text_col))).alias("_g"),
        )
    else:
        grams = df.select(
            F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_g")
        )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    gram_df = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    rare = grams.join(gram_df.where(F.col("_df") <= max_gram_df), "_g")
    common = (
        rare.select(F.col(id_col).alias("id_a"), "_g")
        .join(rare.select(F.col(id_col).alias("id_b"), "_g"), "_g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common_rare"))
        .select("id_a", "id_b")
    )
    # exact intersection over FULL gram sets, but ONLY for candidate
    # docs: semi-join grams down to ids that appear in >=1 pair, gather
    # each one's gram set once, then array_intersect on the pair table.
    cand_ids = (
        common.select(F.col("id_a").alias(id_col))
        .unionByName(common.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_grams = (
        grams.join(cand_ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("_g").alias("_gs"))
    )
    out = (
        common.join(
            cand_grams.select(F.col(id_col).alias("id_a"), F.col("_gs").alias("_ga")),
            "id_a",
        )
        .join(
            cand_grams.select(F.col(id_col).alias("id_b"), F.col("_gs").alias("_gb")),
            "id_b",
        )
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sa")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_ga", "_gb")).cast("double")
                / (
                    F.col("_sa")
                    + F.col("_sb")
                    - F.size(F.array_intersect("_ga", "_gb"))
                )
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= F.lit(threshold))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    num_planes: int = 16,
    num_bands: int = 4,
    hash_mode: str = "xxhash",
    brute_force: bool = False,
    max_bucket_size: int = 1000,
) -> DedupResult:
    """Cosine near-duplicate pairs over an embedding column:
    ``result.pairs`` = (id_a, id_b, cosine) with cosine >= threshold.

    Scale path: banded sign-LSH — per band, a vector is bucketed by the
    sign pattern of ``num_planes`` deterministic pseudo-random
    hyperplanes; candidates are the union over bands of same-bucket
    pairs, exact-cosine-verified. ``num_bands`` independent signatures
    trade compute for recall exactly like MinHash banding: a pair with
    cosine c collides per band with prob (1 - acos(c)/pi)^num_planes,
    and misses only if all bands miss. Identical vectors always share
    every bucket.

    Implementation by ``hash_mode``:
    - ``"xxhash"`` (scale default): bucketing is ONE Arrow-batched
      ``(batch x dim) @ (dim x bands*planes)`` matmul per batch against
      a deterministic seeded plane matrix (built once per Python worker
      — see :func:`_plane_matrix`), and candidate verification is the
      Arrow einsum cosine. No interpreted higher-order functions
      anywhere — the old ``F.transform``/``F.aggregate`` formulation
      paid ``dim x planes x bands`` boxed multiply-adds per row.
    - ``"md5"`` (oracle mode): hash-derived plane weights folded with
      sequential ``aggregate`` expressions, bit-reproducible by the
      DuckDB twin's ``list_sum(list_transform(...))``; verification via
      the sequential-fold ``cosine_expr``. Correctness gate only.

    Scale knobs (100 TB):
    - candidate volume ~ n^2 * num_bands / 2^num_planes for unrelated
      vectors, so ``num_planes`` should grow ~log2(n): 16 planes is
      sized for ~10^5-10^6 rows; use 24-30 at 10^8-10^9.
    - ``max_bucket_size`` caps degenerate buckets (e.g. zero vectors)
      — members of larger buckets generate NO pairs; the exclusions
      are auditable via the lazy ``result.dropped_bucket_members``
      DataFrame (empty in brute-force mode).

    ``brute_force=True`` skips bucketing (exact; oracle/small-data
    mode).
    """
    from gate_spark.operators.similarity import cosine_expr, cosine_pairs_udf

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    dropped = None
    if brute_force:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        if hash_mode == "md5":
            bucketed = df.select(
                F.col(id_col),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(band).alias("band"),
                                _signature_bucket_hof(
                                    F.col(vec_col), band, num_planes, hash_mode
                                ).alias("bucket"),
                            )
                            for band in range(num_bands)
                        ]
                    )
                ).alias("_bb"),
            ).select(id_col, "_bb.band", "_bb.bucket")
        else:
            # null vectors generate no candidates (HOF parity: a null
            # bucket key never joins) and would break the batch matmul.
            # hash_mode="md5_arrow" runs the SAME Arrow matmul kernel
            # with md5-derived plane weights so a DuckDB twin can
            # rebuild the bucket keys bit-for-bit — the oracle gate for
            # the scale path itself, not just the interpreted HOF mode.
            plane_mode = "md5" if hash_mode == "md5_arrow" else "seeded"
            bucketed = df.where(F.col(vec_col).isNotNull()).select(
                F.col(id_col),
                F.posexplode(
                    _sign_buckets_udf(num_bands, num_planes, plane_mode=plane_mode)(
                        F.col(vec_col)
                    )
                ).alias("band", "bucket"),
            )
        w = Window.partitionBy("band", "bucket")
        sized = bucketed.withColumn("_bsz", F.count(F.lit(1)).over(w))
        dropped = sized.where(F.col("_bsz") > max_bucket_size).select(
            id_col, "band", "bucket", F.col("_bsz").alias("bucket_size")
        )
        bounded = sized.where(F.col("_bsz") <= max_bucket_size)
        cand = (
            bounded.select(F.col(id_col).alias("id_a"), "band", "bucket")
            .join(
                bounded.select(F.col(id_col).alias("id_b"), "band", "bucket"),
                ["band", "bucket"],
            )
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    cos = (
        cosine_expr(F.col("_va"), F.col("_vb"))
        if hash_mode == "md5"
        else cosine_pairs_udf()(F.col("_va"), F.col("_vb"))
    )
    out = pairs.select("id_a", "id_b", cos.alias("cosine"))
    out = out.where(F.col("cosine") >= F.lit(threshold))
    if dropped is None:
        dropped = df.select(
            F.col(id_col),
            F.lit(0).alias("band"),
            F.lit("").alias("bucket"),
            F.lit(0).cast("long").alias("bucket_size"),
        ).limit(0)
    return DedupResult(pairs=out, dropped_bucket_members=dropped)


@lru_cache(maxsize=32)
def _plane_matrix(dim: int, num_planes: int, seed: int) -> "np.ndarray":
    """Deterministic (dim x num_planes) hyperplane matrix, uniform in
    [-1, 1). Seeded numpy RNG -> every Python worker on every executor
    builds the SAME matrix from the same (dim, planes, seed) key; the
    lru_cache makes it once per worker process, so nothing ships over
    the wire at all (cheaper than a broadcast for O(dim x planes)
    doubles, and keeps the UDF closure picklable)."""
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=(dim, num_planes))


@lru_cache(maxsize=32)
def _plane_matrix_md5(dim: int, num_planes: int, seed: int) -> "np.ndarray":
    """Hash-derived (dim x num_planes) hyperplane matrix: entry (i, j)
    is the SAME md5-derived weight the HOF formulation uses for plane
    ``seed + j`` and dimension ``i`` (``_signature_bucket_hof``'s
    ``pmod(hash64(str(i)), 2000001)/1e6 - 1``). A DuckDB twin can
    rebuild the matrix bit-for-bit from md5 — which gives the Arrow
    matmul SCALE path an exact oracle, not just the interpreted HOF
    mode. Built once per worker via lru_cache, like _plane_matrix."""
    import hashlib

    out = np.empty((dim, num_planes), dtype=np.float64)
    for j in range(num_planes):
        s = seed + j
        for i in range(dim):
            h = int(hashlib.md5(f"{s}|{i}".encode()).hexdigest()[:15], 16)
            out[i, j] = (h % 2000001) / 1000000.0 - 1.0
    return out


def _sign_buckets_udf(
    num_bands: int, num_planes: int, seed: int = 1000, plane_mode: str = "seeded"
):
    """Arrow-batched sign-LSH bucketing: returns an ``array<long>`` of
    ``num_bands`` bucket keys per vector. All bands' plane projections
    are ONE ``(batch x dim) @ (dim x bands*planes)`` float64 matmul;
    each band's ``num_planes`` sign bits are packed into a single long
    (requires num_planes <= 62). Identical vectors always share every
    bucket; a zero vector projects to 0 on every plane and lands in the
    all-ones bucket, same as the sign convention of the HOF/oracle
    formulation (dot >= 0 -> bit 1)."""
    assert num_planes <= 62, "num_planes must fit in a signed 64-bit bucket key"
    total = num_bands * num_planes
    mk_planes = _plane_matrix_md5 if plane_mode == "md5" else _plane_matrix

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([[0] * num_bands] * len(v))
        planes = mk_planes(x.shape[1], total, seed)
        bits = (x @ planes) >= 0.0  # batch x (bands*planes)
        bits = bits.reshape(len(x), num_bands, num_planes)
        weights = 1 << np.arange(num_planes, dtype=np.int64)
        keys = (bits * weights).sum(axis=2)  # batch x bands
        return pd.Series([r.tolist() for r in keys])

    return buckets


def _signature_bucket_hof(
    vec: Column, band: int, num_planes: int, hash_mode: str
) -> Column:
    """Sign-LSH bucket key for one band — ORACLE-PARITY formulation
    (interpreted higher-order functions; the scale path is
    :func:`_sign_buckets_udf`). For plane p, the weight of dimension i
    is a deterministic hash of (band, p, i) mapped to the SYMMETRIC
    range [-1, 1) via ``pmod`` (plain ``%`` keeps the sign of a
    negative xxhash64, which would bias weights negative); the bucket
    bit is the sign of the dot product. The fold is a sequential
    ``aggregate`` over the vector — bit-reproducible in a SQL oracle's
    ``list_sum(list_transform(range(dim), ...))``."""
    dims = F.transform(vec, lambda x, i: F.struct(x.alias("v"), i.alias("i")))
    bits = []
    for p in range(num_planes):
        seed = 1000 + band * num_planes + p
        w = lambda i, _s=seed: (
            F.pmod(_hash64(i.cast("string"), _s, hash_mode), F.lit(2000001)).cast(
                "double"
            )
            / 1000000.0
            - 1.0
        )
        dot = F.aggregate(
            dims,
            F.lit(0.0),
            lambda acc, s: acc + s["v"].cast("double") * w(s["i"]),
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
