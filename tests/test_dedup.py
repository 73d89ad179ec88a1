"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup — synthetic corpus with planted duplicates."""

import pytest
from pyspark.sql import functions as F

from gate_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat near the old oak door beside the garden wall"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 20 distinct docs
    for i in range(20):
        rows.append((i, f"document number {i} " + BASE + f" unique suffix {i} " * 3))
    # exact duplicates of docs 0 and 1
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1]))
    # near-duplicate of doc 2 (one word changed)
    rows.append((102, rows[2][1].replace("garden", "forest")))
    # unrelated doc
    rows.append((103, "completely different content about spark query engines"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates(corpus):
    out = dd.exact_duplicates(corpus, "doc_id", "text").toPandas()
    assert set(out["doc_id"]) == {0, 100, 1, 101}
    assert (out["group_size"] == 2).all()


@pytest.mark.parametrize("hash_mode", ["xxhash", "md5"])
def test_minhash_finds_planted_pairs(corpus, hash_mode):
    pairs = dd.minhash_dedup(
        corpus, "doc_id", "text",
        num_perm=32, num_bands=8, threshold=0.6, hash_mode=hash_mode,
    ).pairs.toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 100) in found
    assert (1, 101) in found
    assert (2, 102) in found  # near-dup shares most shingles
    # exact dups estimate jaccard 1.0
    exact = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 100)]
    assert (exact["est_jaccard"] == 1.0).all()
    # the unrelated doc pairs with nothing
    assert 103 not in set(pairs["id_a"]) | set(pairs["id_b"])


def test_simhash_equal_for_equal_content(corpus):
    sh = dd.simhash(corpus, "doc_id", "text", bits=32).toPandas()
    m = dict(zip(sh["doc_id"], sh["simhash"]))
    assert m[0] == m[100]
    assert m[1] == m[101]
    # near-dup differs in few bits
    diff_bits = bin(m[2] ^ m[102]).count("1")
    assert diff_bits <= 6
    # unrelated doc differs in many bits from doc 0
    assert bin(m[0] ^ m[103]).count("1") > 6


def test_ngram_jaccard_exact_values(corpus):
    pairs = dd.ngram_jaccard_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.4
    ).toPandas()
    lookup = {
        tuple(sorted((a, b))): j
        for a, b, j in zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])
    }
    assert lookup[(0, 100)] == 1.0
    assert 0.4 <= lookup[(2, 102)] < 1.0


def test_ngram_gram_modes_agree(corpus):
    """gram_mode="hash" (64-bit gram fingerprints, long-keyed shuffles)
    must produce the same pairs and jaccard values as gram_mode="exact"
    (raw gram strings) on real text — collisions are a 2^-64 event."""
    kw = dict(n=3, threshold=0.4)
    exact = dd.ngram_jaccard_pairs(
        corpus, "doc_id", "text", gram_mode="exact", **kw
    ).toPandas()
    hashed = dd.ngram_jaccard_pairs(
        corpus, "doc_id", "text", gram_mode="hash", **kw
    ).toPandas()
    key = lambda df: {
        tuple(sorted((a, b))): round(j, 12)
        for a, b, j in zip(df["id_a"], df["id_b"], df["jaccard"])
    }
    assert key(exact) == key(hashed)


def test_shingle_hash_udf_matches_expr_shingles(spark, corpus):
    """The Arrow-batched shingle hasher (scale path) must produce the
    same per-document distinct-shingle SET SIZE as the expression path
    on real text and whitespace edge cases — same split regex, same
    n-gram windows, so the hashed set is a bijection of the string
    set."""
    edge = spark.createDataFrame(
        [
            (200, ""),
            (201, None),
            (202, "one two"),  # fewer than n words
            (203, "  leading and trailing  "),
            (204, "tabs\tand\nnewlines  between   words here"),
            (205, "a a a a a a"),  # degenerate repeats collapse
        ],
        ["doc_id", "text"],
    )
    df = corpus.unionByName(edge)
    expr_sizes = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(dd.word_shingles(F.col("text"), 3)).alias("n")
        ).collect()
    }
    arrow_sizes = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(dd.shingle_hash_udf(3)(F.col("text"))).alias("n")
        ).collect()
    }
    # null text: expr gives null/-1 (size of null array), arrow gives
    # 0 — all mean "no shingles"; normalize
    norm = lambda d: {k: max(v or 0, 0) for k, v in d.items()}
    assert norm(arrow_sizes) == norm(expr_sizes)


def test_lsh_bucket_modes_agree(corpus):
    """bucket_mode="hash" (xxhash64 long bucket keys, the scale
    default) must generate the same candidate pairs with the same
    band-collision counts as bucket_mode="concat" (oracle-parity string
    buckets): equal signature slices hash equally, and a cross-slice
    64-bit collision is a 2^-64 event that could only ADD a pair."""
    sigs = dd.minhash_signatures(corpus, "doc_id", "text", num_perm=32)
    sigs = sigs.cache()
    try:
        out = {}
        for mode in ("hash", "concat"):
            pairs, dropped = dd.lsh_candidate_pairs(
                sigs, "doc_id", num_bands=8, rows_per_band=4, bucket_mode=mode
            )
            pdf = pairs.toPandas()
            assert dropped.count() == 0
            out[mode] = {
                (a, b): n
                for a, b, n in zip(pdf["id_a"], pdf["id_b"], pdf["n_bands"])
            }
        assert out["hash"] == out["concat"]
        assert out["hash"]  # non-trivial: the planted dups collide
    finally:
        sigs.unpersist()


def test_gram_df_cap_drops_stopword_grams(spark):
    # every doc shares the same 3-gram; cap=1 removes it from candidate
    # generation, so no pairs survive
    rows = [(i, f"shared common gram unique{i} tail{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    none = dd.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.01, max_gram_df=1)
    assert none.count() == 0


def test_embedding_near_duplicates(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.rand(10, 8).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(10)]
    rows.append((100, (base[0] + 1e-4).tolist()))  # near-dup of 0
    df = spark.createDataFrame(rows, ["vec_id", "vec"])
    out = dd.embedding_near_duplicates(
        df, "vec_id", "vec", threshold=0.999, brute_force=True
    ).pairs.toPandas()
    assert {(a, b) for a, b in zip(out["id_a"], out["id_b"])} == {(0, 100)}
    lsh = dd.embedding_near_duplicates(
        df, "vec_id", "vec", threshold=0.999, num_planes=4
    ).pairs.toPandas()
    assert (0, 100) in {(a, b) for a, b in zip(lsh["id_a"], lsh["id_b"])}


def test_embedding_near_dup_null_vectors(spark):
    """Null embedding vectors generate no candidates and no crashes in
    the Arrow scale path (HOF parity: a null bucket key never joins)."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.rand(6, 8).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(6)]
    rows.append((100, base[0].tolist()))  # exact dup of 0
    rows.append((999, None))
    df = spark.createDataFrame(rows, "vec_id int, vec array<float>")
    out = dd.embedding_near_duplicates(
        df, "vec_id", "vec", threshold=0.999, num_planes=4
    ).pairs.toPandas()
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert (0, 100) in got
    assert not any(999 in p for p in got)


def test_cosine_topk_null_vectors(spark):
    import numpy as np

    from gate_spark.operators import similarity as sim

    rng = np.random.RandomState(4)
    rows = [(i, rng.rand(8).tolist()) for i in range(10)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "vec_id int, vec array<double>")
    out = sim.cosine_topk(
        df, df.where("vec_id < 2"),
        corpus_id="vec_id", corpus_vec="vec",
        query_id="vec_id", query_vec="vec", k=3,
    ).toPandas()
    assert len(out) == 6  # 2 queries x k
    assert 999 not in set(out["neighbor_id"])
