"""Text analysis operators for training-data pipelines.

Language-ID (stopword/char-class heuristic), quality scoring,
token counting (whitespace + a BPE-ish regex), and document
fingerprinting (k-gram min-hash, a winnowing-style content stamp).

Formulations here are chosen by measurement, not by rule (A/B at
200-word docs, ``.scratch/textstats_ab2.py``, values asserted equal):
word-length sums ride ``length(regexp_replace(text, '\\s+', ''))``
(1.55x over the HOF ``aggregate`` it replaced — CodegenFallback,
one boxed lambda per element); stopword hits deliberately KEEP the
``filter``+``isin`` HOF — Catalyst compiles the 40-literal ``isin``
to an InSet hash probe, which measured 1.47x FASTER than a
whitespace-boundary alternation regex (2.15 vs 3.16 s), so the
"HOFs are the slow path" heuristic loses to the regex engine's
backtracking constant here. Fingerprinting keeps the expression form
for the SQL-reproducible oracle modes and adds an Arrow-batched
scale mode (``hash_mode="arrow"``, 1.7x).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gate_spark.operators.dedup import _hash64
from gate_spark.session import ensure_scan_parallelism

WORD_SPLIT_RE = r"\s+"

# tiny high-precision stopword sets per language (deterministic,
# dependency-free language-ID; order = tie-break order).
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "dans"],
}
# BPE-ish pre-tokenizer: runs of letters, single digits, or single
# non-alphanumeric marks (GPT-2-style pre-split, ASCII approximation).
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"


def _words(text: Column) -> Column:
    return F.split(text, WORD_SPLIT_RE)


def _stopword_hits(words: Column, tokens: list[str]) -> Column:
    """Count of whitespace tokens equal to one of ``tokens``. Kept as
    a ``filter``+``isin`` HOF on purpose: ``isin`` over this many
    literals compiles to an InSet hash probe, measured 1.47x faster
    than the equivalent whitespace-boundary alternation regex (module
    docstring). NB ``filter`` lambdas must be unary — a second
    (default) param would bind Spark's element-index argument."""
    return F.size(F.filter(words, lambda w: w.isin(tokens)))


def text_statistics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features:
    (id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
    quality_score). quality_score in [0,1] — mean of four bounded
    signals (length band, word-length band, low punctuation, stopword
    presence), the classic cheap pre-filter for web-scraped corpora."""
    df = ensure_scan_parallelism(df)
    text = F.col(text_col)
    words = _words(text)
    n_chars = F.length(text).cast("double")
    n_words = F.size(words).cast("double")
    # sum(length(w) for w in split(text,'\s+')) == length(text minus
    # all whitespace): empty edge tokens contribute 0 either way — the
    # codegen'd form of the HOF aggregate it replaces.
    avg_wl = (
        F.length(F.regexp_replace(text, WORD_SPLIT_RE, "")).cast("double")
        / F.greatest(n_words, F.lit(1.0))
    )
    # regexp_count == size(regexp_extract_all(...)): same Java regex,
    # same non-overlapping matches, but no match-string array is ever
    # built (r6 A/B: values identical, modestly faster).
    n_punct = F.regexp_count(text, F.lit(PUNCT_RE)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = _stopword_hits(_words(F.lower(text)), all_stop).cast("double")
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1.0))
    score = (
        F.when((n_words >= 10) & (n_words <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when((avg_wl >= 2.0) & (avg_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    ) / 4.0
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_wl.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language-ID: (id, pred_lang).

    CJK-character ratio >= 0.05 -> 'zh'; otherwise the language whose
    stopword set hits the most words (ties broken alphabetically,
    no hits at all -> 'und'). One pass, pure expressions. The stopword
    probe stays the filter+isin HOF (r5 A/B: InSet beats regex 1.47x;
    re-raced in r6 against an explode+groupBy codegen formulation,
    which lost 2x to shuffle overhead once the scan parallelism guard
    is in place — numbers in OPTIMIZATION_r06.md).
    """
    df = ensure_scan_parallelism(df)
    text = F.col(text_col)
    words = _words(F.lower(text))
    # count CJK chars directly — regexp_replace built the stripped
    # string only to take its length (r6 A/B: identical values, 1.8x)
    cjk = F.regexp_count(text, F.lit(r"[一-鿿]")).cast("double")
    cjk_ratio = cjk / F.greatest(F.length(text).cast("double"), F.lit(1.0))

    hits = {
        lang: _stopword_hits(words, sw).cast("int")
        for lang, sw in STOPWORDS.items()
    }
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(STOPWORDS):  # alphabetical; strict > keeps first on ties
        better = hits[lang] > best_n
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_n = F.when(better, hits[lang]).otherwise(best_n)
    pred = F.when(cjk_ratio >= 0.05, F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace token count and a
    BPE-ish pre-tokenizer count (regexp_count — one regex scan with no
    match-array materialization; same values as
    size(regexp_extract_all(...)), r6 A/B 1.4x)."""
    df = ensure_scan_parallelism(df)
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(text)).alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_RE)).alias("bpe_tokens"),
    )


def fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    gram_chars: int = 8,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """(id, fingerprint) — min hash over character k-grams (the
    winnowing/min-sampling content stamp: stable under small edits,
    equal for equal content).

    ``hash_mode="xxhash"``/``"md5"`` build the grams with Catalyst
    ``transform`` lambdas — interpreted per gram (CodegenFallback),
    but SQL-reproducible for the DuckDB oracle. ``hash_mode="arrow"``
    is the scale path: one Arrow-batched pandas UDF hashing each
    document's distinct grams in a single vectorized pass (the
    MinHash-signature treatment, BENCH.md round 5). The min-sampling
    properties only need *a* deterministic 64-bit hash family, so the
    family swap is semantics-free; arrow-mode values differ from
    xxhash-mode values but are deterministic across processes and
    restarts."""
    df = ensure_scan_parallelism(df)
    text = F.col(text_col)
    if hash_mode == "arrow":
        return df.select(
            F.col(id_col), _gram_min_hash_udf(gram_chars)(text).alias("fingerprint")
        )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(text) - gram_chars, F.lit(0))),
        lambda i: text.substr(i + 1, F.lit(gram_chars)),
    )
    hashes = F.transform(grams, lambda g: _hash64(g, 7, hash_mode))
    return df.select(F.col(id_col), F.array_min(hashes).alias("fingerprint"))


def _gram_min_hash_udf(g: int):
    """Arrow-batched char-k-gram min-hash: ``long`` per document.
    Gram extraction matches the expression path exactly (``substr(i+1,
    g)`` for i in 0..max(len-g,0) — a short or empty document yields
    one gram, the document itself); one fixed-key hash pass over the
    batch's flattened distinct-gram set, offset-split back to rows,
    min per row. No gram strings ever leave the Python worker."""

    @F.pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        flat: list = []
        counts: list = []
        for t in texts:
            if t is None:
                counts.append(0)
                continue
            grams = {t[i : i + g] for i in range(max(len(t) - g, 0) + 1)}
            flat.extend(grams)
            counts.append(len(grams))
        if flat:
            h = (
                pd.util.hash_pandas_object(pd.Series(flat), index=False)
                .astype("int64")
                .to_numpy()
            )
        else:
            h = np.empty(0, dtype=np.int64)
        parts = np.split(h, np.cumsum(counts)[:-1]) if counts else []
        return pd.Series(
            [int(p.min()) if len(p) else None for p in parts], dtype="object"
        )

    return _fp
