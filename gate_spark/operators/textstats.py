"""Text analysis operators for training-data pipelines.

Language-ID (stopword/char-class heuristic), quality scoring,
token counting (whitespace + a BPE-ish regex), and document
fingerprinting (k-gram min-hash, a winnowing-style content stamp).
Everything is a Catalyst expression — split/transform/aggregate run in
whole-stage codegen, so per-document cost is a few string scans with
no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gate_spark.operators.dedup import _hash64

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


def text_statistics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features:
    (id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
    quality_score). quality_score in [0,1] — mean of four bounded
    signals (length band, word-length band, low punctuation, stopword
    presence), the classic cheap pre-filter for web-scraped corpora."""
    text = F.col(text_col)
    words = _words(text)
    n_chars = F.length(text).cast("double")
    n_words = F.size(words).cast("double")
    avg_wl = (
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / F.greatest(n_words, F.lit(1.0))
    )
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(all_stop))
    ).cast("double")
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
    no hits at all -> 'und'). One pass, pure expressions.
    """
    text = F.col(text_col)
    words = _words(F.lower(text))
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")).cast("double")
    cjk_ratio = cjk / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    def _stopword_hits(sw: list[str]):
        # NB: F.filter lambdas must be unary — a second (default) param
        # would be bound to the element-index argument by Spark.
        return F.size(F.filter(words, lambda w: w.isin(sw))).cast("int")

    hits = {lang: _stopword_hits(sw) for lang, sw in STOPWORDS.items()}
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
    BPE-ish pre-tokenizer count (regexp_extract_all — one regex scan)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0)).alias("bpe_tokens"),
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
    equal for equal content)."""
    text = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(text) - gram_chars, F.lit(0))),
        lambda i: text.substr(i + 1, F.lit(gram_chars)),
    )
    hashes = F.transform(grams, lambda g: _hash64(g, 7, hash_mode))
    return df.select(F.col(id_col), F.array_min(hashes).alias("fingerprint"))
