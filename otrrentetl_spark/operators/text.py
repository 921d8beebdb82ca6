"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in column expressions (JVM, codegen) —
token counting, quality scoring, language ID, and fingerprinting run
at full scan speed with zero Python per row. Designed for a corpus
scan at 100 TB: every function is a narrow projection over `text`,
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword tables for the heuristic language scorer. Deliberately tiny:
# the operator contract is "deterministic n-gram/stopword heuristic",
# not a trained model (those libs aren't in the image).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty text → empty array (not [''])."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish subword proxy: word pieces split from digits and symbol
# singletons — the shape GPT-style tokenizers produce, engine-portable
# (same semantics in Java regex and DuckDB's RE2).
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate LLM token count: alpha runs + single digits +
    single non-alnum symbols. Tracks real BPE counts within ~15% on
    English text — good enough for corpus budgeting/filtering, and
    fully vectorized (regexp_count, no tokenizer library)."""
    return F.regexp_count(_c(col), F.lit(BPE_PATTERN))


def punct_count(col: Column | str) -> Column:
    return F.length(_c(col)) - F.length(F.regexp_replace(_c(col), _PUNCT_CLASS, ""))


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: F.lower(t).isin(*words)))


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic ∈ [0,1]: rewards reasonable
    length, word diversity, and stopword presence; punishes heavy
    punctuation. The standard shape of cheap pre-filters in training
    pipelines (length/punct/stopword ratios)."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(tokens(c))).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, stopword_count(c).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(c).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    length_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (the n-gram-heuristic core)."""
    return {lang: stopword_count(col, lang) for lang in STOPWORDS}


def lang_id(col: Column | str) -> Column:
    """Argmax of the language scores; 'und' (undetermined) when no
    stopword hits at all. Ties break by language code order — fully
    deterministic."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(scores):  # later langs win only on strict >
        s = scores[lang]
        take = s > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, s).otherwise(best_n)
    return best


def normalize_text(col: Column | str) -> Column:
    """Canonical form for content hashing: lowercase + collapsed
    whitespace + trimmed."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint_hex(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text. md5 (not
    xxhash64) so external engines can reproduce it bit-for-bit."""
    return F.md5(normalize_text(col))


def fingerprint_long(col: Column | str) -> Column:
    """64-bit-ish numeric fingerprint: first 15 hex chars (60 bits) of
    the md5, parsed base-16 — fits a signed long, reproducible in any
    engine with md5 + base conversion."""
    return F.conv(F.substring(fingerprint_hex(col), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(col: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    char k-gram hashes → sliding window of w → min per window →
    distinct sorted set. Guarantees any shared substring of length
    ≥ k+w-1 produces a shared fingerprint — the local-similarity
    sketch exact dedup misses and MinHash only approximates.

    Single projection, no shuffle; the k-gram hash array is computed
    once (``bind``) and the window mins re-traverse it."""
    from otrrentetl_spark.functions.exprs import bind  # noqa: PLC0415 — cycle

    norm = normalize_text(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(k)),
    )
    hashes = F.transform(grams, lambda g: hash_long(g))
    return bind(
        hashes,
        lambda hs: F.sort_array(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(hs) - (w - 1), F.lit(1))
                    ),
                    lambda j: F.array_min(F.slice(hs, j, w)),
                )
            )
        ),
    )


def hash_long(col: Column | str, seed: str = "") -> Column:
    """Seeded 60-bit hash of an arbitrary string column (md5-based,
    engine-portable). Used as the MinHash permutation family."""
    c = _c(col)
    seeded = F.concat(F.lit(seed), c) if seed else c
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")
