"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side expressions (no Python UDFs) so they run inside
whole-stage codegen and scale linearly with no shuffle: tokenization,
quality scoring, language ID, fingerprinting.  Each returns a Column (or
a DataFrame transformer) usable both from raw Spark and via
``pdt.mutate``-composed pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens", "token_count", "char_count", "punct_ratio", "digit_ratio",
    "whitespace_ratio", "stopword_ratio", "quality_score", "lang_id",
    "fingerprint", "doc_stats", "STOPWORDS",
]

# small deterministic stopword lists per language (heuristic lang-id)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit",
           "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour",
           "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization after trimming; empty string -> empty array."""
    t = F.regexp_replace(text, r"^\s+|\s+$", "")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def _ratio(matched_removed: Column, total: Column) -> Column:
    return F.when(total == 0, F.lit(0.0)).otherwise(
        (total - matched_removed).cast("double") / total.cast("double")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    return _ratio(
        F.length(F.regexp_replace(text, r"[\p{Punct}]", "")), F.length(text)
    )


def digit_ratio(text: Column) -> Column:
    return _ratio(F.length(F.regexp_replace(text, r"[0-9]", "")),
                  F.length(text))


def whitespace_ratio(text: Column) -> Column:
    return _ratio(F.length(F.regexp_replace(text, r"\s", "")), F.length(text))


def stopword_count(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda w: w.isin(*words))).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(text, lang).cast("double") / n.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite 0..1 heuristic quality score: favors medium-length docs
    with low punctuation/digit noise and some stopword signal."""
    n_tok = token_count(text)
    length_score = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    noise = punct_ratio(text) + digit_ratio(text)
    noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 2)
    stop_score = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round(
        length_score * 0.4 + noise_score * 0.4 + stop_score * 0.2, 6
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits
    (deterministic tie-break by language code order en<de<es<fr)."""
    counts = {lang: stopword_count(text, lang) for lang in STOPWORDS}
    best = F.lit("und")
    best_n = F.lit(-1).cast("long")
    for lang in sorted(STOPWORDS):  # de, en, es, fr
        c = counts[lang]
        is_better = c > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, c).otherwise(best_n)
    return F.when(token_count(text) == 0, F.lit("und")).otherwise(best)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case- and
    whitespace-normalized text (portable across engines)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the standard text-analysis columns."""
    t = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(t),
        "n_chars_computed": char_count(t),
        "punct_ratio": F.round(punct_ratio(t), 6),
        "stopword_ratio_en": F.round(stopword_ratio(t, "en"), 6),
        "quality": quality_score(t),
        "lang_pred": lang_id(t),
        "fp": fingerprint(t),
    })
