"""Text analysis: tokenization, quality scoring, language ID,
fingerprinting — all as Catalyst Column expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def unique_token_count(col: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def avg_token_length(col: str | Column) -> Column:
    """Mean token length as double (null-safe for empty docs)."""
    t = tokens(col)
    return F.when(
        F.size(t) > 0,
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(t).cast("double"),
    ).otherwise(F.lit(None).cast("double"))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    t = tokens(col)
    return F.when(
        F.size(t) > 0,
        F.size(F.filter(t, lambda x: F.lower(x).isin(*[w for w in STOPWORDS[lang]])))
        .cast("double")
        / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Deterministic 0-1 quality heuristic: rewards reasonable length,
    lexical diversity and word length. A stand-in for the usual
    Gopher-style quality rules, fully expressible in Catalyst."""
    n = token_count(col).cast("double")
    uniq = unique_token_count(col).cast("double")
    awl = F.coalesce(avg_token_length(col), F.lit(0.0))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
    wl_score = F.when(
        (awl >= 3.0) & (awl <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * diversity + F.lit(0.2) * wl_score, 6
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    return {lang: stopword_ratio(col, lang) for lang in STOPWORDS}


def detect_language(col: str | Column, threshold: float = 0.0) -> Column:
    """Pick the language with the highest stopword hit-ratio; 'und'
    (undetermined) when no list scores above the threshold."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(score.alias("s"), F.lit(lang).alias("l"))
            for lang, score in scores.items()
        ]
    )
    best = F.array_max(pairs)  # struct compare: by s, then l
    return F.when(best["s"] > threshold, best["l"]).otherwise(F.lit("und"))


def normalize_text(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text
    (md5 is identical across Spark/DuckDB → oracle-checkable)."""
    return F.md5(normalize_text(col))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built with higher-order
    functions — stays inside codegen."""
    t = tokens(col)
    return F.array_distinct(
        F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))
    )
