"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — at 100 TB
the text column streams through the scan with no Python in the loop.
Shared REGEX/stopword constants are consumed by both the Spark builders
and the DuckDB oracle SQL (plans/extensions.py) so the two engines
compute identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language -> stopword alternation (word-boundary regex, lowercased input)
STOPWORDS = {
    "en": r"\b(the|and|of|to|is|that|it|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "es": r"\b(el|los|que|una|por|como|para|las)\b",
    "fr": r"\b(les|et|des|est|une|dans|pour|qui)\b",
}
CJK_RANGE = r"[一-鿿]"
TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[^\w\s]"
# BPE-ish token estimate: runs of letters, runs of digits, single other chars
BPEISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), 0))


def bpeish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPEISH_RE), 0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    lower = F.lower(_c(col))
    scores = {lang: F.regexp_count(lower, F.lit(rx)) for lang, rx in STOPWORDS.items()}
    scores["zh"] = F.regexp_count(_c(col), F.lit(CJK_RANGE))
    return scores


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: CJK char presence wins, else the stopword
    alternation with the highest hit count, fixed precedence
    en > de > es > fr on ties, 'und' (undetermined) when all zero."""
    s = lang_scores(col)
    return (
        F.when(s["zh"] > 0, F.lit("zh"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def quality_features(col: Column | str) -> dict[str, Column]:
    """Raw quality signals: lengths, ratios — deterministic doubles."""
    c = _c(col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_words = F.size(F.regexp_extract_all(c, F.lit(WORD_RE), 0))
    n_punct = F.regexp_count(c, F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(c), F.lit(STOPWORDS["en"]))
    mean_word_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_words": n_words,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards in-range length, word-like
    tokens, some stopwords; penalizes punctuation soup. The exact weighting
    is a heuristic — its value is the plumbing (pure expressions, cross-
    engine reproducible), not the constants."""
    f = quality_features(col)
    len_ok = F.when((f["n_chars"] >= 100) & (f["n_chars"] <= 20000), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    wordish = F.when(f["n_tokens"] > 0, f["n_words"] / f["n_tokens"]).otherwise(F.lit(0.0))
    stop_ok = F.when(f["stopword_ratio"] > 0.02, F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.when(f["punct_ratio"] > 0.2, F.lit(0.5)).otherwise(F.lit(1.0))
    return F.round(0.25 * len_ok + 0.25 * F.least(wordish, F.lit(1.0)) + 0.25 * stop_ok + 0.25 * punct_pen, 4)


def fingerprint(col: Column | str) -> Column:
    """Deterministic 64-bit-ish document fingerprint: md5 of the
    normalized text (lowercase, non-alnum stripped, whitespace collapsed),
    first 12 hex chars as integer."""
    c = _c(col)
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return F.conv(F.substring(F.md5(norm), 1, 12), 16, 10).cast("long")


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per document with the full text-analysis surface."""
    f = quality_features(text_col)
    return df.select(
        id_col,
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        bpeish_token_count(text_col).alias("n_bpeish_tokens"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        language_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )
