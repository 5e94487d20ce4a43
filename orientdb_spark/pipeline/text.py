"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly, no UDFs) and all
exactly reproducible in ANSI SQL for the duckdb oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from orientdb_spark.pipeline.common import normalize_text, ws_tokens

# marker-token sets for the n-gram/stopword language heuristic; scoring is
# marker-hit ratio per language, argmax with lexicographic tie-break
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "de", "y", "que", "los", "una", "con"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

# BPE-ish token regex: letter runs, digit runs, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"]


def _marker_ratio(toks: Column, markers: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: per-language marker-token hit ratio, argmax
    (ties → lexicographically first language). Returns
    (id, predicted_lang, lang_score)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    scores = {lang: _marker_ratio(toks, m) for lang, m in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # build reverse when-chain so earlier (lexically first) languages win ties
    for lang in sorted(LANG_MARKERS.keys(), reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, chars."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(ws_tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document quality heuristics: length, mean word length, stopword
    ratio, punctuation ratio, and a composite score in [0,1].

    score = 0.4·min(n_tokens/100, 1)            (enough content)
          + 0.3·(1 - |mean_word_len - 5| / 5)   (natural word lengths)
          + 0.2·min(stopword_ratio·5, 1)        (function words present)
          + 0.1·(1 - min(punct_ratio·10, 1))    (not symbol soup)
    """
    t = F.col(text_col)
    toks = ws_tokens(F.lower(t))
    n_tokens = F.size(toks)
    mean_wl = F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    )
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS_EN))).cast(
        "double"
    ) / F.greatest(n_tokens, F.lit(1))
    punct_ratio = (
        F.length(t) - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    ).cast("double") / F.greatest(F.length(t), F.lit(1))
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.abs(mean_wl - 5.0) / 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.1
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of normalized text (see
    pipeline/common.normalize_text) — stable under case/punct/ws noise."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
