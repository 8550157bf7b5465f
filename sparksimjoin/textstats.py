"""Text-analysis operators for training-data pipelines (beyond the
reference; task brief): language-ID heuristic, quality scoring, token
counting, document fingerprinting. All pure Column expressions
(whole-stage codegen; the DuckDB oracle re-expresses the identical
formulas in SQL)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (n-gram-free heuristic: score =
# fraction of tokens that are language stopwords)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
}

_EN_STOP = LANG_STOPWORDS["en"]


def _tokens(col: Column) -> Column:
    # same Unicode-whitespace class as WhitespaceTokenizer (Python
    # str.split() semantics) so token counts agree with the join path
    return F.filter(F.split(F.lower(col), r"(?U)[\s\x1c-\x1f]+"), lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: word-piece segments produced by splitting on
    non-alphanumerics plus one piece per 4 chars of long words."""
    words = F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda x: x != "")
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.ceil(F.length(w) / 4).cast("int"), F.lit(1)),
    )


def lang_scores(col: Column) -> dict[str, Column]:
    toks = _tokens(col)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        out[lang] = hits.cast("double") / n
    return out


def lang_id(col: Column) -> Column:
    """argmax language by stopword-hit ratio; 'und' when no profile
    scores above zero. Ties break by language code order (stable)."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    # array_max on struct compares (score, lang) lexicographically:
    # highest score wins, then the lexicographically LAST lang; invert
    # tie-break to first by sorting desc on lang below
    ordered = F.reverse(F.array_sort(pairs))
    top = ordered[0]
    return F.when(top["score"] > 0, top["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length band,
    mean word length band, alpha ratio, and English stopword ratio.
    Deterministic, SQL-expressible."""
    toks = _tokens(col)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(col), r"[^a-z]", "")).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_EN_STOP))).cast("double")
    mean_wl = F.when(n_tok > 0, (n_char - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    len_band = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.3)
    wl_band = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.4)
    alpha_ratio = F.when(n_char > 0, alpha / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    score = (
        F.lit(0.3) * len_band
        + F.lit(0.2) * wl_band
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * 4, F.lit(1.0))
    )
    return F.round(score, 6)


def fingerprint(col: Column) -> Column:
    """Canonical-form document fingerprint: lowercase, tokenize,
    dedupe, sort, rejoin, md5 — robust to token order/duplication."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(col))))
    return F.md5(canon)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_pieces"),
        lang_id(c).alias("lang"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )
