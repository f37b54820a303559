"""Text analysis operators: language-ID, quality scoring, token counting,
all pure Catalyst (built-in string/array functions, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_backend_spark.operators.dedup import ws_tokens

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Order matters: ties resolve to the earlier language (deterministic).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "des", "un"),
    "zh": ("de5", "shi4", "le5"),  # romanized placeholders
}

# A BPE-ish pre-tokenization regex: letter runs, digit runs, or single
# non-alphanumeric marks (the common GPT-2-style contract, simplified).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(text: Column | str) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count), both bigint."""
    c = F.col(text) if isinstance(text, str) else text
    ws = F.size(ws_tokens(c)).cast("bigint")
    bpe = F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)).cast("bigint")
    return ws, bpe


def stopword_hits(tokens: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(words, F.lower(t))))


def langid_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Per-language stopword-hit counts + deterministic argmax prediction."""
    toks = ws_tokens(text_col)
    out = df
    for lang in LANG_STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(toks, lang))
    pred = None
    langs = list(LANG_STOPWORDS)
    # argmax with first-wins tie-break, built as a reversed when-chain
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    for lang in langs:
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    out = out.withColumn("pred_lang", F.when(best <= 0, "unk").otherwise(pred))
    return out


def quality_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Length / word-length / stopword-ratio quality features + bucket."""
    toks = ws_tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_char = F.length(F.trim(F.col(text_col))).cast("bigint")
    # mean word length ignoring separators
    mean_wlen = F.round((n_char - (n_tok - 1)).cast("double") / n_tok, 6)
    stop = stopword_hits(toks, "en")
    stop_ratio = F.round(stop.cast("double") / n_tok, 6)
    bucket = (
        F.when((n_tok < 5) | (mean_wlen < 2), "low")
        .when(stop_ratio > 0.05, "high")
        .otherwise("mid")
    )
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_trim": n_char,
            "mean_word_len": mean_wlen,
            "stopword_ratio": stop_ratio,
            "quality_bucket": bucket,
        }
    )
