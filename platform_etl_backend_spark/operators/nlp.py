"""Text-normalization pipeline for entity grounding — the engine's port of
the reference's Spark-NLP stack (X7, the 'hardest port' in SURVEY §7.3).

Reference semantics (``literature/Grounding.scala:41-104``): DocumentAssembler
→ tokenizers (split chars) → Normalizer (lowercase + cleanup regex) →
StopWordsCleaner → Stemmer → Finisher, producing ``labelN`` join keys =
sorted-distinct-joined stemmed tokens (Grounding.scala:380-400).

This port keeps the whole pipeline in Catalyst (split/lower/regexp_replace/
filter/transform + a regexp_replace-chain suffix stemmer) — deterministic,
oracle-checkable, and zero Python boundary. The stemmer is an S-stemmer
with a few Porter-style rules: weaker than a full Porter implementation but
stable; swap in a pandas_udf Porter (or the spark-nlp wheel) when exact
Spark-NLP parity is required — the surrounding contract (labelN keys) is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Greek → latin-name normalization, as in Grounding.scala:148-150 (translate
# of single chars there; spelled-out here since labels arrive romanized too).
GREEK_MAP = {
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta", "ε": "epsilon",
    "κ": "kappa", "λ": "lambda", "σ": "sigma", "τ": "tau", "ω": "omega",
}

STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
)

# (pattern, replacement) suffix rules applied in order — each token passes
# through the chain once (regexp_replace is anchored with $).
_STEM_RULES = (
    (r"sses$", "ss"),
    (r"ies$", "i"),
    (r"([^s])s$", r"$1"),
    (r"eed$", "ee"),
    (r"(at|bl|iz)ed$", r"$1e"),
    (r"ing$", ""),
    (r"ational$", "ate"),
    (r"fulness$", "ful"),
    (r"ousness$", "ous"),
)


def normalize(c: Column | str) -> Column:
    """lowercase + greek map + strip non-alphanumerics (Normalizer stage)."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.lower(c)
    for greek, latin in GREEK_MAP.items():
        out = F.regexp_replace(out, greek, latin)
    return F.regexp_replace(out, r"[^a-z0-9 ]", " ")


def tokenize(c: Column) -> Column:
    """Split on whitespace runs, dropping empties (Tokenizer stage)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def remove_stopwords(tokens: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def stem_token(t: Column) -> Column:
    """Suffix-stripping stemmer as a regexp_replace chain (Stemmer stage)."""
    out = t
    for pat, rep in _STEM_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def stem(tokens: Column) -> Column:
    return F.transform(tokens, stem_token)


def label_key(c: Column | str, exact: bool = False) -> Column:
    """``labelN`` grounding join key: normalize → tokenize → de-stop → stem →
    sorted distinct → joined (Grounding.scala:380-400 contract).

    ``exact=True`` swaps the Catalyst regexp-chain stemmer for the
    char-exact Porter pandas UDF (``operators/porter.py``) matching the
    reference's Spark-NLP Stemmer. The choice is global per pipeline run:
    LUT build and mention matching must use the same stemmer or the labelN
    join keys diverge.
    """
    clean = remove_stopwords(tokenize(normalize(c)))
    if exact:
        from platform_etl_backend_spark.operators.porter import porter_stem_tokens

        toks = porter_stem_tokens(clean)
    else:
        toks = stem(clean)
    return F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))


def duckdb_label_key_sql(col: str) -> str:
    """The SAME pipeline as DuckDB SQL (oracle mirror, generated from the
    same rule tables)."""
    expr = f"lower({col})"
    for greek, latin in GREEK_MAP.items():
        expr = f"regexp_replace({expr}, '{greek}', '{latin}', 'g')"
    expr = f"regexp_replace({expr}, '[^a-z0-9 ]', ' ', 'g')"
    toks = f"list_filter(string_split_regex(trim({expr}), '\\s+'), t -> t <> '')"
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    toks = f"list_filter({toks}, t -> NOT list_contains({sw}, t))"
    stemmed = "t"
    for pat, rep in _STEM_RULES:
        duck_rep = rep.replace("$1", "\\1")
        stemmed = f"regexp_replace({stemmed}, '{pat}', '{duck_rep}')"
    toks = f"list_transform({toks}, t -> {stemmed})"
    return f"array_to_string(list_sort(list_distinct({toks})), ' ')"
