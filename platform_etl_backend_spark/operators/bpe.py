"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909 — public algorithm) as iterative grouped aggregation.

Representation. Each word's symbol sequence is one STRING of concatenated
"␣sym␣" units — ``"low"`` → ``" l  o  w  </w> "`` (every symbol wrapped in
single spaces, so adjacent units meet in a double space). This makes the
merge step a plain ``replace``: merging pair (a, b) replaces the substring
``" a  b "`` with ``" ab "``, and built-in left-to-right non-overlapping
replace semantics (identical in Spark and DuckDB) are exactly BPE's greedy
merge order — ``"a a a"`` merges to ``["aa", "a"]``, never ``["a", "aa"]``.
No fold/UDF needed, and the unit wrapping makes prefix confusion impossible
(pair (a, b) cannot match a word containing symbol ``bc``).

Training round (× n_merges):
1. split each unit-string on the double space → symbol array (map-side);
2. adjacent-pair extraction via slice-zip (map-side, overlap counted — the
   standard Sennrich convention) weighted by word frequency;
3. ONE (a, b)-keyed aggregation shuffle → the round's best pair by
   ``(cnt DESC, a ASC, b ASC)`` — a deterministic total order;
4. broadcast the 1-row best pair back and ``replace`` it into every word.

Scale shape: training runs over the DISTINCT-WORD frequency table (not the
corpus), so each round is one bounded shuffle over the vocabulary plus a
1-row broadcast; ``localCheckpoint`` per round keeps the recurrence's plan
linear (the vocabulary frame is referenced twice per round). Encoding is a
single hint-free word-keyed join of the corpus tokens against the trained
vocabulary (unbounded at 100 TB — no forced broadcast; AQE may still pick
one) followed by a per-document aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_backend_spark.operators.dedup import spread, ws_tokens

END_OF_WORD = "</w>"


def word_units(word: Column) -> Column:
    """The initial unit-string of a word: one unit per character plus the
    end-of-word marker — ``"ab"`` → ``" a  b  </w> "``."""
    return F.concat(
        F.regexp_replace(word, "(.)", " $1 "), F.lit(" " + END_OF_WORD + " ")
    )


def unit_symbols(units: Column) -> Column:
    """Symbol array of a unit-string (split on the double separator)."""
    return F.split(F.trim(units), "  ")


def bpe_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``:
    - ``merges``: (round, lhs, rhs, merged, cnt) — one row per learned
      merge in training order;
    - ``vocab``: (word, wc, units) — every distinct word with its corpus
      frequency and fully-merged unit-string (the encoder table).
    """
    words = (
        spread(df, id_col)
        .select(F.explode(ws_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select("word", "wc", word_units(F.col("word")).alias("units"))
        .localCheckpoint(eager=True)
    )
    merge_rounds: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        syms = unit_symbols(F.col("units"))
        pair = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        best = (
            words.select(F.col("wc"), F.explode(pair).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if best.isEmpty():
            # pair space exhausted (every word fully merged): stop like the
            # textbook algorithm — crossJoining the empty argmax would
            # otherwise wipe the vocabulary (caught by the hypothesis
            # property test on the ['a', 'a'] corpus)
            break
        merge_rounds.append(
            best.select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                F.concat("a", "b").alias("merged"),
                F.col("cnt").cast("bigint").alias("cnt"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("_ma"), F.lit("  "), F.col("_mb"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("_ma"), F.col("_mb"), F.lit(" "))
        words = (
            words.crossJoin(
                F.broadcast(
                    best.select(F.col("a").alias("_ma"), F.col("b").alias("_mb"))
                )
            )
            .select("word", "wc", F.replace(F.col("units"), pat, rep).alias("units"))
            .localCheckpoint(eager=True)
        )
    if not merge_rounds:  # empty corpus: no trainable pairs at all
        empty = df.sparkSession.createDataFrame(
            [], "round bigint, lhs string, rhs string, merged string, cnt bigint"
        )
        return empty, words
    return reduce(DataFrame.unionByName, merge_rounds), words


def bpe_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
) -> DataFrame:
    """Per-document BPE token statistics under a trained ``vocab``:
    (id, n_words, n_sym_before, n_sym_after) — symbol counts include the
    end-of-word marker, i.e. before = chars+1 per word. One hint-free
    word-keyed join + one per-document aggregation."""
    toks = spread(df, id_col).select(
        F.col(id_col), F.explode(ws_tokens(text_col)).alias("word")
    )
    enc = vocab.select(
        "word",
        (F.length("word") + 1).cast("bigint").alias("n_before"),
        F.size(unit_symbols(F.col("units"))).cast("bigint").alias("n_after"),
    )
    return (
        toks.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_before").cast("bigint").alias("n_sym_before"),
            F.sum("n_after").cast("bigint").alias("n_sym_after"),
        )
    )
