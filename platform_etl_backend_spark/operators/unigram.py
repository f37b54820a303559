"""Unigram-LM (SentencePiece-style) subword tokenizer: seed vocabulary →
Viterbi segmentation → hard-EM cost re-estimation.

Public algorithm (Kudo 2018, "Subword Regularization"; the SentencePiece
unigram model): pieces carry costs ``-ln p(piece)``; a word's segmentation
is the piece sequence minimizing total cost, found by Viterbi DP over
character positions; training alternates segmentation (E) with piece-
probability re-estimation (M) over the corpus. The reference engine has no
tokenizer — this completes the tokenizer family next to the trainable BPE
(``operators/bpe.py``).

Spark-first shape (NOT a per-string UDF):
- Everything runs on the **word-type table** (distinct words + corpus
  frequency) — the same rollup the BPE trainer uses. Real corpora have
  millions of word types regardless of corpus size, so at 100 TB the heavy
  part stays one token-explode + one word-keyed aggregation; the DP itself
  is pure column expressions over the type table (map-side).
- The seed vocabulary (all single chars + the top-K multi-char substrings
  by corpus frequency) and its costs build with two tiny aggregations; the
  vocabulary is bounded (K + alphabet), so it rides along as a 1-row
  broadcast **map literal** — the DP does zero joins.
- The Viterbi DP unrolls statically over ``wmax`` character positions
  (bounded word length — the same bounded-rounds trick as the unrolled
  PageRank/BPE oracles), each level a LEAST over ≤ ``lmax`` candidate
  costs. Backtracking unrolls the same way. All integer micro-nat
  arithmetic: engine-portable by construction, the only transcendental is
  the portable ratio-ln inside the seed-cost derivation.

Determinism: costs are BIGINT micro-nats (floor(1e6 * portable_ln_ratio));
ties in the DP resolve to the SHORTEST last piece (the LEAST/CASE chain
evaluates candidates in fixed j order on both engines); the top-K piece
cut breaks frequency ties lexicographically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_backend_spark.functions.portable_math import portable_ln_ratio
from platform_etl_backend_spark.operators.dedup import spread, ws_tokens

UNI_WMAX = 8  # max word length the unrolled DP covers (catalog corpus: 8)
UNI_LMAX = 4  # max piece length
UNI_TOPK = 40  # multi-char pieces kept in the seed vocabulary
UNI_INF_MICRO = 10**12  # "piece not in vocab" sentinel (never wins a LEAST)
UNI_UNK_MICRO = 30_000_000  # unseen single char (~ln 1e13 nats): covers any input
COST_SCALE = 1_000_000.0


def word_types(df: DataFrame, id_col: str, text_col: str, wmax: int = UNI_WMAX) -> DataFrame:
    """(word, freq) corpus rollup; words longer than ``wmax`` fall outside
    the unrolled DP and are excluded (documented coverage boundary — raise
    ``wmax`` to widen; expression count grows linearly)."""
    return (
        spread(df, id_col)
        .select(F.explode(ws_tokens(text_col)).alias("word"))
        .where((F.col("word") != "") & (F.length("word") <= wmax))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def seed_piece_costs(
    words: DataFrame, lmax: int = UNI_LMAX, topk: int = UNI_TOPK
) -> DataFrame:
    """Seed vocabulary with costs: every single character (guarantees any
    word segments) plus the ``topk`` most frequent multi-char substrings
    (length 2..lmax), costs = -ln(freq/total) in integer micro-nats.
    Substring occurrences are position-counted and weighted by word
    frequency — the standard SentencePiece seed (suffix-array frequencies,
    here as a bounded explode because lmax is small)."""
    subs = []
    n = F.length("word")

    def _sub_at(j: int):
        # closure factory, NOT a `lambda s, j=j` default: F.transform
        # passes a 2-arg lambda (element, INDEX) — a defaulted second
        # parameter silently receives the index column
        return lambda s: F.col("word").substr(s, F.lit(j))

    for j in range(1, lmax + 1):
        # guard: Spark sequence(1, stop) with stop < 1 DESCENDS ([1, 0]) —
        # a word shorter than j must contribute no length-j pieces
        subs.append(
            F.when(
                n >= j, F.transform(F.sequence(F.lit(1), n - j + 1), _sub_at(j))
            ).otherwise(F.array().cast("array<string>"))
        )
    occ = words.select(
        F.col("freq"), F.explode(F.flatten(F.array(*subs))).alias("piece")
    ).where(F.col("piece") != "")
    pf = occ.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("freq"))
    singles = pf.where(F.length("piece") == 1)
    multis = (
        pf.where(F.length("piece") >= 2)
        .orderBy(F.desc("freq"), "piece")
        .limit(topk)
    )
    # cut lineage: the vocab table feeds BOTH the total (a broadcast agg)
    # and the output rows — without the checkpoint the substring explode +
    # top-k pipeline executes twice (once inside the broadcast build)
    vocab = singles.unionAll(multis).localCheckpoint()
    total = vocab.agg(F.sum("freq").cast("bigint").alias("total"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "freq",
        F.floor(portable_ln_ratio(F.col("total"), F.col("freq")) * F.lit(COST_SCALE))
        .cast("bigint")
        .alias("cost_micro"),
    )


def _cost_lookup(m: Column, piece: Column, j: int) -> Column:
    fallback = UNI_UNK_MICRO if j == 1 else UNI_INF_MICRO
    return F.coalesce(
        F.try_element_at(m, piece), F.lit(fallback).cast("bigint")
    )


def viterbi_segment(
    words: DataFrame,
    vocab: DataFrame,
    wmax: int = UNI_WMAX,
    lmax: int = UNI_LMAX,
) -> DataFrame:
    """Segment every word type: (word, freq, n_chars, pieces '|'-joined,
    n_pieces, cost_micro). The vocabulary arrives as a 1-row broadcast map
    (bounded size by construction), the DP is ``wmax`` static levels of
    LEAST/CASE column expressions, the backtrack is ``wmax`` more — the
    whole segmentation is map-side; zero shuffles past the inputs."""
    vmap = vocab.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("piece", "cost_micro")))
        ).alias("m")
    )
    w = words.crossJoin(F.broadcast(vmap)).withColumn(
        "n", F.length("word").cast("int")
    )

    # cost of the piece ENDING at position i with length j (1-based, fully
    # inside the word whenever j <= i <= n; positions i > n are computed
    # but provably never read — the backtrack walks down from n)
    def c(i: int, j: int) -> str:
        return f"c_{i}_{j}"

    for i in range(1, wmax + 1):
        for j in range(1, min(lmax, i) + 1):
            w = w.withColumn(
                c(i, j),
                _cost_lookup(
                    F.col("m"), F.substring(F.col("word"), i - j + 1, j), j
                ),
            )

    w = w.withColumn("best_0", F.lit(0).cast("bigint"))
    for i in range(1, wmax + 1):
        # materialize candidates as columns: best_i and bp_i then reference
        # ATTRIBUTES instead of duplicating the add expressions — keeps the
        # generated whole-stage code small (the duplicated-expression form
        # compiled noticeably slower at this unroll depth)
        names = []
        for j in range(1, min(lmax, i) + 1):
            name = f"cand_{i}_{j}"
            w = w.withColumn(name, F.col(f"best_{i - j}") + F.col(c(i, j)))
            names.append((j, name))
        w = w.withColumn(
            f"best_{i}",
            F.least(*[F.col(n) for _, n in names]) if len(names) > 1 else F.col(names[0][1]),
        )
        bp: Column | None = None
        for j, name in names:
            hit = F.col(name) == F.col(f"best_{i}")
            bp = F.when(hit, j) if bp is None else bp.when(hit, j)
        w = w.withColumn(f"bp_{i}", bp.cast("int"))

    def at(prefix: str, pos: Column) -> Column:
        """prefix_<pos> for a runtime position (bounded CASE)."""
        out: Column | None = None
        for i in range(1, wmax + 1):
            cond = pos == i
            val = F.col(f"{prefix}_{i}")
            out = F.when(cond, val) if out is None else out.when(cond, val)
        return out

    w = w.withColumn("p_0", F.col("n"))
    for k in range(1, wmax + 1):
        w = w.withColumn(
            f"l_{k}",
            F.when(F.col(f"p_{k - 1}") <= 0, F.lit(0)).otherwise(
                at("bp", F.col(f"p_{k - 1}"))
            ).cast("int"),
        )
        w = w.withColumn(f"p_{k}", (F.col(f"p_{k - 1}") - F.col(f"l_{k}")).cast("int"))
        w = w.withColumn(
            f"piece_{k}",
            F.when(
                F.col(f"l_{k}") > 0,
                F.col("word").substr(F.col(f"p_{k}") + 1, F.col(f"l_{k}")),
            ),
        )

    # backtrack emits last piece first — concat in reverse k order
    # (concat_ws skips NULL slots on both engines)
    rev = [F.col(f"piece_{k}") for k in range(wmax, 0, -1)]
    n_pieces = None
    for k in range(1, wmax + 1):
        term = (F.col(f"l_{k}") > 0).cast("int")
        n_pieces = term if n_pieces is None else n_pieces + term
    return w.select(
        "word",
        "freq",
        F.col("n").alias("n_chars"),
        F.concat_ws("|", *rev).alias("pieces"),
        n_pieces.cast("int").alias("n_pieces"),
        at("best", F.col("n")).cast("bigint").alias("cost_micro"),
    )


def em_reestimate_costs(segmented: DataFrame) -> DataFrame:
    """One hard-EM (Viterbi-EM) M-step: piece frequencies counted from the
    corpus segmentation (word-type pieces weighted by word frequency) →
    re-estimated costs -ln(freq'/total') in micro-nats. Pieces the Viterbi
    pass never used drop out — the EM prune. One piece-keyed aggregation
    plus a 1-row broadcast total."""
    occ = segmented.select(
        "freq", F.explode(F.split("pieces", r"\|")).alias("piece")
    ).where(F.col("piece") != "")
    pf = occ.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("freq"))
    total = pf.agg(F.sum("freq").cast("bigint").alias("total"))
    return pf.crossJoin(F.broadcast(total)).select(
        "piece",
        "freq",
        F.floor(portable_ln_ratio(F.col("total"), F.col("freq")) * F.lit(COST_SCALE))
        .cast("bigint")
        .alias("cost_micro"),
    )
