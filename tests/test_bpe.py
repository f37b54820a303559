from __future__ import annotations

from collections import Counter

from platform_etl_backend_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode_stats,
    bpe_train,
)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Plain-Python Sennrich reference: overlap pair counting, greedy
    left-to-right merge, ties broken (cnt DESC, a ASC, b ASC)."""
    vocab = {w: list(w) + [END_OF_WORD] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low lower lower newest newest newest newest"),
    (2, "widest widest newest newest low lowest"),
    (3, "new new news newest lower low low"),
]


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id: bigint, text: string")
    word_counts = Counter(w for _, t in CORPUS for w in t.split())
    ref_merges, ref_vocab = _ref_bpe(dict(word_counts), 6)

    merges, vocab = bpe_train(df, "doc_id", "text", n_merges=6)
    got = [(r.lhs, r.rhs, r.cnt) for r in merges.orderBy("round").collect()]
    assert got == ref_merges
    got_vocab = {
        r.word: r.units.strip().split("  ") for r in vocab.collect()
    }
    assert got_vocab == ref_vocab


def test_bpe_encode_counts(spark):
    df = spark.createDataFrame(CORPUS, "doc_id: bigint, text: string")
    word_counts = Counter(w for _, t in CORPUS for w in t.split())
    _, ref_vocab = _ref_bpe(dict(word_counts), 6)

    _, vocab = bpe_train(df, "doc_id", "text", n_merges=6)
    out = {r.doc_id: r for r in
           bpe_encode_stats(df, "doc_id", "text", vocab).collect()}
    for doc_id, text in CORPUS:
        words = text.split()
        assert out[doc_id].n_words == len(words)
        assert out[doc_id].n_sym_before == sum(len(w) + 1 for w in words)
        assert out[doc_id].n_sym_after == sum(len(ref_vocab[w]) for w in words)
    # merging genuinely compressed the symbol stream
    assert all(r.n_sym_after < r.n_sym_before for r in out.values())


def test_bpe_greedy_overlap_semantics(spark):
    """'a a a' with best pair (a,a): greedy left-to-right gives [aa, a],
    never [a, aa] — the plain-replace unit-string trick must reproduce it."""
    df = spark.createDataFrame(
        [(1, "aaa aaa aa")], "doc_id: bigint, text: string"
    )
    merges, vocab = bpe_train(df, "doc_id", "text", n_merges=1)
    m = merges.first()
    assert (m.lhs, m.rhs) == ("a", "a")  # cnt: aaa has 2 overlapping (a,a)
    units = {r.word: r.units.strip().split("  ") for r in vocab.collect()}
    assert units["aaa"] == ["aa", "a", END_OF_WORD]
    assert units["aa"] == ["aa", END_OF_WORD]
