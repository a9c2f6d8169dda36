"""BPE subword tokenizer: distributed train + apply
(operators/bpe — Sennrich et al. 2016 merge learning)."""

import random
from collections import Counter

import pyspark.sql.functions as F

from anomalydetector_spark.operators.bpe import (
    _learn_merges_py,
    _merge_word,
    bpe_token_counts,
    learn_bpe_merges,
    segment_words,
)


def naive_learn(dictionary, num_merges, min_pair_count):
    """Recount-everything reference: the published algorithm, no index."""
    words = [(tuple(w), c) for w, c in dictionary]
    merges = []
    while len(merges) < num_merges:
        counts = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                counts[p] += c
        if not counts:
            break
        bc = max(counts.values())
        if bc < min_pair_count:
            break
        left, right = min(p for p, c in counts.items() if c == bc)
        merges.append((len(merges) + 1, left, right, left + right, bc))
        words = [(_merge_word(s, left, right), c) for s, c in words]
    return merges


def naive_segment(word, merges):
    syms = tuple(word)
    for _, left, right, _, _ in merges:
        syms = _merge_word(syms, left, right)
    return list(syms)


def test_merge_word_greedy_left_to_right():
    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_word(("x", "y", "x", "y"), "x", "y") == ("xy", "xy")
    assert _merge_word(tuple("abc"), "q", "z") == ("a", "b", "c")
    assert _merge_word(("ab", "c", "ab"), "ab", "c") == ("abc", "ab")


def test_learn_matches_naive_fuzz():
    vocab = ["aaa", "abab", "banana", "bandana", "cab", "aa", "low",
             "lower", "lowest", "newer", "wider", "x", "queue"]
    rng = random.Random(11)
    for _ in range(150):
        d = [(w, rng.randint(1, 9))
             for w in rng.sample(vocab, rng.randint(2, len(vocab)))]
        k = rng.randint(1, 10)
        mpc = rng.randint(1, 3)
        assert _learn_merges_py(list(d), k, mpc) == naive_learn(d, k, mpc)


def test_learn_stops_below_min_pair_count():
    d = [("ab", 1), ("cd", 1)]  # every pair occurs once
    assert _learn_merges_py(d, 10, 2) == []
    got = _learn_merges_py(d, 10, 1)
    assert [m[:3] for m in got] == [(1, "a", "b"), (2, "c", "d")]


def test_overlapping_pairs_counted_but_merged_nonoverlapping():
    # 'aaa' x3: pair (a,a) counts 6 (overlaps), merge yields (aa, a)
    got = _learn_merges_py([("aaa", 3)], 1, 2)
    assert got == [(1, "a", "a", "aa", 6)]


def test_spark_learn_matches_naive(spark):
    rows = [(i, " ".join(random.Random(i).choices(
        ["low", "lower", "newest", "widest", "new", "wide"], k=12)))
        for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [tuple(r) for r in learn_bpe_merges(
        docs, num_merges=12, max_train_words=100, min_pair_count=2
    ).collect()]
    wc = Counter()
    for _, t in rows:
        wc.update(t.split())
    dictionary = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert got == naive_learn(dictionary, 12, 2)


def test_max_train_words_cap_is_deterministic(spark):
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # all six words tie at count 4; the cap keeps the 3 lexicographically
    # smallest — alpha beta delta — so 'lt' (from alpha+delta... ) learning
    # must only see those
    a = [tuple(r) for r in learn_bpe_merges(
        docs, num_merges=5, max_train_words=3, min_pair_count=2).collect()]
    wc = sorted(Counter("alpha beta gamma delta epsilon zeta".split()
                        * 4).items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert a == naive_learn(wc, 5, 2)


def test_segment_round_trip_and_rank_order(spark):
    rows = [(i, w) for i, w in enumerate(
        ["lowest", "newer", "low", "wider", "aaaa", "banana"])]
    docs = spark.createDataFrame(
        [(i, f"{w} {w} filler{i}") for i, w in rows],
        "doc_id bigint, text string")
    merges_df = learn_bpe_merges(docs, num_merges=6, min_pair_count=2)
    merges = [tuple(r) for r in merges_df.collect()]
    words = spark.createDataFrame([(w,) for _, w in rows], "token string")
    seg = {r.token: (list(r.subwords), r.n_subwords)
           for r in segment_words(words, merges_df).collect()}
    for _, w in rows:
        subs, n = seg[w]
        assert "".join(subs) == w          # lossless
        assert n == len(subs)
        assert subs == naive_segment(w, merges)  # rank-order replay


def test_token_counts_empty_docs_and_partition_invariance(spark):
    rows = [(i, " ".join(["low", "lower", "newest"][: (i % 3) + 1]))
            for i in range(30)] + [(98, ""), (99, "   ")]
    merges = learn_bpe_merges(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        num_merges=4, min_pair_count=2)

    def run(parts):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = bpe_token_counts(df.repartition(parts), merges)
        return {r.doc_id: (r.n_tokens, r.n_subwords, r.subwords_per_token)
                for r in out.collect()}

    a, b = run(1), run(8)
    assert a == b
    assert len(a) == 32                      # every doc emitted
    assert a[98] == (0, 0, None)             # token-less docs kept
    assert a[99] == (0, 0, None)
    some = a[0]
    assert some[0] == 1 and some[1] >= 1     # "low" → >=1 subword


def test_zero_merges_counts_characters(spark):
    docs = spark.createDataFrame([(1, "ab cde")], "doc_id bigint, text string")
    merges = learn_bpe_merges(docs, num_merges=0)
    assert merges.count() == 0
    got = bpe_token_counts(docs, merges).collect()[0]
    assert (got.n_tokens, got.n_subwords) == (2, 5)  # chars survive unmerged
