"""Substring-span dedup: Spark profile vs an in-memory brute-force
reference on synthetic corpora with known repeated spans.

The brute twin groups window TEXT (no hashing) and merges intervals with
a plain sweep, so agreement certifies both the rolling xxhash64 grouping
and the running-max interval merge in
``operators/substring_dedup.substring_dedup_profile``.
"""

from __future__ import annotations

import random

import pytest

from anomalydetector_spark.operators.substring_dedup import (
    duplicated_spans,
    span_hashes,
    substring_dedup_profile,
)


def _brute_profile(texts: dict[int, str], n: int, scope: str = "global"):
    """(dup_span_count, dup_tokens, total_tokens) per doc, by direct
    window-text grouping + interval sweep."""
    toks = {d: t.split() for d, t in texts.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            occ.setdefault(" ".join(ts[i : i + n]), []).append((d, i))
    flagged: dict[int, list[int]] = {d: [] for d in texts}
    for span, places in occ.items():
        dup = (
            len(places) > 1
            if scope == "global"
            else len({d for d, _ in places}) > 1
        )
        if dup:
            for d, i in places:
                flagged[d].append(i)
    out = {}
    for d, ts in toks.items():
        pos = sorted(flagged[d])
        covered = 0
        end = -1
        for p in pos:
            covered += n if p >= end else p + n - end
            end = p + n
        out[d] = (len(pos), covered, len(ts))
    return out


def _words(rng, k):
    return " ".join(f"w{rng.randrange(400)}" for _ in range(k))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    shared = _words(rng, 30)  # a 30-token phrase repeated across docs
    texts = {
        1: _words(rng, 60) + " " + shared + " " + _words(rng, 40),
        2: shared + " " + _words(rng, 80),
        3: _words(rng, 50),  # unique
        4: " ".join([_words(rng, 10), shared[: len(shared) // 2]]),  # short tail
        5: _words(rng, 5),  # shorter than n -> no windows
        6: "",  # empty
    }
    # within-doc repeat: doc 7 repeats its own 25-token phrase twice
    phrase = _words(rng, 25)
    texts[7] = phrase + " " + _words(rng, 30) + " " + phrase
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    return texts, df


def test_profile_matches_bruteforce_global(corpus):
    texts, df = corpus
    brute = _brute_profile(texts, n=20, scope="global")
    got = {
        r.doc_id: (r.dup_span_count, r.dup_tokens, r.total_tokens)
        for r in substring_dedup_profile(df, n=20).collect()
    }
    assert got == brute
    # the cross-doc 30-token phrase covers exactly 30 tokens in docs 1+2
    assert brute[1][1] >= 30 and brute[2][1] >= 30
    # the within-doc repeat is flagged under global scope
    assert brute[7][1] >= 25


def test_cross_doc_scope_ignores_within_doc_repeats(corpus):
    texts, df = corpus
    brute = _brute_profile(texts, n=20, scope="cross_doc")
    got = {
        r.doc_id: (r.dup_span_count, r.dup_tokens, r.total_tokens)
        for r in substring_dedup_profile(df, n=20, scope="cross_doc").collect()
    }
    assert got == brute
    assert got[7][1] == 0  # self-repeat not cross-doc


def test_every_doc_emitted_with_keep_gate(corpus):
    texts, df = corpus
    rows = {r.doc_id: r for r in substring_dedup_profile(df, n=20).collect()}
    assert set(rows) == set(texts)
    for d, r in rows.items():
        assert r.keep == (r.dup_token_fraction <= 0.2)
        assert 0.0 <= r.dup_token_fraction <= 1.0
    assert rows[5].total_tokens == 5 and rows[5].dup_tokens == 0
    assert rows[6].total_tokens == 0 and rows[6].dup_token_fraction == 0.0
    # doc 2 starts with the shared phrase: heavy coverage -> gated out
    assert not rows[2].keep


def test_span_hashes_geometry(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = span_hashes(df, n=4, stride=1).collect()
    assert sorted(r.pos for r in rows) == list(range(7))  # 10-4+1 windows
    assert len({r.span_hash for r in rows}) == 7  # all-distinct tokens
    strided = span_hashes(df, n=4, stride=3).collect()
    assert sorted(r.pos for r in strided) == [0, 3, 6]


def test_duplicated_spans_counts(spark):
    # two docs sharing one exact 3-token span; n=3
    df = spark.createDataFrame(
        [(1, "a b c x y z"), (2, "q r a b c")], "doc_id long, text string"
    )
    rows = duplicated_spans(df, n=3).collect()
    assert {(r.doc_id, r.pos) for r in rows} == {(1, 0), (2, 2)}
    assert all(r.occurrences == 2 and r.n_docs == 2 for r in rows)


def test_scope_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicated_spans(df, scope="nope")


def test_randomized_parity_with_bruteforce(spark):
    """Fuzz: random corpora with planted shared spans, several n values."""
    rng = random.Random(123)
    for trial in range(3):
        n = rng.choice([5, 8, 12])
        shared = _words(rng, n + rng.randrange(10))
        texts = {}
        for d in range(1, 9):
            body = _words(rng, rng.randrange(0, 60))
            if rng.random() < 0.5:
                cut = rng.randrange(0, max(1, len(body.split())))
                bt = body.split()
                body = " ".join(bt[:cut] + shared.split() + bt[cut:])
            texts[d] = body
        df = spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        )
        brute = _brute_profile(texts, n=n)
        got = {
            r.doc_id: (r.dup_span_count, r.dup_tokens, r.total_tokens)
            for r in substring_dedup_profile(df, n=n).collect()
        }
        assert got == brute, f"trial {trial} n={n}"
