"""Bigram LM with stupid backoff (operators/lm_quality.train_bigram_lm
— Brants et al. 2007 relative-frequency + fixed-penalty backoff)."""

import math
import random
from collections import Counter

import pyspark.sql.functions as F

from anomalydetector_spark.operators.lm_quality import (
    BACKOFF_PENALTY_MICRO,
    score_documents_bigram,
    train_bigram_lm,
)

REF = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran to the mat"),
    (3, "a dog sat on a rug"),
    (4, "the cat sat on a rug"),
]
EVAL = [(10, "the cat sat"), (11, "zzz qqq"), (12, ""), (13, None)]


def micro(x):
    return (
        int(math.floor(x * 1e6 + 0.5))
        if x >= 0
        else -int(math.floor(-x * 1e6 + 0.5))
    )


def r(x, nd):
    """Spark-compatible rounding: Spark's round() on a double feeds the
    SHORTEST decimal repr into BigDecimal HALF_UP, while Python's round
    uses the exact binary value — they differ on reprs ending exactly in
    '5' whose binary sits a hair below the half."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def pure_bigram(ref_rows, eval_rows, min_count=1, min_bigram_count=2,
                alpha=0.5):
    uni, pc = Counter(), Counter()
    for _, t in ref_rows:
        ws = t.lower().split()
        uni.update(ws)
        pc.update(zip(ws, ws[1:]))
    kept_u = {w: c for w, c in uni.items() if c >= min_count}
    V, T = len(kept_u), sum(kept_u.values())
    denom = T + alpha * (V + 1)
    ulp = {w: micro(math.log((c + alpha) / denom)) for w, c in kept_u.items()}
    oovlp = micro(math.log(alpha / denom))
    ctx = Counter()
    for (a, _b), c in pc.items():
        ctx[a] += c
    blp = {
        (a, b): micro(math.log(c / ctx[a]))
        for (a, b), c in pc.items()
        if c >= min_bigram_count
    }
    out = {}
    for did, t in eval_rows:
        ws = (t or "").lower().split()
        s, hits = 0, 0
        bpos = max(len(ws) - 1, 0)
        for i, w in enumerate(ws):
            u = ulp.get(w, oovlp)
            if i == 0:
                s += u
            elif (ws[i - 1], w) in blp:
                s += blp[(ws[i - 1], w)]
                hits += 1
            else:
                s += BACKOFF_PENALTY_MICRO + u
        n = len(ws)

        def hud(num, den):
            """exact HALF_UP integer ratio, the operator's 6dp scheme"""
            return (2 * num + den) // (2 * den)

        out[did] = (
            n,
            hits,
            hud((bpos - hits) * 1_000_000, bpos) / 1e6 if bpos > 0 else None,
            hud(-s, n) / 1e6 if n else None,
            r(math.exp(-s / 1e6 / n), 3) if n else None,
        )
    return out


def _run(spark, ref_rows, eval_rows, **kw):
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id bigint, text string")
    bi, lm, oov = train_bigram_lm(ref, min_count=kw.get("min_count", 1),
                                  min_bigram_count=kw.get("min_bigram_count", 2))
    return {
        r.doc_id: (r.n_tokens, r.bigram_hits, r.backoff_rate,
                   r.cross_entropy, r.pseudo_perplexity)
        for r in score_documents_bigram(ev, bi, lm, oov).collect()
    }


def test_matches_pure_python(spark):
    assert _run(spark, REF, EVAL) == pure_bigram(REF, EVAL)


def test_fuzz_random_corpora(spark):
    vocab = ["the", "cat", "dog", "sat", "ran", "on", "a", "mat", "zz"]
    rng = random.Random(13)
    ref = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
           for i in range(25)]
    ev = [(100 + i, " ".join(rng.choices(vocab + ["unk"], k=rng.randint(0, 10))))
          for i in range(40)]
    assert _run(spark, ref, ev) == pure_bigram(ref, ev)


def test_seen_bigrams_beat_backoff(spark):
    got = _run(spark, REF, [(1, "the cat sat"), (2, "sat cat the")])
    # same unigrams, but "the cat / cat sat" are frequent bigrams while
    # the reversed order backs off twice → strictly worse perplexity
    assert got[1][1] == 2 and got[2][1] == 0
    assert got[1][4] < got[2][4]


def test_empty_and_null_docs_emitted(spark):
    got = _run(spark, REF, EVAL)
    assert got[12] == (0, 0, None, None, None)
    assert got[13] == (0, 0, None, None, None)


def test_partition_invariance(spark):
    ref = spark.createDataFrame(REF, "doc_id bigint, text string")
    ev = spark.createDataFrame(EVAL[:2], "doc_id bigint, text string")

    def run(parts):
        bi, lm, oov = train_bigram_lm(ref.repartition(parts))
        return sorted(
            map(tuple,
                score_documents_bigram(ev.repartition(parts), bi, lm, oov)
                .collect()),
            key=str,
        )

    assert run(1) == run(8)


def test_scoring_joins_are_broadcast(spark):
    ref = spark.createDataFrame(REF, "doc_id bigint, text string")
    ev = spark.createDataFrame(EVAL[:2], "doc_id bigint, text string")
    bi, lm, oov = train_bigram_lm(ref)
    plan = (
        score_documents_bigram(ev, bi, lm, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scoring = plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in scoring
