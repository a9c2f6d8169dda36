"""DSIR importance resampling (operators/dsir — Xie et al. 2023):
hashed n-gram bucket models, exact integer weights, Gumbel top-k."""

import hashlib
import math
import random
from collections import Counter

import pyspark.sql.functions as F

from anomalydetector_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    gumbel_micro,
    hashed_gram_buckets,
    train_bucket_model,
)

B = 64  # small bucket count so collisions actually happen in tests
ALPHA = 0.5

TARGET = [
    (1, "spark query fast spark query"),
    (2, "spark join fast query plan"),
    (3, "fast spark plan"),
]
RAW = [
    (10, "spark query fast plan"),
    (11, "slow table scan slow table"),
    (12, "spark spark spark"),
    (13, ""),
    (14, None),
    (15, "query plan join"),
]


def md5_bucket(g, b=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % b


def micro(x):
    return (
        int(math.floor(x * 1e6 + 0.5))
        if x >= 0
        else -int(math.floor(-x * 1e6 + 0.5))
    )


def grams_py(text):
    ws = (text or "").lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def model_py(rows, b=B, alpha=ALPHA):
    c = Counter()
    for _, t in rows:
        c.update(md5_bucket(g, b) for g in grams_py(t))
    t_total = sum(c.values())
    denom = t_total + alpha * b
    lp = {k: micro(math.log((v + alpha) / denom)) for k, v in c.items()}
    floor = micro(math.log(alpha / denom))
    return lp, floor


def weights_py(raw_rows, target_rows, b=B, alpha=ALPHA):
    p, pf = model_py(target_rows, b, alpha)
    q, qf = model_py(raw_rows, b, alpha)
    out = {}
    for did, t in raw_rows:
        gs = [md5_bucket(g, b) for g in grams_py(t)]
        out[did] = (
            len(gs),
            sum(p.get(g, pf) - q.get(g, qf) for g in gs),
        )
    return out


def _spark_weights(spark, raw_rows, target_rows, b=B):
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id bigint, text string")
    pm, pfl = train_bucket_model(tgt, n_buckets=b)
    qm, qfl = train_bucket_model(raw, n_buckets=b)
    w = dsir_weights(raw, pm, pfl, qm, qfl, n_buckets=b)
    return w, {
        r.doc_id: (r.n_grams, r.logw_micro) for r in w.collect()
    }


def test_weights_match_pure_python(spark):
    _, got = _spark_weights(spark, RAW, TARGET)
    assert got == weights_py(RAW, TARGET)


def test_targetlike_docs_outweigh_unlike(spark):
    _, got = _spark_weights(spark, RAW, TARGET)
    assert got[10][1] > got[11][1]  # target-y grams beat never-seen grams
    assert got[13] == (0, 0) and got[14] == (0, 0)


def test_weights_fuzz(spark):
    rng = random.Random(41)
    vocab = ["spark", "query", "fast", "slow", "table", "scan", "plan",
             "join", "agg"]
    tgt = [(i, " ".join(rng.choices(vocab[:5], k=rng.randint(1, 10))))
           for i in range(15)]
    raw = [(100 + i, " ".join(rng.choices(vocab, k=rng.randint(0, 12))))
           for i in range(40)]
    _, got = _spark_weights(spark, raw, tgt)
    assert got == weights_py(raw, tgt)


def test_gumbel_topk_matches_pure_python(spark):
    w, got = _spark_weights(spark, RAW, TARGET)
    sel = {r.doc_id for r in dsir_select(w, k=3, seed=7).collect()}

    def u(did):
        h = hashlib.md5(f"{did}:7".encode()).hexdigest()[:15]
        return int(h, 16) / 1152921504606846976.0

    py = weights_py(RAW, TARGET)
    scored = sorted(
        ((lw + micro(-math.log(-math.log(u(d)))), d)
         for d, (_, lw) in py.items()),
        key=lambda t: (-t[0], t[1]),
    )
    assert sel == {d for _, d in scored[:3]}


def test_select_plan_is_take_ordered(spark):
    w, _ = _spark_weights(spark, RAW, TARGET)
    plan = (
        dsir_select(w, k=2)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_scoring_joins_are_broadcast(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    pm, pfl = train_bucket_model(tgt, n_buckets=B)
    qm, qfl = train_bucket_model(raw, n_buckets=B)
    plan = (
        dsir_weights(raw, pm, pfl, qm, qfl, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scoring = plan.split("BroadcastExchange")[0]
    assert "SortMergeJoin" not in scoring
    assert "BroadcastHashJoin" in plan


def test_partition_invariance(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id bigint, text string")

    def run(parts):
        pm, pfl = train_bucket_model(tgt.repartition(parts), n_buckets=B)
        qm, qfl = train_bucket_model(raw.repartition(parts), n_buckets=B)
        w = dsir_weights(raw.repartition(parts), pm, pfl, qm, qfl,
                         n_buckets=B)
        return sorted(map(tuple, w.collect()))

    assert run(1) == run(8)


def test_gumbel_is_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    a = [r[0] for r in df.select(gumbel_micro(F.col("doc_id"), 3)).collect()]
    b = [r[0] for r in df.select(gumbel_micro(F.col("doc_id"), 3)).collect()]
    c = [r[0] for r in df.select(gumbel_micro(F.col("doc_id"), 4)).collect()]
    assert a == b and a != c


def test_bucket_ids_in_range(spark):
    df = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    mx = df.select(
        F.explode(hashed_gram_buckets(F.col("text"), 17)).alias("b")
    ).agg(F.min("b"), F.max("b")).first()
    assert 0 <= mx[0] and mx[1] <= 16
