"""Multinomial Naive Bayes classifier (operators/classifier —
McCallum & Nigam 1998 multinomial model, micro-nat exact scoring)."""

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from anomalydetector_spark.operators.classifier import (
    classification_report,
    classify_documents,
    train_naive_bayes,
)

TRAIN = [
    (1, "the cat sat on the mat", "en"),
    (2, "le chat est sur le tapis", "fr"),
    (3, "the dog ran fast", "en"),
    (4, "le chien court vite", "fr"),
    (5, "cat and dog play", "en"),
    (6, "", "en"),  # token-less training doc still counts for the prior
    (7, "mystery words here", None),  # null label: excluded from training
]
EVAL = [
    (10, "the cat ran"),
    (11, "le chat vite"),
    (12, ""),  # token-less -> prior-only argmax
    (13, "zzz unseen tokens only"),  # all-OOV
]


def pure_nb(train_rows, eval_rows, alpha=0.5, min_count=1):
    """Reference implementation: the published model, no Spark."""
    docs = [(t.lower(), l) for _, t, l in train_rows if l is not None]
    pc, nd = defaultdict(Counter), Counter()
    for t, l in docs:
        nd[l] += 1
        for w in t.split():
            pc[l][w] += 1
    tot = Counter()
    for l in pc:
        tot.update(pc[l])
    kept = {w for w, c in tot.items() if c >= min_count}
    V, N = len(kept), sum(nd.values())
    Tc = {l: sum(c for w, c in pc[l].items() if w in kept) for l in nd}

    def micro(x):  # HALF_UP (away from zero), matching BigDecimal/DuckDB
        return (
            int(math.floor(x * 1e6 + 0.5))
            if x >= 0
            else -int(math.floor(-x * 1e6 + 0.5))
        )

    prior = {l: micro(math.log(nd[l] / N)) for l in nd}
    oov = {l: micro(math.log(alpha / (Tc[l] + alpha * (V + 1)))) for l in nd}
    lp = {
        (w, l): micro(math.log((pc[l][w] + alpha) / (Tc[l] + alpha * (V + 1))))
        for l in nd
        for w in kept
        if pc[l][w] > 0
    }
    out = {}
    for did, text in eval_rows:
        ws = text.lower().split()
        scores = {
            l: prior[l]
            + sum(lp.get((w, l), oov[l]) if w in kept else oov[l] for w in ws)
            for l in nd
        }
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = best[0][1] - best[1][1] if len(best) > 1 else None
        out[did] = (len(ws), best[0][0], best[0][1], margin)
    return out


def _collect(preds):
    return {
        r.doc_id: (r.n_tokens, r.pred_label, r.log_joint_micro, r.margin_micro)
        for r in preds.collect()
    }


def test_matches_pure_python(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    evals = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    model, priors = train_naive_bayes(train, min_count=1)
    got = _collect(classify_documents(evals, model, priors))
    assert got == pure_nb(TRAIN, EVAL, min_count=1)


def test_min_count_prunes_to_oov(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    evals = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    model, priors = train_naive_bayes(train, min_count=2)
    got = _collect(classify_documents(evals, model, priors))
    assert got == pure_nb(TRAIN, EVAL, min_count=2)
    # pruning really happened: hapax tokens are absent from the model
    kept_tokens = {r.token for r in model.select("token").distinct().collect()}
    assert "sat" not in kept_tokens and "the" in kept_tokens


def test_partition_invariance(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    evals = spark.createDataFrame(EVAL, "doc_id bigint, text string")

    def run(parts):
        m, p = train_naive_bayes(train.repartition(parts))
        return _collect(classify_documents(evals.repartition(parts), m, p))

    assert run(1) == run(7)


def test_tiebreak_label_ascending(spark):
    # perfectly symmetric corpus: every class scores identically on "x"
    rows = [(1, "x", "b"), (2, "x", "a")]
    train = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    model, priors = train_naive_bayes(train)
    got = _collect(
        classify_documents(
            spark.createDataFrame([(9, "x")], "doc_id bigint, text string"),
            model,
            priors,
        )
    )
    assert got[9][1] == "a" and got[9][3] == 0


def test_single_class_margin_null(spark):
    train = spark.createDataFrame(
        [(1, "a b", "only")], "doc_id bigint, text string, lang string"
    )
    model, priors = train_naive_bayes(train)
    got = _collect(
        classify_documents(
            spark.createDataFrame([(9, "a")], "doc_id bigint, text string"),
            model,
            priors,
        )
    )
    assert got[9][1] == "only" and got[9][3] is None


def test_null_labels_excluded_from_training(spark):
    with_null = spark.createDataFrame(
        TRAIN, "doc_id bigint, text string, lang string"
    )
    without = spark.createDataFrame(
        [r for r in TRAIN if r[2] is not None],
        "doc_id bigint, text string, lang string",
    )
    ma, pa = train_naive_bayes(with_null)
    mb, pb = train_naive_bayes(without)
    assert sorted(map(tuple, ma.collect())) == sorted(map(tuple, mb.collect()))
    assert sorted(map(tuple, pa.collect())) == sorted(map(tuple, pb.collect()))


def test_training_set_separable_accuracy(spark):
    train = spark.createDataFrame(
        [r for r in TRAIN if r[2] is not None and r[1]],
        "doc_id bigint, text string, lang string",
    )
    model, priors = train_naive_bayes(train)
    rep = classification_report(train, classify_documents(train, model, priors))
    rows = {(r.actual, r.predicted): r.n_docs for r in rep.collect()}
    assert rows == {("en", "en"): 3, ("fr", "fr"): 2}


def test_adversarial_label_values(spark):
    # labels colliding with internal column names or containing
    # backticks must not break the pivot/scoring expressions
    rows = [
        (1, "x x y", "token"),
        (2, "y y z", "doc_id"),
        (3, "z z x", "we`ird"),
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    model, priors = train_naive_bayes(train)
    got = _collect(
        classify_documents(
            spark.createDataFrame([(9, "x x"), (10, "z z")],
                                  "doc_id bigint, text string"),
            model,
            priors,
        )
    )
    assert got[9][1] == "token" and got[10][1] == "we`ird"


def test_cache_off_same_results(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    evals = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    ma, pa = train_naive_bayes(train, cache=True)
    mb, pb = train_naive_bayes(train, cache=False)
    assert _collect(classify_documents(evals, ma, pa)) == _collect(
        classify_documents(evals, mb, pb)
    )


def test_model_join_is_broadcast(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    evals = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    model, priors = train_naive_bayes(train)
    plan = classify_documents(evals, model, priors)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the token-stream (scoring) path — everything above the broadcast
    # build side — must never shuffle-join; vocabulary-sized joins
    # INSIDE the model build (under BroadcastExchange) may.
    scoring_path = plan.split("BroadcastExchange")[0]
    assert "SortMergeJoin" not in scoring_path
    assert "Generate explode" in scoring_path
