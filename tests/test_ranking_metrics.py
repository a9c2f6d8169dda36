"""Exact ROC-AUC + average precision (operators/evaluate.
ranking_metrics): Mann-Whitney integer form vs sklearn-free pure-python
mirrors, tie handling, degenerate classes, partition invariance."""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from anomalydetector_spark.operators.evaluate import ranking_metrics


def _micro(x: float) -> int:
    return int(Decimal(repr(x)).quantize(0, rounding=ROUND_HALF_UP))


def auc_py(pairs):
    """Exact pairwise AUC: P(s+ > s-) + 0.5*P(s+ = s-), by counting."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return float(num2) / float(2 * len(pos) * len(neg))


def ap_py(pairs):
    """Step-definition AP at tie-group granularity, micro-quantized per
    group like the operator."""
    from collections import Counter

    cp = Counter(s for s, y in pairs if y == 1)
    cn = Counter(s for s, y in pairs if y == 0)
    P = sum(cp.values())
    if P == 0:
        return None
    tp = fp = 0
    s_sum = 0
    for s in sorted(set(cp) | set(cn), reverse=True):
        tp += cp.get(s, 0)
        fp += cn.get(s, 0)
        if cp.get(s, 0) > 0:
            s_sum += _micro(
                float(cp[s]) * float(tp) / float(tp + fp) * 1e6
            )
    return float(s_sum) / 1e6 / float(P)


def _run(spark, pairs, repartition=None):
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["score", "label"]),
        "score double, label int",
    )
    if repartition:
        df = df.repartition(repartition)
    r, = ranking_metrics(df).collect()
    return r


def test_matches_pure_python_with_ties(spark):
    rng = random.Random(11)
    # quantized scores force heavy ties
    pairs = [
        (round(rng.gauss(2.0 + y, 1.0), 1), y)
        for y in (0, 1) for _ in range(300)
    ]
    r = _run(spark, pairs)
    assert r.auc == auc_py(pairs)
    assert r.average_precision == ap_py(pairs)
    assert r.n_pos == 300 and r.n_neg == 300
    assert 0.5 < r.auc < 1.0  # positives genuinely score higher


def test_perfect_and_inverted_ranking(spark):
    pairs = [(float(i), 1) for i in range(10, 20)]
    pairs += [(float(i), 0) for i in range(10)]
    r = _run(spark, pairs)
    assert r.auc == 1.0 and r.average_precision == 1.0
    r_inv = _run(spark, [(-s, y) for s, y in pairs])
    assert r_inv.auc == 0.0


def test_all_tied_scores_auc_half(spark):
    pairs = [(5.0, y) for y in (0, 1) * 50]
    r = _run(spark, pairs)
    assert r.auc == 0.5 and r.n_scores == 1
    # AP at a single all-tied group = prevalence
    assert r.average_precision == ap_py(pairs) == 0.5


def test_degenerate_single_class(spark):
    r = _run(spark, [(1.0, 1), (2.0, 1)])
    assert r.auc is None and r.average_precision is not None
    r0 = _run(spark, [(1.0, 0), (2.0, 0)])
    assert r0.auc is None and r0.average_precision is None


def test_null_nan_excluded_and_partition_invariant(spark):
    rng = random.Random(3)
    pairs = [
        (round(rng.gauss(1.0 + y, 0.7), 2), y)
        for y in (0, 1) for _ in range(200)
    ]
    noisy = pairs + [(float("nan"), 1), (None, 0), (1.0, None)]
    df = pd.DataFrame(noisy, columns=["score", "label"])
    spark_df = spark.createDataFrame(df, "score double, label int")
    a, = ranking_metrics(spark_df.repartition(1)).collect()
    b, = ranking_metrics(spark_df.repartition(16)).collect()
    assert tuple(a) == tuple(b)
    assert a.auc == auc_py(pairs) and a.average_precision == ap_py(pairs)
    assert a.n_pos == 200 and a.n_neg == 200


def test_partitioned_series(spark):
    pairs_a = [(float(i % 7), 1 if i % 3 == 0 else 0) for i in range(60)]
    pairs_b = [(float(i % 5), 1 if i % 4 == 0 else 0) for i in range(40)]
    rows = [("a", s, y) for s, y in pairs_a] + [("b", s, y) for s, y in pairs_b]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "score", "label"]),
        "series string, score double, label int",
    )
    got = {r.series: r for r in
           ranking_metrics(df, part_cols=["series"]).collect()}
    assert got["a"].auc == auc_py(pairs_a)
    assert got["b"].auc == auc_py(pairs_b)
    assert got["a"].average_precision == ap_py(pairs_a)
