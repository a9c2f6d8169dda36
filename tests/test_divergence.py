"""Categorical window divergence: JS/TVD math, boundaries, gaps."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd

from anomalydetector_spark.operators.divergence import (
    categorical_window_divergence,
)

D0 = dt.datetime(2024, 3, 1)


def _frame(spark, day_cats):
    """day_cats: {day_index: {cat: count}} → one row per observation."""
    rows = []
    for d, cats in day_cats.items():
        for cat, n in cats.items():
            rows += [(D0 + dt.timedelta(days=d, minutes=i), cat) for i in range(n)]
    return spark.createDataFrame(rows, "ts timestamp, lang string")


def _js(p, q):
    cats = set(p) | set(q)
    out = 0.0
    for c in cats:
        pi, qi = p.get(c, 0.0), q.get(c, 0.0)
        m = (pi + qi) / 2
        if pi > 0:
            out += 0.5 * pi * math.log2(pi / m)
        if qi > 0:
            out += 0.5 * qi * math.log2(qi / m)
    return out


def test_identical_distributions_are_zero(spark):
    df = _frame(spark, {0: {"en": 6, "de": 2}, 1: {"en": 6, "de": 2}})
    row = categorical_window_divergence(df).first()
    assert row["js_divergence"] == 0.0 and row["tvd"] == 0.0
    assert row["n_categories"] == 2


def test_disjoint_distributions_hit_the_bound(spark):
    df = _frame(spark, {0: {"en": 5}, 1: {"zh": 7}})
    row = categorical_window_divergence(df).first()
    assert abs(row["js_divergence"] - 1.0) < 1e-12  # log2 JS bound
    assert row["tvd"] == 1.0


def test_first_window_and_gap_windows_are_omitted(spark):
    # days 0,1 consecutive; day 3 follows a gap (empty day 2) → omitted
    df = _frame(spark, {0: {"en": 3}, 1: {"en": 3}, 3: {"en": 3}})
    out = categorical_window_divergence(df).collect()
    assert [r["window_start"] for r in out] == [D0 + dt.timedelta(days=1)]


def test_known_values(spark):
    day0 = {"en": 6, "de": 2}      # p = (.75, .25)
    day1 = {"en": 4, "de": 4}      # q = (.5, .5)
    df = _frame(spark, {0: day0, 1: day1})
    row = categorical_window_divergence(df).first()
    tot0, tot1 = sum(day0.values()), sum(day1.values())
    p = {c: n / tot0 for c, n in day0.items()}
    q = {c: n / tot1 for c, n in day1.items()}
    assert abs(row["js_divergence"] - _js(q, p)) < 1e-12
    assert abs(row["tvd"] - 0.25) < 1e-12


def test_random_parity_with_python(spark):
    rng = np.random.default_rng(3)
    days = {}
    for d in range(6):
        cats = rng.choice(["a", "b", "c", "d"], size=rng.integers(1, 4),
                          replace=False)
        days[d] = {c: int(rng.integers(1, 9)) for c in cats}
    df = _frame(spark, days)
    got = {
        r["window_start"]: (r["js_divergence"], r["tvd"], r["n_categories"])
        for r in categorical_window_divergence(df).collect()
    }
    for d in range(1, 6):
        tot_p = sum(days[d].values())
        tot_q = sum(days[d - 1].values())
        p = {c: n / tot_p for c, n in days[d].items()}
        q = {c: n / tot_q for c, n in days[d - 1].items()}
        ws = D0 + dt.timedelta(days=d)
        js, tvd, ncat = got[ws]
        assert abs(js - _js(p, q)) < 1e-12
        cats = set(p) | set(q)
        assert abs(tvd - 0.5 * sum(abs(p.get(c, 0) - q.get(c, 0)) for c in cats)) < 1e-12
        assert ncat == len(p)
    assert D0 not in got  # first window omitted
