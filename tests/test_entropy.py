"""Entropy + mutual information analyzers (operators/entropy): exact
integer value counts, micro-nat-quantized transcendentals, pure-python
mirror parity, and the information-theoretic identities."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.entropy import (
    column_entropy,
    mutual_information,
)


def _micro(x: float) -> int:
    return int(Decimal(repr(x)).quantize(0, rounding=ROUND_HALF_UP))


def entropy_py(values):
    vals = [v for v in values if v is not None]
    if not vals:
        return None, 0, 0
    c = Counter(vals)
    n = sum(c.values())
    s = sum(k * _micro(math.log(float(k)) * 1e6) for k in c.values())
    h = float(n * _micro(math.log(float(n)) * 1e6) - s) / float(n) / 1e6
    return h, len(c), n


def mi_py(rows):
    both = [(x, y) for x, y in rows if x is not None and y is not None]
    cxy = Counter(both)
    cx = Counter(x for x, _ in both)
    cy = Counter(y for _, y in both)
    n = len(both)
    s = 0
    for (x, y), nxy in cxy.items():
        arg = (float(nxy) * float(n)) / (float(cx[x]) * float(cy[y]))
        s += nxy * _micro(math.log(arg) * 1e6)
    return float(s) / float(n) / 1e6


@pytest.fixture(scope="module")
def tbl(spark):
    rows = []
    for i in range(3000):
        lang = ("en", "en", "en", "de", "fr", "zh")[i % 6]
        src = ("web", "wiki", "web", "news")[i % 4]
        rows.append({"doc_id": i, "lang": lang, "source": src,
                     "const": "k", "uid": f"u{i}"})
    rows.append({"doc_id": 3000, "lang": None, "source": "web",
                 "const": "k", "uid": "u3000"})
    return rows, spark.createDataFrame(pd.DataFrame(rows)).persist()


def test_entropy_matches_pure_python(tbl):
    rows, df = tbl
    got = {r.column: (r.entropy, r.n_distinct, r.n_values)
           for r in column_entropy(df, ["lang", "source", "const"]).collect()}
    for c in ("lang", "source", "const"):
        assert got[c] == entropy_py(r[c] for r in rows)


def test_entropy_extremes(tbl):
    rows, df = tbl
    got = {r.column: r for r in
           column_entropy(df, ["const", "uid"]).collect()}
    assert got["const"].entropy == 0.0  # constant column: no information
    n = got["uid"].n_values  # all-distinct id column: entropy = ln N
    assert abs(got["uid"].entropy - math.log(n)) < 1e-5
    assert got["uid"].n_distinct == n


def test_entropy_all_null_column(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [None, None]}), "a string"
    )
    r, = column_entropy(df, ["a"]).collect()
    assert r.entropy is None and r.n_distinct == 0 and r.n_values == 0


def test_entropy_partition_invariance(tbl):
    rows, df = tbl
    a = column_entropy(df.repartition(1), ["lang"]).collect()[0]
    b = column_entropy(df.repartition(16), ["lang"]).collect()[0]
    assert (a.entropy, a.n_distinct, a.n_values) == (
        b.entropy, b.n_distinct, b.n_values)


def test_mi_matches_pure_python_and_bounds(tbl):
    rows, df = tbl
    r, = mutual_information(df, "lang", "source").collect()
    exp = mi_py([(row["lang"], row["source"]) for row in rows])
    assert r.mi == exp
    both = [(row["lang"], row["source"]) for row in rows
            if row["lang"] is not None and row["source"] is not None]
    hx, _, _ = entropy_py(x for x, _ in both)
    hy, _, _ = entropy_py(y for _, y in both)
    assert (r.entropy_x, r.entropy_y) == (hx, hy)
    assert -1e-9 <= r.mi <= min(hx, hy) + 1e-5
    assert 0.0 <= r.nmi <= 1.0 + 1e-9
    assert r.n_rows == len(both)


def test_mi_perfect_dependency_equals_entropy(spark):
    # y is a function of x -> MI == H(y) (within micro-nat quantization)
    rows = [{"x": f"x{i % 10}", "y": f"y{(i % 10) // 2}"}
            for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    r, = mutual_information(df, "x", "y").collect()
    assert abs(r.mi - r.entropy_y) < 1e-5
    assert abs(r.nmi - 1.0) < 1e-4


def test_mi_independence_near_zero(spark):
    # x and y cycle with coprime periods over a full common multiple ->
    # exactly independent counts
    rows = [{"x": f"x{i % 4}", "y": f"y{i % 5}"} for i in range(2000)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    r, = mutual_information(df, "x", "y").collect()
    assert abs(r.mi) < 1e-5 and r.n_pairs == 20


def test_mi_functional_dependency_detector(tbl):
    # the FD-suggestion signal: H(B|A) = H(B) - MI; uid -> lang holds
    rows, df = tbl
    r, = mutual_information(df, "uid", "lang").collect()
    assert abs((r.entropy_y - r.mi)) < 1e-5  # H(lang|uid) ~ 0
