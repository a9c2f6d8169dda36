"""Exact median/MAD outliers: type-1 parity vs numpy-free Python,
tie/even-size semantics, the deviation-collision re-aggregation, MAD=0
degeneracy, null handling, and cube-not-sort plan shape."""

import io
import random
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from anomalydetector_spark.operators.robust import (
    mad_outliers,
    robust_median_mad,
)


def _type1_median(vals):
    s = sorted(vals)
    n = len(s)
    # min{v : 2*cum(v) >= n} == lower middle element
    return s[(n - 1) // 2]


def _py_est(rows):
    by = {}
    for g, v in rows:
        if v is not None:
            by.setdefault(g, []).append(v)
    out = {}
    for g, vals in by.items():
        med = _type1_median(vals)
        mad = _type1_median([abs(v - med) for v in vals])
        out[g] = (med, mad)
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, value double")


def test_matches_python_reference(spark):
    rng = random.Random(5)
    rows = [
        (f"g{rng.randrange(4)}", rng.choice([None, float(rng.randrange(100)) / 4]))
        for _ in range(2000)
    ]
    want = _py_est(rows)
    got = {
        r["grp"]: (r["median"], r["mad"])
        for r in robust_median_mad(_df(spark, rows), "value", by=("grp",)).collect()
    }
    assert got == want


def test_even_group_takes_lower_middle(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 100.0), ("a", 101.0)]
    (r,) = robust_median_mad(_df(spark, rows), "value", by=("grp",)).collect()
    assert r["median"] == 2.0  # lower middle, never the 51.0 average
    # devs: |1-2|=1, 0, 98, 99 -> sorted [0,1,98,99] -> lower middle 1
    assert r["mad"] == 1.0


def test_deviation_collision_reaggregated(spark):
    """median±d collide onto one deviation: 4x value 10, plus 8 and 12
    (both dev 2) and 20. devs cube must be {0:4, 2:2, 10:1}."""
    rows = [("a", 10.0)] * 4 + [("a", 8.0), ("a", 12.0), ("a", 20.0)]
    (r,) = robust_median_mad(_df(spark, rows), "value", by=("grp",)).collect()
    assert r["median"] == 10.0
    # 7 values -> median dev = 4th smallest of [0,0,0,0,2,2,10] = 0
    assert r["mad"] == 0.0


def test_outlier_flags_and_nulls(spark):
    rows = [("a", float(v)) for v in [10, 10, 10, 11, 9, 50]] + [("a", None)]
    got = {
        (r["value"], r["is_outlier"])
        for r in mad_outliers(_df(spark, rows), "value", by=("grp",), k=5.0).collect()
    }
    # median 10, MAD 0 (4 of 6 at dev 0... devs [0,0,0,1,1,40] -> type1=0)
    # -> every deviating value flags (documented MAD=0 bite)
    assert (50.0, True) in got and (10.0, False) in got
    assert (11.0, True) in got  # MAD=0 degeneracy flags ANY deviation
    assert (None, None) in got


def test_ungrouped_all_null_keeps_rows(spark):
    rows = [("a", None), ("b", None)]
    out = mad_outliers(_df(spark, rows), "value", by=(), k=3.0).collect()
    assert len(out) == 2
    assert all(r["is_outlier"] is None and r["median"] is None for r in out)


def test_plan_is_cube_not_sort(spark):
    """The estimator must aggregate BEFORE any window: the plan's first
    exchange below the scan is a hash aggregate on (grp, value), and no
    per-row Python appears anywhere."""
    rng = random.Random(1)
    rows = [(f"g{rng.randrange(3)}", float(rng.randrange(50))) for _ in range(500)]
    out = robust_median_mad(
        _df(spark, rows).repartition(8), "value", by=("grp",)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "pythonudf" not in plan.lower()
    # windows must consume the aggregated cube, so a partial_count
    # (map-side combine) appears in the plan
    assert "partial_count" in plan or "HashAggregate" in plan
