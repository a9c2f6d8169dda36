"""Funnel + cohort retention: greedy-leftmost matching parity vs pure
Python, gap-split behavior, conversion arithmetic, and exact cohort
fractions."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.funnels import (
    cohort_retention,
    funnel_counts,
    session_funnel,
)

T0 = dt.datetime(2024, 1, 1)
GAP_S = 4 * 3600
STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _py_reached(types, steps):
    i = 0
    for t in types:
        if i < len(steps) and t == steps[i]:
            i += 1
    return i


def test_greedy_leftmost_matches_python(spark):
    rng = random.Random(41)
    rows = []
    eid = 0
    for u in range(15):
        for _ in range(rng.randrange(1, 30)):
            rows.append(
                (
                    eid,
                    u,
                    T0 + dt.timedelta(seconds=rng.randrange(86400 * 5)),
                    rng.choice(["view", "click", "purchase", "error", "signup"]),
                )
            )
            eid += 1
    df = _ev(spark, rows)
    got = {
        (r["user_id"], r["session_index"]): r["reached"]
        for r in session_funnel(
            df, STEPS, gap_seconds=GAP_S, tiebreak_cols=["event_id"]
        ).collect()
    }
    # python reference: sessionize by the same rule, then greedy match
    by_u = {}
    for eid_, u, ts, t in rows:
        by_u.setdefault(u, []).append((ts, eid_, t))
    want = {}
    for u, evs in by_u.items():
        evs.sort()
        idx, prev = 0, None
        cur = []
        for ts, eid_, t in evs:
            us = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
            if prev is None or us - prev > GAP_S * 1_000_000:
                if cur:
                    want[(u, idx)] = _py_reached(cur, STEPS)
                idx += 1
                cur = []
            cur.append(t)
            prev = us
        if cur:
            want[(u, idx)] = _py_reached(cur, STEPS)
    assert got == want


def test_funnel_order_matters_and_gap_splits(spark):
    h = 3600
    rows = [
        # u1: full ordered funnel in one session
        (1, 1, T0, "view"),
        (2, 1, T0 + dt.timedelta(seconds=h), "click"),
        (3, 1, T0 + dt.timedelta(seconds=2 * h), "purchase"),
        # u2: purchase BEFORE view/click -> only 'view','click' count (2)
        (4, 2, T0, "purchase"),
        (5, 2, T0 + dt.timedelta(seconds=h), "view"),
        (6, 2, T0 + dt.timedelta(seconds=2 * h), "click"),
        # u3: view, then the click lands after the gap -> two sessions (1, 0)
        (7, 3, T0, "view"),
        (8, 3, T0 + dt.timedelta(seconds=GAP_S + 1), "click"),
    ]
    got = {
        (r["user_id"], r["session_index"]): r["reached"]
        for r in session_funnel(_ev(spark, rows), STEPS).collect()
    }
    assert got == {(1, 1): 3, (2, 1): 2, (3, 1): 1, (3, 2): 0}

    counts = {
        r["step"]: (r["n_sessions"], r["conversion"], r["step_conversion"])
        for r in funnel_counts(_ev(spark, rows), STEPS).collect()
    }
    # 4 sessions total: reached>=1: 3, >=2: 2, >=3: 1
    assert counts[1] == (3, 0.75, None)
    assert counts[2] == (2, 0.5, round(2 / 3, 6))
    assert counts[3] == (1, 0.25, 0.5)


def test_cohort_retention_exact(spark):
    w = dt.timedelta(days=7)
    rows = [
        # cohort week0: users 1,2 ; user 1 active weeks 0,1,2 ; user 2 weeks 0,2
        (1, 1, T0, "view"),
        (2, 1, T0 + w, "view"),
        (3, 1, T0 + 2 * w, "view"),
        (4, 2, T0 + dt.timedelta(days=2), "view"),
        (5, 2, T0 + 2 * w, "view"),
        # cohort week1: user 3 active weeks 1 only
        (6, 3, T0 + w, "view"),
    ]
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    # T0 = Mon 2024-01-01 -> week starts are exact
    w0 = dt.datetime(2024, 1, 1)
    w1 = dt.datetime(2024, 1, 8)
    assert got[(w0, 0)] == (2, 2, 1.0)
    assert got[(w0, 1)] == (1, 2, 0.5)
    assert got[(w0, 2)] == (2, 2, 1.0)
    assert got[(w1, 0)] == (1, 1, 1.0)
    assert set(got) == {(w0, 0), (w0, 1), (w0, 2), (w1, 0)}


def test_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        session_funnel(_ev(spark, [(1, 1, T0, "view")]), [])


def test_funnel_counts_empty_input(spark):
    df = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    rows = {r["step"]: r for r in funnel_counts(df, STEPS).collect()}
    assert len(rows) == 3
    assert all(r["n_sessions"] == 0 and r["total_sessions"] == 0 for r in rows.values())
    assert all(r["conversion"] == 0.0 for r in rows.values())


# ---- growth accounting (growth_accounting) ----


def test_growth_accounting_hand_case(spark):
    """Weekly pattern: u1 active w0,w1,w2; u2 w0 then gone; u3 w0,w2
    (resurrects); u4 joins w2. Base: 2023-12-28 — Spark's week windows
    align to the unix epoch, a Thursday."""
    import datetime as dt

    from anomalydetector_spark.operators.funnels import growth_accounting

    W = dt.datetime(2023, 12, 28)

    def at(week, day=0):
        return W + dt.timedelta(weeks=week, days=day)

    rows = [
        ("u1", at(0)), ("u1", at(1)), ("u1", at(2)),
        ("u2", at(0, 2)),
        ("u3", at(0)), ("u3", at(2, 3)),
        ("u4", at(2)),
        ("u1", at(1, 4)),  # second event same window: still one active
        (None, at(0)), ("u5", None),  # excluded
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        r.window_start: (
            r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned
        )
        for r in growth_accounting(df, window="1 week").collect()
    }
    wk = dt.timedelta(weeks=1)
    assert got[W] == (3, 3, 0, 0, 0)
    assert got[W + wk] == (1, 0, 1, 0, 2)      # u2,u3 churn at w1
    assert got[W + 2 * wk] == (3, 1, 1, 1, 0)  # u4 new, u1 ret, u3 res
    assert got[W + 3 * wk] == (0, 0, 0, 0, 3)  # everyone churns after w2
    # the accounting identity holds exactly at every window
    for w in (W + wk, W + 2 * wk, W + 3 * wk):
        prev = got[w - wk]
        cur = got[w]
        assert cur[0] == prev[0] + cur[1] + cur[3] - cur[4]


def test_growth_accounting_partition_invariance_and_mirror(spark):
    import datetime as dt
    import random

    from anomalydetector_spark.operators.funnels import growth_accounting

    rng = random.Random(19)
    W = dt.datetime(2023, 12, 28)  # epoch-aligned week start
    rows = [
        (f"u{rng.randint(0, 40)}",
         W + dt.timedelta(weeks=rng.randint(0, 7),
                          seconds=rng.randint(0, 600000)))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    a = sorted(map(tuple,
                   growth_accounting(df.repartition(1)).collect()))
    b = sorted(map(tuple,
                   growth_accounting(df.repartition(16)).collect()))
    assert a == b
    # pure-python mirror
    from collections import defaultdict

    wk = dt.timedelta(weeks=1)
    active = defaultdict(set)
    for u, ts in rows:
        active[W + wk * ((ts - W) // wk)].add(u)
    weeks = sorted(active)
    exp = {}
    seen = set()
    for i, w in enumerate(weeks + [weeks[-1] + wk]):
        cur = active.get(w, set())
        prev = active.get(w - wk, set())
        exp[w] = (
            len(cur),
            len({u for u in cur if u not in seen}),
            len(cur & prev),
            len({u for u in cur if u in seen and u not in prev}),
            len(prev - cur),
        )
        seen |= cur
    exp = {w: v for w, v in exp.items() if any(v)}
    got = {r.window_start: (r.n_active, r.n_new, r.n_retained,
                            r.n_resurrected, r.n_churned)
           for r in growth_accounting(df).collect()}
    assert got == exp
