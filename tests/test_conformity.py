"""Benford conformity check (operators/conformity.py), Spearman rank
correlation (operators/profile.spearman_correlations), top-k churn and
divergence attribution (operators/divergence.py): pure-Python mirrors,
detection behavior, edge cases, partition invariance."""

import math
import random

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.conformity import (
    BENFORD_MICRO,
    benford_check,
    benford_digit_counts,
    first_digit,
)
from anomalydetector_spark.operators.divergence import (
    divergence_attribution,
    topk_churn,
)
from anomalydetector_spark.operators.profile import spearman_correlations


# ---------------------------------------------------------------- benford
def test_first_digit_edges(spark):
    cases = [
        (1.0, 1), (9.999999, 9), (10.0, 1), (99.9, 9), (100.0, 1),
        (0.001234, 1), (-567.0, 5), (1e29, 1), (1e-30, 1),
        (123456.789, 1), (7.0, 7),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v double")
    got = {
        r.v: r.d
        for r in df.select("v", first_digit(F.col("v")).alias("d")).collect()
    }
    for v, d in cases:
        assert got[v] == d, (v, got[v], d)
    # excluded domain: NULL, NaN, 0, magnitude >= 1e30
    bad = spark.createDataFrame(
        [(None,), (float("nan"),), (0.0,), (1e30,), (-1e31,)], "v double"
    )
    assert (
        bad.select(first_digit(F.col("v")).alias("d"))
        .filter(F.col("d").isNotNull())
        .count()
        == 0
    )


def test_benford_mirror_and_bands(spark):
    rnd = random.Random(2)
    vals = [math.exp(rnd.uniform(0, 14)) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = benford_check(df, "v").collect()[0]

    # pure-Python mirror with the same integer arithmetic
    def digit(v):
        v = abs(v)
        p = math.floor(math.log10(v))
        if 10.0 ** (p + 1) <= v:
            p += 1
        elif 10.0 ** p > v:
            p -= 1
        return min(max(int(v / 10.0 ** p), 1), 9)

    counts = {d: 0 for d in range(1, 10)}
    for v in vals:
        counts[digit(v)] += 1
    n = len(vals)
    chi = 0
    devsum = 0
    for d in range(1, 10):
        dev = counts[d] * 10**8 - n * BENFORD_MICRO[d]
        chi += round(dev * dev / float(n * BENFORD_MICRO[d]) / 1e8 * 1e6)
        devsum += abs(dev)
    assert got.chi2 == chi / 1e6
    assert got.mad == float(devsum) / (9.0 * n * 1e8)
    assert got.n == n
    assert got.verdict in ("close", "acceptable")


def test_benford_uniform_nonconforming_and_zero_digits(spark):
    # single-digit constant data: digit 7 only — every other digit 0
    df = spark.createDataFrame([(7.0,)] * 100, "v double")
    dense = benford_digit_counts(df, "v").orderBy("digit").collect()
    assert [r.observed for r in dense] == [0, 0, 0, 0, 0, 0, 100, 0, 0]
    assert all(r.n == 100 for r in dense)
    chk = benford_check(df, "v").collect()[0]
    assert chk.verdict == "nonconforming"


def test_benford_partitioned_and_invariance(spark):
    rnd = random.Random(4)
    rows = [("ok", math.exp(rnd.uniform(0, 12))) for _ in range(3000)] + [
        ("bad", float(rnd.randint(100, 199))) for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        r.grp: r.verdict
        for r in benford_check(df, "v", ["grp"]).collect()
    }
    assert got["bad"] == "nonconforming"
    assert got["ok"] in ("close", "acceptable")
    a = benford_check(df.coalesce(1), "v", ["grp"]).orderBy("grp").collect()
    b = benford_check(df.repartition(13), "v", ["grp"]).orderBy("grp").collect()
    assert [(r.grp, r.chi2, r.mad) for r in a] == [
        (r.grp, r.chi2, r.mad) for r in b
    ]


# --------------------------------------------------------------- spearman
def test_spearman_tie_mirror(spark):
    vals_a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 8.0]
    vals_b = [2.0, 1.0, 4.0, 4.0, 9.0, 7.0, 9.0, 10.0]
    df = spark.createDataFrame(
        list(zip(vals_a, vals_b)), "a double, b double"
    )
    got = spearman_correlations(df, [("a", "b")]).collect()[0]

    def ranks2(xs):
        return [
            2 * sum(1 for y in xs if y < x) + sum(1 for y in xs if y == x) + 1
            for x in xs
        ]

    ra, rb = ranks2(vals_a), ranks2(vals_b)
    n = len(ra)
    sa, sb = sum(ra), sum(rb)
    sa2 = sum(x * x for x in ra)
    sb2 = sum(x * x for x in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    exp = float(n * sab - sa * sb) / (
        math.sqrt(float(n * sa2 - sa * sa))
        * math.sqrt(float(n * sb2 - sb * sb))
    )
    assert got.spearman == exp
    assert got.n == n


def test_spearman_sees_monotone_nonlinear(spark):
    rows = [(float(i), math.exp(i / 9.0)) for i in range(100)]
    df = spark.createDataFrame(rows, "a double, b double")
    sp = spearman_correlations(df, [("a", "b")]).collect()[0].spearman
    assert sp == pytest.approx(1.0, abs=1e-12)
    # Pearson on the same data is visibly below 1 — the lens differs
    pe = df.agg(F.corr("a", "b")).collect()[0][0]
    assert pe < 0.95


def test_spearman_pairwise_deletion_and_constant(spark):
    rows = [
        (1.0, 10.0, None),
        (2.0, 20.0, 5.0),
        (None, 30.0, 5.0),
        (4.0, 40.0, 5.0),
        (5.0, float("nan"), 5.0),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r.col_a, r.col_b): r
        for r in spearman_correlations(df, [("a", "b"), ("a", "c")]).collect()
    }
    # (a,b): rows 1,2,4 survive -> perfectly monotone
    assert got[("a", "b")].n == 3
    assert got[("a", "b")].spearman == pytest.approx(1.0, abs=1e-12)
    # (a,c): c constant on surviving rows -> NULL
    assert got[("a", "c")].spearman is None


def test_spearman_anticorrelated_and_invariance(spark):
    rnd = random.Random(8)
    rows = [(float(i) + rnd.random() * 0.01, float(-i), rnd.uniform(0, 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = spearman_correlations(df, [("a", "b")]).collect()[0]
    assert got.spearman == pytest.approx(-1.0, abs=1e-12)
    a = spearman_correlations(df.coalesce(1), [("a", "c")]).collect()[0]
    b = spearman_correlations(df.repartition(9), [("a", "c")]).collect()[0]
    assert a.spearman == b.spearman


# ------------------------------------------------------------ topk churn
def _counts(spark, rows):
    return spark.createDataFrame(
        rows, "w_start int, w_end int, cat string, n int"
    )


def test_topk_churn_exact(spark):
    counts = _counts(
        spark,
        [
            (0, 1, "a", 100), (0, 1, "b", 50), (0, 1, "c", 30), (0, 1, "x", 1),
            (1, 2, "a", 90), (1, 2, "b", 60), (1, 2, "d", 40), (1, 2, "c", 2),
            (2, 3, "a", 90), (2, 3, "b", 60), (2, 3, "d", 40),
        ],
    )
    got = {r.window_start: r for r in topk_churn(counts, k=3).collect()}
    assert set(got) == {1, 2}  # first window has no predecessor
    assert got[1].jaccard == 0.5 and got[1].n_kept == 2
    assert got[1].n_new == 1 and got[1].n_dropped == 1
    assert got[2].jaccard == 1.0 and got[2].n_new == 0


def test_topk_churn_tiebreak_deterministic(spark):
    # ties on n: cat asc decides membership at the k boundary
    counts = _counts(
        spark,
        [(0, 1, "z", 10), (0, 1, "a", 10), (0, 1, "m", 10),
         (1, 2, "z", 10), (1, 2, "a", 10), (1, 2, "m", 10)],
    )
    got = topk_churn(counts, k=2).collect()[0]
    # both windows pick {a, m} -> identical sets
    assert got.jaccard == 1.0 and got.k_cur == 2


def test_divergence_attribution_shares(spark):
    counts = _counts(
        spark,
        [
            (0, 1, "a", 100), (0, 1, "b", 50), (0, 1, "c", 30),
            (1, 2, "a", 90), (1, 2, "b", 60), (1, 2, "d", 40),
        ],
    )
    att = divergence_attribution(counts, top_n=10).collect()
    assert all(r.window_start == 1 for r in att)
    assert sum(r.share for r in att) == pytest.approx(1.0, abs=1e-12)
    by_cat = {r.cat: r for r in att}
    # d appeared from nothing -> up; c vanished -> down
    assert by_cat["d"].direction == "up" and by_cat["d"].p_prev == 0.0
    assert by_cat["c"].direction == "down" and by_cat["c"].p_cur == 0.0
    # exact share mirror: dev_c = |c*Tp - d*Tc|
    tp, tc = 180, 190
    devs = {
        "a": abs(90 * tp - 100 * tc),
        "b": abs(60 * tp - 50 * tc),
        "c": abs(0 * tp - 30 * tc),
        "d": abs(40 * tp - 0 * tc),
    }
    tot = sum(devs.values())
    for cat, r in by_cat.items():
        assert r.share == devs[cat] / float(tot)
    # ranks ordered by share desc
    ranked = sorted(att, key=lambda r: r.rank)
    assert all(
        ranked[i].share >= ranked[i + 1].share for i in range(len(ranked) - 1)
    )


def test_divergence_attribution_identical_windows_filtered(spark):
    counts = _counts(
        spark,
        [(0, 1, "a", 10), (0, 1, "b", 10), (1, 2, "a", 10), (1, 2, "b", 10)],
    )
    # TVD = 0 -> shares undefined -> window emitted nothing
    assert divergence_attribution(counts).count() == 0


def test_benford_suite_check(spark):
    import math
    import random as _random

    from anomalydetector_spark.plans import suite as S

    rnd = _random.Random(12)
    rows = (
        [("organic", math.exp(rnd.uniform(0, 12))) for _ in range(4000)]
        + [("fabricated", float(rnd.randint(500, 599))) for _ in range(4000)]
        + [("dead", 0.0)] * 50
    )
    df = spark.createDataFrame(rows, "grp string, amount double")
    res = S.run_suite(
        df, [S.benford("amount")], partition_by="grp"
    )
    v = {r.partition_key: r for r in res.verdicts.collect()}
    assert v["organic"].passed is True
    assert v["fabricated"].passed is False
    assert "Benford" in v["fabricated"].error_message
    # zero digit-bearing rows: loud NO_DIGITS failure, never silently ok
    assert v["dead"].passed is False
    assert "NO_DIGITS" in v["dead"].error_message
    assert v["organic"].rows_scanned == 4000


def test_first_digit_adversarial_power_boundaries(spark):
    """The corrected-exponent extraction must agree with the pure-
    Python mirror on values straddling every power-of-ten boundary by
    one ulp — exactly where a raw floor(log10) flips."""
    import math as _m
    import struct

    def ulp_away(x, up):
        packed = struct.pack(">d", x)
        i = struct.unpack(">q", packed)[0]
        return struct.unpack(">d", struct.pack(">q", i + (1 if up else -1)))[0]

    vals = []
    for k in range(-25, 26):
        p = 10.0 ** k
        vals += [p, ulp_away(p, True), ulp_away(p, False)]
    vals += [3.0, 5.5, 99.99999999999999, 0.30000000000000004]

    def digit_mirror(v):
        v = abs(v)
        if not (1e-30 <= v < 1e30):
            return None
        p = _m.floor(_m.log10(v))
        if 10.0 ** (p + 1) <= v:
            p += 1
        elif 10.0 ** p > v:
            p -= 1
        return min(max(int(v / 10.0 ** p), 1), 9)

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r.v: r.d
        for r in df.select(
            "v", first_digit(F.col("v")).alias("d")
        ).collect()
    }
    for v in vals:
        assert got[v] == digit_mirror(v), (v, got[v], digit_mirror(v))
    # the one-ulp-below values really do carry digit 9: the extraction
    # distinguishes them from the boundary
    below = [got[ulp_away(10.0 ** k, False)] for k in range(-20, 20)]
    assert all(d == 9 for d in below)


def test_first_digit_domain_edge_ulps_ansi_safe(spark):
    """Regression (round-4 ADVICE): a double one ulp below 1e30 is IN
    the documented domain but its floor(log10) rounds to exactly 30,
    so the speculative p_guess+1 lookup indexes one past a table that
    stops at 10^30 — under Spark 4's default ANSI mode that THREW and
    killed the job (DuckDB's out-of-range list_extract yields NULL, so
    the twins also diverged).  The padded table must return digit 9
    without raising; same guarantee at the 1e-30 edge."""
    import struct

    def ulp_away(x, up):
        i = struct.unpack(">q", struct.pack(">d", x))[0]
        return struct.unpack(">d", struct.pack(">q", i + (1 if up else -1)))[0]

    hi_in = ulp_away(1e30, False)   # 9.999999999999999e+29: in-domain
    lo_in = ulp_away(1e-30, True)   # just above the lower edge
    assert hi_in < 1e30 and lo_in >= 1e-30
    df = spark.createDataFrame(
        [(hi_in,), (lo_in,), (1e-30,), (ulp_away(1e30, True),), (1e30,)],
        "v double",
    )
    got = {r.v: r.d for r in df.select(
        "v", first_digit(F.col("v")).alias("d")).collect()}
    assert got[hi_in] == 9
    assert got[lo_in] == 1
    assert got[1e-30] == 1
    # at/above the upper edge: excluded (NULL), never an exception
    assert got[1e30] is None
    assert got[ulp_away(1e30, True)] is None
