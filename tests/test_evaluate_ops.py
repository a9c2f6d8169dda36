"""operators/evaluate vs the reference's competition metric.

The reference functions are imported verbatim from
/root/reference/srcnn/competition_metric.py (sklearn stubbed — the
functions under test don't use it; ``np.int`` patched for the removed
numpy alias) and compared against the distributed implementations on
randomized series.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ref_metric():
    path = "/root/reference/srcnn/competition_metric.py"
    try:
        open(path).close()
    except OSError:
        pytest.skip("reference repo not available")
    if "sklearn" not in sys.modules:
        sk = types.ModuleType("sklearn")
        skm = types.ModuleType("sklearn.metrics")
        skm.f1_score = skm.precision_score = skm.recall_score = lambda *a, **k: 0.0
        sk.metrics = skm
        sys.modules["sklearn"] = sk
        sys.modules["sklearn.metrics"] = skm
    spec = importlib.util.spec_from_file_location("ref_competition_metric", path)
    mod = importlib.util.module_from_spec(spec)
    if not hasattr(np, "int"):
        np.int = int  # removed alias, used by reconstruct_label
    spec.loader.exec_module(mod)
    return mod


def _random_case(rng, n):
    label = (rng.random(n) < 0.25).astype(int)
    pred = (rng.random(n) < 0.3).astype(int)
    return label, pred


def test_segment_adjust_matches_reference(spark, ref_metric):
    from anomalydetector_spark.operators.evaluate import segment_adjust_predictions

    rng = np.random.default_rng(7)
    frames = []
    expected = {}
    for series in range(6):
        n = int(rng.integers(5, 120))
        label, pred = _random_case(rng, n)
        delay = 7
        expected[f"s{series}"] = ref_metric.get_range_proba(pred, label, delay)
        frames.append(
            pd.DataFrame(
                {
                    "series": f"s{series}",
                    "i": np.arange(n),
                    "label": label,
                    "pred": pred,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    out = (
        segment_adjust_predictions(
            df, order_by=["i"], partition_by="series", delay=7
        )
        .toPandas()
        .sort_values(["series", "i"])
    )
    for key, want in expected.items():
        got = out[out["series"] == key]["adj_pred"].to_numpy()
        np.testing.assert_array_equal(got, want, err_msg=key)


def test_segment_adjust_small_delay(spark, ref_metric):
    """delay=1 exercises the boundary between hit and miss windows."""
    from anomalydetector_spark.operators.evaluate import segment_adjust_predictions

    label = np.array([0, 1, 1, 1, 0, 1, 1, 0])
    pred = np.array([1, 0, 0, 1, 0, 0, 1, 0])
    want = ref_metric.get_range_proba(pred, label, delay=1)
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(label)), "label": label, "pred": pred})
    )
    got = (
        segment_adjust_predictions(df, order_by=["i"], delay=1)
        .toPandas()
        .sort_values("i")["adj_pred"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_dense_label_grid_matches_reference(spark, ref_metric):
    from anomalydetector_spark.operators.evaluate import dense_label_grid

    # sparse timestamps on a 60s base grid, shuffled order, missing slots
    base = 1_600_000_000
    offsets = np.array([0, 1, 2, 5, 6, 9, 10, 14])
    ts = base + offsets * 60
    label = np.array([0, 1, 0, 1, 1, 0, 1, 0])
    want = ref_metric.reconstruct_label(ts, label)

    perm = np.random.default_rng(3).permutation(len(ts))
    df = spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.to_datetime(ts[perm], unit="s"), "label": label[perm]}
        )
    )
    out = dense_label_grid(df).toPandas().sort_values("grid_ts")
    assert len(out) == len(want)
    np.testing.assert_array_equal(out["label"].to_numpy(), want)


def test_dense_label_grid_floors_offgrid_timestamps(spark, ref_metric):
    """ADVICE round-1: an observation whose offset is NOT an exact
    multiple of the min interval lands on its floored slot in the
    reference (reconstruct_label floor-divides) — it must not be
    silently dropped."""
    from anomalydetector_spark.operators.evaluate import dense_label_grid

    base = 1_600_000_000
    # min diff = 60 (between the first two); 130 and 250 are off-grid:
    # slots (130-0)//60 = 2, (250-0)//60 = 4
    offsets = np.array([0, 60, 130, 250, 360])
    ts = base + offsets
    label = np.array([0, 0, 1, 1, 0])
    want = ref_metric.reconstruct_label(ts, label)

    df = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(ts, unit="s"), "label": label})
    )
    out = dense_label_grid(df).toPandas().sort_values("grid_ts")
    assert len(out) == len(want)
    np.testing.assert_array_equal(out["label"].to_numpy(), want)
    # (note: two observations can never share a slot — that would need a
    # pair closer than the minimum interval — so no collision case exists)


def test_dense_label_grid_single_observation_series(spark):
    """ADVICE round-2: a single-observation series has no lag pair, so
    the min interval is undefined — the reference raises on min() of an
    empty list; the distributed operator emits the lone observation as
    its own one-row grid instead of silently dropping the series."""
    from anomalydetector_spark.operators.evaluate import dense_label_grid

    t0 = pd.Timestamp("2025-06-01 00:00:00")
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": ["lonely", "full", "full", "full"],
                "ts": [t0, t0, t0 + pd.Timedelta(60, "s"),
                       t0 + pd.Timedelta(180, "s")],
                "label": [1, 0, 1, 0],
            }
        )
    )
    out = dense_label_grid(df, partition_by="series").toPandas()
    lonely = out[out["series"] == "lonely"]
    assert len(lonely) == 1
    assert lonely["grid_ts"].iloc[0] == t0
    assert lonely["label"].iloc[0] == 1
    # the multi-point series is unaffected: slots 0..3 at 60s interval
    full = out[out["series"] == "full"].sort_values("grid_ts")
    assert len(full) == 4
    np.testing.assert_array_equal(full["label"].to_numpy(), [0, 1, 0, 0])


def test_confusion_and_sweep(spark):
    from anomalydetector_spark.operators.evaluate import (
        best_threshold,
        confusion_counts,
        f1_threshold_sweep,
    )

    rng = np.random.default_rng(11)
    n = 2000
    label = (rng.random(n) < 0.2).astype(int)
    score = np.clip(label * 0.6 + rng.random(n) * 0.5, 0, 1)
    pdf = pd.DataFrame({"label": label, "score": score})
    df = spark.createDataFrame(pdf)

    cc = confusion_counts(
        df.withColumn("pred", (F.col("score") > 0.5).cast("int"))
    ).first()
    pred = (score > 0.5).astype(int)
    assert cc.tp == int((pred * label).sum())
    assert cc.fp == int((pred * (1 - label)).sum())
    assert cc.fn == int(((1 - pred) * label).sum())
    assert cc.tn == int(((1 - pred) * (1 - label)).sum())

    sweep = f1_threshold_sweep(df).toPandas()
    assert len(sweep) == 98
    # exhaustive numpy check of the argmax row
    best = best_threshold(df).first()
    f1s = {}
    for k in range(1, 99):
        t = k * 0.01
        p = (score > t).astype(int)
        tp, fp, fn = (p * label).sum(), (p * (1 - label)).sum(), ((1 - p) * label).sum()
        f1s[round(t, 2)] = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    want_t = max(sorted(f1s), key=lambda t: f1s[t])
    assert abs(best.f1 - f1s[want_t]) < 1e-12
    assert abs(best.threshold - want_t) < 1e-9


def _f1(label, pred):
    tp = int((pred * label).sum())
    fp = int((pred * (1 - label)).sum())
    fn = int(((1 - pred) * label).sum())
    d = 2 * tp + fp + fn
    return 2 * tp / d if d else 0.0


def test_per_series_f1_and_variance_match_reference(spark, ref_metric):
    """A7: per-series segment-adjusted F1 + get_variance around the
    POOLED overall F1, vs the reference protocol recomputed in numpy
    (get_range_proba per series, f1 pooled, competition_metric.py
    get_variance)."""
    from anomalydetector_spark.operators.evaluate import f1_variance, per_series_f1

    rng = np.random.default_rng(23)
    frames, per_expected = [], {}
    pooled_lab, pooled_adj = [], []
    for series in range(8):
        n = int(rng.integers(10, 150))
        label, pred = _random_case(rng, n)
        adj = np.asarray(ref_metric.get_range_proba(pred, label, 7))
        per_expected[f"s{series}"] = _f1(label, adj)
        pooled_lab.append(label)
        pooled_adj.append(adj)
        frames.append(
            pd.DataFrame(
                {"series_id": f"s{series}", "ts": np.arange(n), "label": label, "pred": pred}
            )
        )
    df = spark.createDataFrame(pd.concat(frames))

    per = per_series_f1(df).toPandas().set_index("series_id")
    assert len(per) == 8
    for k, want in per_expected.items():
        assert per.loc[k, "f1"] == pytest.approx(want, abs=1e-12), k

    overall_want = _f1(np.concatenate(pooled_lab), np.concatenate(pooled_adj))
    var_want = ref_metric.get_variance(
        overall_want, [per_expected[f"s{i}"] for i in range(8)]
    )
    row = f1_variance(df).first()
    assert row.n_series == 8
    assert row.overall_f1 == pytest.approx(overall_want, abs=1e-12)
    assert row.f1_variance == pytest.approx(var_want, abs=1e-12)


def test_adjusted_threshold_sweep_matches_reference(spark, ref_metric):
    """ADVICE round-1: the reference sweep (srcnn/evalue.py:163-176)
    evaluates SEGMENT-ADJUSTED F1 per threshold — get_range_proba runs
    after thresholding, per threshold. Check adjust=True against the
    protocol recomputed with the verbatim reference function."""
    from anomalydetector_spark.operators.evaluate import (
        best_threshold,
        f1_threshold_sweep,
    )

    rng = np.random.default_rng(11)
    frames = []
    for series in range(4):
        n = int(rng.integers(30, 120))
        label = (rng.random(n) < 0.2).astype(int)
        score = np.clip(
            rng.random(n) * 0.6 + label * rng.random(n) * 0.4, 0, 1
        )
        frames.append(
            pd.DataFrame(
                {"series": f"s{series}", "i": np.arange(n),
                 "label": label, "score": score}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)

    n_th, scale, delay = 20, 0.05, 7
    got = (
        f1_threshold_sweep(
            df, n_thresholds=n_th, scale=scale,
            adjust=True, order_by=["i"], partition_by="series", delay=delay,
        )
        .toPandas()
        .set_index("threshold")
        .sort_index()
    )
    assert len(got) == n_th

    best_want, best_f1 = None, -1.0
    for k in range(1, n_th + 1):
        t = k * scale
        tp = fp = fn = 0
        for s, grp in pdf.groupby("series"):
            grp = grp.sort_values("i")
            lab = grp["label"].to_numpy()
            pred = (grp["score"].to_numpy() > t).astype(int)
            adj = np.asarray(ref_metric.get_range_proba(pred, lab, delay))
            tp += int((adj * lab).sum())
            fp += int((adj * (1 - lab)).sum())
            fn += int(((1 - adj) * lab).sum())
        row = got.iloc[k - 1]
        assert int(row["tp"]) == tp and int(row["fp"]) == fp and int(row["fn"]) == fn, t
        f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
        assert row["f1"] == pytest.approx(f1, abs=1e-12, nan_ok=True)
        if f1 > best_f1:
            best_f1, best_want = f1, t

    top = best_threshold(
        df, n_thresholds=n_th, scale=scale,
        adjust=True, order_by=["i"], partition_by="series", delay=delay,
    ).first()
    assert top.threshold == pytest.approx(best_want, abs=1e-9)


def test_sweep_and_confusion_zero_denominators(spark):
    """No positives and no predictions anywhere: every metric is 0.0
    (sklearn zero_division parity), not an ANSI DIVIDE_BY_ZERO."""
    import pandas as pd
    from anomalydetector_spark.operators.evaluate import (
        confusion_counts,
        f1_threshold_sweep,
    )

    df = spark.createDataFrame(
        pd.DataFrame({
            "ts": range(20),
            "score": [0.0] * 20,
            "label": [0] * 20,
            "pred": [0] * 20,
        })
    )
    sweep = f1_threshold_sweep(
        df, n_thresholds=5, scale=0.1, adjust=False, order_by=["ts"]
    ).toPandas()
    assert (sweep["f1"] == 0.0).all()
    row = confusion_counts(df).first()
    assert row.precision == 0.0 and row.recall == 0.0 and row.f1 == 0.0


def test_bi_range_adjust_matches_reference(spark, ref_metric):
    """bi_get_range_proba parity (kernel) + the distributed operator."""
    from anomalydetector_spark.operators.evaluate import (
        bi_adjust_predictions,
        bi_range_adjust_np,
    )

    rng = np.random.default_rng(17)
    frames, expected = [], {}
    for series in range(8):
        n = int(rng.integers(5, 150))
        label, pred = _random_case(rng, n)
        left, right = 3, 5
        want = ref_metric.bi_get_range_proba(pred.tolist(), label.tolist(), left, right)
        np.testing.assert_array_equal(
            bi_range_adjust_np(pred, label, left, right), want
        )
        expected[f"s{series}"] = list(want)
        frames.append(
            pd.DataFrame(
                {"series_id": f"s{series}", "ts": np.arange(n),
                 "label": label, "pred": pred}
            )
        )
    out = (
        bi_adjust_predictions(
            spark.createDataFrame(pd.concat(frames)),
            order_by=["ts"], left=3, right=5,
        )
        .toPandas()
        .sort_values(["series_id", "ts"])
    )
    for sid, want in expected.items():
        got = out[out["series_id"] == sid]["pred"].to_list()
        assert got == want, sid


def test_guided_threshold_sweep_matches_recomputation(spark, ref_metric):
    """The Yahoo guided protocol (evalue.py:129-162): sweep vs pseudo-
    labels, then report vs real labels at the guided argmax — checked
    against a literal pandas recomputation of both stages."""
    from anomalydetector_spark.operators.evaluate import guided_threshold_sweep

    rng = np.random.default_rng(23)
    frames = []
    for series in range(4):
        n = 80
        score = rng.random(n)
        label = (rng.random(n) < 0.2).astype(int)
        guide = (score + rng.normal(0, 0.1, n) > 0.6).astype(int)
        frames.append(
            pd.DataFrame(
                {"series_id": f"s{series}", "ts": np.arange(n),
                 "score": score, "label": label, "guide": guide}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)

    def pooled_adjusted_f1(th, lab_col):
        tp = fp = fn = 0
        for sid, grp in pdf.groupby("series_id"):
            grp = grp.sort_values("ts")
            pred = (grp["score"].to_numpy() > th).astype(int)
            lab = grp[lab_col].to_numpy()
            adj = np.asarray(ref_metric.get_range_proba(pred, lab, 3))
            tp += int((adj * lab).sum())
            fp += int((adj * (1 - lab)).sum())
            fn += int(((1 - adj) * lab).sum())
        return (2 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 0.0, tp, fp, fn

    best_f1, best_th = 0.0, 0.0
    for i in range(1, 21):
        th = i * 0.05
        f1, *_ = pooled_adjusted_f1(th, "guide")
        if f1 > best_f1:
            best_f1, best_th = f1, th

    want_f1, tp, fp, fn = pooled_adjusted_f1(best_th, "label")

    out = guided_threshold_sweep(
        spark.createDataFrame(pdf),
        n_thresholds=20, scale=0.05,
        order_by=["ts"], partition_by="series_id", delay=3,
    ).collect()[0]
    assert out["guided_threshold"] == pytest.approx(best_th)
    assert (out["tp"], out["fp"], out["fn"]) == (tp, fp, fn)
    assert out["f1"] == pytest.approx(want_f1)


def test_per_series_best_threshold(spark, ref_metric):
    """Per-series argmax-F1 threshold with segment adjustment, ties →
    lowest threshold (the reference's strict > scan)."""
    from anomalydetector_spark.operators.evaluate import per_series_best_threshold

    rng = np.random.default_rng(31)
    frames = []
    for series in range(5):
        n = 60
        score = rng.random(n)
        label = (rng.random(n) < 0.25).astype(int)
        frames.append(
            pd.DataFrame(
                {"series_id": f"s{series}", "ts": np.arange(n),
                 "score": score, "label": label}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)

    want = {}
    for sid, grp in pdf.groupby("series_id"):
        grp = grp.sort_values("ts")
        best = (0.0, 0.0)
        for i in range(1, 21):
            th = i * 0.05
            pred = (grp["score"].to_numpy() > th).astype(int)
            lab = grp["label"].to_numpy()
            adj = np.asarray(ref_metric.get_range_proba(pred, lab, 7))
            tp = int((adj * lab).sum()); fp = int((adj * (1 - lab)).sum())
            fn = int(((1 - adj) * lab).sum())
            f1 = (2 * tp / (2 * tp + fp + fn)) if (2 * tp + fp + fn) else 0.0
            if f1 > best[0]:
                best = (f1, th)
        want[sid] = best

    out = per_series_best_threshold(
        spark.createDataFrame(pdf),
        n_thresholds=20, scale=0.05, order_by=["ts"], delay=7,
    ).collect()
    assert len(out) == 5
    for r in out:
        f1, th = want[r["series_id"]]
        assert r["best_threshold"] == pytest.approx(th), r["series_id"]
        assert r["f1"] == pytest.approx(f1), r["series_id"]
