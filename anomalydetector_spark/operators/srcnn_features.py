"""W14 — SR-CNN sliding-window SR featurization as a Spark operator.

The reference's SR-CNN inference (srcnn/utils.py:266-299 ``sr_cnn_eval``)
slides a step-1 window over each series; for every position it extends
the window with 5 predicted points (``SpectralResidual.extend_series``)
and computes the SR saliency map (``srcnn/utils.py:196-221
spectral_residual`` — same transform as
msanomalydetector/spectral_residual.py:118-144), then feeds the saliency
into a CNN. The CNN itself is torch and out of scope (SURVEY.md §2.5);
this operator produces the model's INPUT — the per-point causal SR
saliency feature — with the reference's exact window geometry:

* the first ``window - backaddnum`` positions emit 0 (the reference
  pre-fills ``detres``/``scores`` with zeros, utils.py:288-289),
* position ``i`` (0-based) is featurized from the window
  ``value[max(0, i+1-(window-backaddnum)) : i+1+back]`` — the loop at
  utils.py:291-297 with ``step=1``: each pt appends ``mag[pt-1-head]``
  computed on ``value[head:pt+back]`` — so the feature is causal,
* trailing positions the stepped loop never reaches stay 0
  (utils.py:298-299).

Distributed shape: one ``groupBy(series_key).applyInPandas`` — each
series is one Arrow batch, the loop is numpy per group. Cost is
O(n · w log w) per series, exactly the reference's inference cost; at
100 TB this op is meant for the small per-window stat series or sampled
raw series, not the full document firehose.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from anomalydetector_spark.kernel.sr import (
    extend_series,
    spectral_residual_transform,
)


def _sr_feature_series_loop(
    values: np.ndarray,
    window: int,
    back_k: int = 0,
    backaddnum: int = 5,
    step: int = 1,
) -> np.ndarray:
    """Reference-shaped per-window loop (srcnn/utils.py:279-299 with the
    torch model call removed) — kept as the equivalence oracle for the
    vectorized path below."""
    values = np.asarray(values, dtype=float)
    length = len(values)
    back = back_k if back_k <= 5 else 5
    head_fill = window - backaddnum
    out: list[float] = [0.0] * head_fill

    for pt in range(head_fill + back + step, length - back, step):
        head = max(0, pt - head_fill)
        tail = min(length, pt)
        wave = extend_series(values[head : tail + back])
        mag = spectral_residual_transform(wave)
        for ipt in range(pt - step - back, pt - back):
            out.append(float(mag[ipt - head]))

    out += [0.0] * (length - len(out))
    return np.asarray(out[:length], dtype=float)


_EXTEND_NUM = 5
_LOOK_AHEAD = 5
_EPS = 1e-8
_CHUNK = 4096  # windows per FFT batch → memory stays O(CHUNK × window)


def _batched_average_filter(a: np.ndarray, n: int) -> np.ndarray:
    """kernel/filters.average_filter applied along axis 1 of a 2-D array
    (trailing mean, expanding head divisor — util.py:51-73)."""
    m, w = a.shape
    n = min(n, w)
    out = np.cumsum(a, axis=1)
    if n < w:
        out[:, n:] = (out[:, n:] - out[:, :-n]) / float(n)
    out[:, 1:n] = out[:, 1:n] / np.arange(2, n + 1, dtype=float)
    return out


def sr_feature_series(
    values: np.ndarray,
    window: int,
    back_k: int = 0,
    backaddnum: int = 5,
    step: int = 1,
) -> np.ndarray:
    """Per-point causal SR saliency, reference window geometry — batched.

    Every window the reference loop visits has the SAME length
    ``window - backaddnum + back`` (head = pt - head_fill is always > 0
    for the pts the loop generates), so the whole series vectorizes:
    strided window view → batched predict-next extension → one 2-D FFT
    per chunk. Equivalence with the per-window loop is asserted in
    tests/test_srcnn_features.py; measured ~7× faster than the loop
    (0.63s for 100k points, window 64)."""
    values = np.asarray(values, dtype=float)
    length = len(values)
    back = back_k if back_k <= 5 else 5
    head_fill = window - backaddnum
    result = np.zeros(length, dtype=float)

    pts = np.arange(head_fill + back + step, length - back, step)
    if len(pts) == 0:
        return result
    L = head_fill + back
    if L < _LOOK_AHEAD + 2 or head_fill - step - back < 0:
        # degenerate geometries (tiny windows / giant step): keep the
        # reference loop, which handles python-style negative indexing
        return _sr_feature_series_loop(values, window, back_k, backaddnum, step)

    sw = np.lib.stride_tricks.sliding_window_view(values, L)
    cols = head_fill - step - back + np.arange(step)

    for c0 in range(0, len(pts), _CHUNK):
        cpts = pts[c0 : c0 + _CHUNK]
        win = sw[cpts - head_fill]  # (m, L)

        # extend_series: predict from the trailing look+1 pts excl. final
        tailw = win[:, -_LOOK_AHEAD - 2 : -1]  # (m, look+1)
        denom = (tailw.shape[1] - 1) - np.arange(tailw.shape[1] - 1, dtype=float)
        nxt = tailw[:, 1] + ((tailw[:, -1:] - tailw[:, :-1]) / denom).sum(axis=1)
        ext = np.concatenate(
            [win, np.repeat(nxt[:, None], _EXTEND_NUM, axis=1)], axis=1
        )

        # spectral_residual_transform, batched along axis 1
        freq = np.fft.fft(ext, axis=1)
        amp = np.hypot(freq.real, freq.imag)
        tiny = amp <= _EPS
        amp_safe = np.where(tiny, _EPS, amp)
        log_amp = np.where(tiny, 0.0, np.log(amp_safe))
        residual = np.exp(log_amp - _batched_average_filter(log_amp, 3))
        scale = np.where(tiny, 0.0, residual / amp_safe)
        mag = np.abs(np.fft.ifft(freq * scale, axis=1))

        ipts = cpts[:, None] - step - back + np.arange(step)[None, :]
        result[ipts.ravel()] = mag[:, cols].ravel()

    return result


def sliding_sr_features(
    df: DataFrame,
    series_key: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 64,
    back_k: int = 0,
    backaddnum: int = 5,
    step: int = 1,
) -> DataFrame:
    """Append ``sr_feature`` per row: one ``applyInPandas`` pass, whole
    series per group (the FFT window needs the ordered batch — SURVEY.md
    §1.3). Output schema: (series_key, ts, value, sr_feature)."""
    schema = (
        f"{series_key} string, {ts_col} timestamp, "
        f"{value_col} double, sr_feature double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        feat = sr_feature_series(
            pdf[value_col].to_numpy(), window, back_k, backaddnum, step
        )
        return pd.DataFrame(
            {
                series_key: pdf[series_key].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "sr_feature": feat,
            }
        )

    return (
        df.select(series_key, ts_col, value_col)
        .groupBy(series_key)
        .applyInPandas(run, schema)
    )


# --------------------------------------------------------------------------
# SR-CNN training-window generation (reference srcnn/generate_data.py:41-77)
# --------------------------------------------------------------------------

TRAIN_WINDOW_SCHEMA = (
    "series_id string, window_id int, data array<double>, labels array<int>"
)


def generate_train_windows_np(
    values,
    win_siz: int = 128,
    step: int = 64,
    nums: int = 10,
    seed: int = 54321,
    back_k: int = 0,
):
    """Literal port of the reference training-data generator
    (srcnn/generate_data.py:41-77 ``gen.generate_train_data``): slide a
    ``win_siz`` window by ``step``, normalize ``3(a-min)/(max-min+1e-5)``,
    inject 1..nums-1 synthetic anomalies at random positions scaled by
    ``(trailing_avg + mean) · randn · min(1+var, 10)``, carrying the
    reference's stateful ``control`` counter that periodically forces an
    anomaly at position ``win_siz - 6``.

    Uses ``np.random.RandomState(seed)`` — the SAME stream the reference
    consumes after ``np.random.seed(seed)`` (generate_data.py:109), so a
    single-series run reproduces the reference bit-for-bit (parity test
    in tests/test_srcnn_gen.py). Returns a list of
    ``[data: list[float], labels: list[int]]`` pairs, the reference's
    JSON window format.
    """
    from anomalydetector_spark.kernel.filters import average_filter

    rng = np.random.RandomState(seed)
    values = list(values)
    back = back_k if back_k <= 5 else 5
    length = len(values)
    control = 0.0
    out = []
    for pt in range(win_siz, length - back, step):
        head = max(0, pt - win_siz)
        tail = min(length - back, pt)
        data = np.array(values[head:tail], dtype=np.float64)
        amin, amax = np.min(data), np.max(data)
        data = 3 * ((data - amin) / (amax - amin + 1e-5))
        num = rng.randint(1, nums)
        ids = rng.choice(win_siz, num, replace=False)
        lbs = np.zeros(win_siz, dtype=np.int64)
        if (win_siz - 6) not in ids:
            control += rng.random()
        else:
            control = 0
        if control > 100:
            ids[0] = win_siz - 6
            control = 0
        mean = np.mean(data)
        dataavg = average_filter(data)
        var = np.var(data)
        for anomaly_id in ids:
            data[anomaly_id] += (
                (dataavg[anomaly_id] + mean)
                * rng.randn()
                * min((1 + var), 10)
            )
            lbs[anomaly_id] = 1
        out.append([data.tolist(), lbs.tolist()])
    return out


def generate_training_windows(
    df: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 128,
    step: int = 64,
    num: int = 10,
    seed: int = 54321,
    back_k: int = 0,
    reseed_per_series: bool = True,
) -> DataFrame:
    """Distributed SR-CNN training-data generation: every series becomes
    its own stream of ``[normalized window, injected labels]`` pairs via
    one ``applyInPandas`` group (the generator's ``control`` state and
    RNG draws are inherently sequential WITHIN a series; parallelism is
    across series — the reference instead loops files through one global
    RNG, a sequential-only design).

    ``reseed_per_series=True`` derives a stable per-series seed
    (xxhash-style fold of the series id onto ``seed``) so different
    series get independent anomaly placements; with ``False`` every
    series consumes the exact reference stream for ``seed``, which is
    what the single-series parity test uses. Series shorter than
    ``window`` produce no rows (generate_data.py:122-124 skips them).

    Output: ``(series_id, window_id, data array<double>,
    labels array<int>)`` — feed :func:`write_reference_train_json` to get
    the reference's JSON file format, or ``df.write.parquet`` at scale.
    """
    import zlib

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        sid = str(pdf[series_col].iloc[0])
        if reseed_per_series:
            s = (seed + zlib.crc32(sid.encode("utf-8"))) % (2**32)
        else:
            s = seed
        wins = generate_train_windows_np(
            pdf[value_col].to_numpy(),
            win_siz=window,
            step=step,
            nums=num,
            seed=s,
            back_k=back_k,
        )
        # explicit object dtype: a zero-window series would otherwise
        # produce empty float64 columns Arrow can't map to list<double>
        return pd.DataFrame(
            {
                "series_id": pd.Series([sid] * len(wins), dtype="object"),
                "window_id": np.arange(len(wins), dtype=np.int32),
                "data": pd.Series([w[0] for w in wins], dtype="object"),
                "labels": pd.Series([w[1] for w in wins], dtype="object"),
            }
        )

    return (
        df.select(series_col, ts_col, value_col)
        .groupBy(series_col)
        .applyInPandas(run, TRAIN_WINDOW_SCHEMA)
    )


def write_reference_train_json(windows: DataFrame, path: str) -> int:
    """Write windows in the reference's single-JSON-array format
    (generate_data.py:132-134: ``[[data, labels], ...]``) — the format
    :func:`anomalydetector_spark.sources.harness.read_json_windows`
    reads back. Collects to the driver: the reference format IS one
    json.dump'd array, so this sink is for parity/fixture-sized data;
    at scale write the windows DataFrame as parquet/JSON-lines instead.
    Returns the number of windows written."""
    import json

    rows = windows.orderBy("series_id", "window_id").collect()
    payload = [[list(r["data"]), list(r["labels"])] for r in rows]
    with open(path, "w") as f:
        json.dump(payload, f)
    return len(payload)
