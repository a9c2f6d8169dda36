"""Spectral-Residual saliency kernel — pure numpy, no Spark imports.

From-scratch reimplementation of the SR anomaly detector of Ren et al.,
KDD 2019 (arXiv 1906.03821), with semantics matched point-for-point to the
reference (msanomalydetector/spectral_residual.py) including its quirks —
documented below so they are preserved deliberately, not accidentally:

* ``predict_next`` anchors its extrapolation at ``values[1]``, not the
  last value (reference spectral_residual.py:146-166).
* ``average_filter`` uses an expanding divisor at the head
  (util.py:51-73; see filters.py).
* EPS-masked FFT bins zero both the log-magnitude and the filtered
  spectrum (spectral_residual.py:129-140).
* The low-pass filter for expected values keeps coefficient ``i`` iff
  ``3n/8 >= i or i >= 5n/8`` with float comparisons
  (spectral_residual.py:193-194).
* A trailing batch shorter than MIN_POINTS(12) is re-detected on a
  backward-extended window and sliced (spectral_residual.py:58-71).

This module runs whole-series per group inside ``applyInPandas`` — each
series is one Arrow batch, so FFT cost is O(n log n) on a small n (the
number of stat windows), never on raw rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from anomalydetector_spark.kernel import boundary
from anomalydetector_spark.kernel.filters import average_filter

__all__ = [
    "SrParams",
    "EPS",
    "THRESHOLD",
    "MAG_WINDOW",
    "SCORE_WINDOW",
    "MIN_POINTS",
    "VALUE_UPPER_BOUND",
    "VALUE_LOWER_BOUND",
    "predict_next",
    "extend_series",
    "spectral_residual_transform",
    "generate_spectral_score",
    "deanomaly_entire",
    "calculate_expected_value",
    "sr_detect",
    "apply_gap_rule",
]

# Default detection constants (reference: msanomalydetector/util.py:39-43,
# aml_component/constants.py:1-3).
EPS = 1e-8
THRESHOLD = 0.3
MAG_WINDOW = 3
SCORE_WINDOW = 40
MIN_POINTS = 12
VALUE_UPPER_BOUND = 1e100
VALUE_LOWER_BOUND = -1e100

EXTEND_NUM = 5  # points appended before the FFT (spectral_residual.py:169)
LOOK_AHEAD = 5  # history used to predict them (spectral_residual.py:169)


@dataclass(frozen=True)
class SrParams:
    """Detector parameters; defaults mirror the reference CLI/library
    defaults (util.py:39-43, ad_component.yaml:31-50)."""

    threshold: float = THRESHOLD
    mag_window: int = MAG_WINDOW
    score_window: int = SCORE_WINDOW
    sensitivity: float = 99.0
    batch_size: int = 0  # 0 → whole series in one batch
    with_margin: bool = False  # AnomalyAndMargin mode


def predict_next(values: np.ndarray) -> float:
    """Extrapolate one point ahead from the mean slope to the last value.

    Note: the result is anchored at ``values[1]`` — a reference quirk we
    reproduce on purpose (spectral_residual.py:146-166).
    """
    values = np.asarray(values, dtype=float)
    n = len(values)
    if n <= 1:
        raise ValueError("need at least 2 points to predict the next one")
    denom = (n - 1) - np.arange(n - 1, dtype=float)
    slopes = (values[-1] - values[:-1]) / denom
    return float(values[1] + slopes.sum())


def extend_series(
    values: np.ndarray, extend_num: int = EXTEND_NUM, look_ahead: int = LOOK_AHEAD
) -> np.ndarray:
    """Append ``extend_num`` copies of the predicted next value, predicted
    from the trailing ``look_ahead + 1`` points excluding the final one
    (reference: spectral_residual.py:168-186)."""
    if look_ahead < 1:
        raise ValueError("look_ahead must be at least 1")
    values = np.asarray(values, dtype=float)
    nxt = predict_next(values[-look_ahead - 2 : -1])
    return np.concatenate([values, np.full(extend_num, nxt)])


def spectral_residual_transform(
    values: np.ndarray, mag_window: int = MAG_WINDOW
) -> np.ndarray:
    """Saliency map: FFT → log-amplitude minus its moving average →
    rescale the spectrum by exp(residual)/amplitude → inverse FFT
    amplitude (reference: spectral_residual.py:118-144)."""
    # The exact arithmetic sequence matters for bit-parity with the
    # reference: sqrt(re^2+im^2) (NOT np.hypot), index-assignment of the
    # EPS floor, and per-component multiply-then-divide rescaling.  A
    # hypot/np.where formulation differs by ~1e-17 in the saliency map,
    # which generate_spectral_score's EPS divisor amplifies to ~1e-10 on
    # near-zero-saliency series (round-1 fuzz-parity failure).
    values = np.asarray(values, dtype=float)
    freq = np.fft.fft(values)
    amp = np.sqrt(freq.real ** 2 + freq.imag ** 2)
    tiny = np.where(amp <= EPS)[0]
    amp[tiny] = EPS

    log_amp = np.log(amp)
    log_amp[tiny] = 0

    residual = np.exp(log_amp - average_filter(log_amp, n=mag_window))
    freq.real = freq.real * residual / amp
    freq.imag = freq.imag * residual / amp
    freq.real[tiny] = 0
    freq.imag[tiny] = 0

    saliency = np.fft.ifft(freq)
    return np.sqrt(saliency.real ** 2 + saliency.imag ** 2)


def generate_spectral_score(
    mags: np.ndarray, score_window: int = SCORE_WINDOW
) -> np.ndarray:
    """Relative deviation of the saliency from its trailing mean, damped by
    10 and clipped to [0, 1] (reference: spectral_residual.py:109-116)."""
    ave = average_filter(mags, n=score_window)
    divisor = np.clip(ave, EPS, ave.max())
    return np.clip(np.abs(mags - ave) / divisor / 10.0, 0.0, 1.0)


def _fit_line(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Closed-form least-squares slope/intercept (reference util.py:76-84)."""
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    det = n * sxx - sx * sx
    return (n * sxy - sx * sy) / det, (sxx * sy - sx * sxy) / det


def deanomaly_entire(values: np.ndarray, anomaly_idx) -> np.ndarray:
    """Replace each anomalous point by a local linear fit over nearby
    non-anomalous neighbors, widening the neighborhood by ±2 until at
    least 4 fit points exist (reference: util.py:87-106)."""
    values = np.asarray(values, dtype=float)
    out = values.copy()
    bad = set(int(i) for i in anomaly_idx)
    n = len(values)
    min_fit = 4
    for idx in anomaly_idx:
        step = 1
        lo, hi = max(idx - step, 0), min(n - 1, idx + step)
        fit = [(i, values[i]) for i in range(lo, hi + 1) if i not in bad]
        while len(fit) < min_fit and (lo > 0 or hi < n - 1):
            step += 2
            lo, hi = max(idx - step, 0), min(n - 1, idx + step)
            fit = [(i, values[i]) for i in range(lo, hi + 1) if i not in bad]
        if len(fit) > 1:
            xs = np.array([p[0] for p in fit], dtype=float)
            ys = np.array([p[1] for p in fit], dtype=float)
            a, b = _fit_line(xs, ys)
            out[idx] = a * idx + b
    return out


def calculate_expected_value(values: np.ndarray, anomaly_idx) -> np.ndarray:
    """De-anomalize, then low-pass: keep FFT coefficient ``i`` iff
    ``3n/8 >= i or i >= 5n/8`` (float comparison, reference quirk), inverse
    FFT real part (reference: spectral_residual.py:188-196)."""
    cleaned = deanomaly_entire(values, anomaly_idx)
    n = len(cleaned)
    coef = np.fft.fft(cleaned)
    i = np.arange(n, dtype=float)
    keep = (i <= n * 3.0 / 8.0) | (i >= n * 5.0 / 8.0)
    coef = np.where(keep, coef, 0.0 + 0.0j)
    return np.fft.ifft(coef).real


def _detect_core(
    timestamps: np.ndarray, values: np.ndarray, p: SrParams
) -> dict[str, np.ndarray]:
    """Single-batch detection (reference: spectral_residual.py:73-107).
    Returns columns as numpy arrays keyed by the reference schema names."""
    n = len(values)
    extended = extend_series(values)
    mags = spectral_residual_transform(extended, p.mag_window)
    scores = generate_spectral_score(mags, p.score_window)
    mags = mags[:n]
    scores = scores[:n]
    is_anom = scores > p.threshold

    out: dict[str, np.ndarray] = {
        "timestamp": timestamps,
        "value": values.astype(float),
        "mag": mags,
        "score": scores,
        "isAnomaly": is_anom,
    }

    if p.with_margin:
        anomaly_idx = np.flatnonzero(is_anom).tolist()
        expected = calculate_expected_value(values, anomaly_idx)
        units = boundary.calculate_boundary_unit_entire(values, is_anom)
        rescored = np.asarray(
            boundary.calculate_anomaly_scores(values, expected, units, is_anom),
            dtype=float,
        )
        margins = np.array(
            [boundary.calculate_margin(u, p.sensitivity) for u in units]
        )
        lower = expected - margins
        upper = expected + margins
        final_anom = (is_anom & (lower > values)) | (is_anom & (values > upper))
        out["score"] = rescored
        out["expectedValue"] = expected
        out["unit"] = units
        out["lowerBoundary"] = lower
        out["upperBoundary"] = upper
        out["isAnomaly"] = final_anom

    return out


def sr_detect(
    timestamps: np.ndarray, values: np.ndarray, params: SrParams | None = None
) -> dict[str, np.ndarray]:
    """Detect anomalies over one ordered series, in tumbling batches of
    ``params.batch_size`` points (clamped to [12, len]; 0 → whole series).
    A trailing fragment shorter than 12 points is re-detected on a window
    extended backward to ``batch_size`` and the overlap sliced off
    (reference: spectral_residual.py:46-71).
    """
    p = params or SrParams()
    values = np.asarray(values, dtype=float)
    timestamps = np.asarray(timestamps)
    n = len(values)
    if n < MIN_POINTS:
        raise ValueError(f"series must contain at least {MIN_POINTS} points")

    batch = p.batch_size if p.batch_size > 0 else n
    batch = min(n, max(MIN_POINTS, batch))

    pieces: list[dict[str, np.ndarray]] = []
    for start in range(0, n, batch):
        end = min(start + batch, n)
        if end - start >= MIN_POINTS:
            pieces.append(_detect_core(timestamps[start:end], values[start:end], p))
        else:
            ext_start = max(0, end - batch)
            full = _detect_core(timestamps[ext_start:end], values[ext_start:end], p)
            off = start - ext_start
            pieces.append({k: v[off:] for k, v in full.items()})

    return {k: np.concatenate([piece[k] for piece in pieces]) for k in pieces[0]}


def apply_gap_rule(
    timestamps: np.ndarray,
    detections: np.ndarray,
    scores: np.ndarray | None = None,
    max_back: int = 1000,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    """W15 — gap-as-anomaly post-rule (reference srcnn/utils.py:302-311).

    A point whose gap to its predecessor exceeds the series' minimum
    inter-arrival interval is forced anomalous (detection=1, score=1.0)
    when any detection — original or previously forced — occurred fewer
    than ``max_back`` *indices* back.  Forced points themselves count as
    detections for later gaps, exactly like the reference's running
    ``last`` pointer.

    The scan only iterates the gap indices (everything else is
    vectorized): the last *original* detection before every position is a
    ``maximum.accumulate`` and forced points are tracked with a single
    monotone pointer, so cost is O(n + #gaps) per series.

    Returns ``(detections, scores, forced_mask)``; inputs are not
    modified.  ``scores`` is None iff the input scores were None.
    """
    ts = np.asarray(timestamps)
    det = np.asarray(detections).astype(np.int64).copy()
    sc = None if scores is None else np.asarray(scores, dtype=np.float64).copy()
    n = len(ts)
    forced = np.zeros(n, dtype=bool)
    if n < 2:
        return det, sc, forced

    diffs = np.diff(ts)
    interval = diffs.min()
    idx = np.arange(n, dtype=np.int64)
    # last original detection at or before each index; -1 = none yet.
    # Index 0 is excluded on purpose: the reference scan starts at i=1,
    # so a detection at position 0 never sets its ``last`` pointer.
    last_orig = np.maximum.accumulate(np.where((det == 1) & (idx > 0), idx, -1))
    gap_idx = np.flatnonzero(diffs > interval) + 1

    last_forced = -1
    for i in gap_idx:
        last = max(last_orig[i - 1], last_forced)
        if last >= 0 and i - last < max_back:
            if det[i] == 0:
                forced[i] = True
            det[i] = 1
            if sc is not None:
                sc[i] = 1.0
        # any detection at i (original or just forced) becomes the new
        # ``last`` for subsequent gaps, as in the reference loop
        if det[i] == 1:
            last_forced = i
    return det, sc, forced
