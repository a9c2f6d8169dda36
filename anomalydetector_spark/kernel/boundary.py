"""Margin / boundary-unit / anomaly-score math for AnomalyAndMargin mode.

From-scratch reimplementation of the reference semantics in
msanomalydetector/boundary_utils.py:

* ``FACTORS`` — the 101-entry sensitivity→margin-factor table.  The
  reference hardcodes the numbers but documents the generating recurrence
  in a comment (boundary_utils.py:6-14); we *generate* the table from that
  recurrence, which reproduces the hardcoded values bit-for-bit (verified
  by the golden margin tests in tests/test_boundary_golden.py).
* ``calculate_boundary_unit_entire`` / ``..._last``
  (boundary_utils.py:38-74): |median-filter trend| blended with the mean
  over non-anomalous points, clipped to at least 1.0.
* ``calculate_margin`` (boundary_utils.py:77-95): piecewise-exponential
  interpolation into the factor table.
* ``calculate_anomaly_score`` (boundary_utils.py:98-120): piecewise-linear
  placement of |expected - value| within the 101 margin levels.
"""

from __future__ import annotations

import numpy as np

from anomalydetector_spark.kernel.filters import median_filter

__all__ = [
    "FACTORS",
    "calculate_boundary_unit_entire",
    "calculate_boundary_unit_last",
    "calculate_margin",
    "calculate_anomaly_score",
    "calculate_anomaly_scores",
]


def _build_factors() -> np.ndarray:
    """Generate the margin-factor table from the documented recurrence
    (reference: msanomalydetector/boundary_utils.py:6-14 pseudo-code)."""
    tail = [1.0]
    for i in range(50):
        if i < 40:
            tail.append(tail[-1] / (1.15 + 0.001 * i))
        else:
            tail.append(tail[-1] / (1.25 + 0.01 * i))
    head: list[float] = []
    for i in range(50):
        prev = head[0] if head else tail[0]
        head.insert(0, prev * (1.25 + 0.001 * i))
    return np.array(head + tail, dtype=float)


FACTORS = _build_factors()


def calculate_boundary_unit_entire(
    data: np.ndarray, is_anomaly: np.ndarray
) -> np.ndarray:
    """Per-point boundary units: 0.5·|trend| + 0.5·mean(|trend| over normal
    points), clipped to [1.0, max]. Reference: boundary_utils.py:54-74."""
    data = np.asarray(data, dtype=float)
    n = len(data)
    if n == 0:
        return np.array([], dtype=float)

    window = int(min(n // 3, 512))
    trends = np.abs(median_filter(data, window, need_two_end=True))
    mask = ~np.asarray(is_anomaly, dtype=bool)
    if mask.any():
        units = 0.5 * trends + 0.5 * trends[mask].mean()
    else:
        units = trends

    if not np.all(np.isfinite(units)):
        raise ValueError("boundary units must be finite")
    return np.clip(units, 1.0, max(units.max(), 1.0))


def calculate_boundary_unit_last(data: np.ndarray) -> float:
    """Scalar unit for the latest point, computed on all but the last value.
    Reference: boundary_utils.py:38-51."""
    data = np.asarray(data, dtype=float)
    if len(data) == 0:
        return 0.0
    size = len(data) - 1
    window = int(min(size // 3, 512))
    trends = np.abs(median_filter(data[:size], window, need_two_end=True))
    unit = max(float(trends.mean()), 1.0)
    if not np.isfinite(unit):
        raise ValueError("boundary unit must be finite")
    return unit


def calculate_margin(unit: float, sensitivity: float) -> float:
    """Margin width for a sensitivity in [0, 100]; 100 → 0 margin.
    Linear interpolation between adjacent factor-table entries.
    Reference: boundary_utils.py:77-95."""
    if sensitivity < 0 or sensitivity > 100:
        raise ValueError("sensitivity should be integer in [0, 100]")
    if unit <= 0:
        raise ValueError("unit should be a positive number")
    if sensitivity == 100:
        return 0.0
    lb = int(sensitivity)
    frac = 1.0 - sensitivity + lb
    return (FACTORS[lb + 1] + (FACTORS[lb] - FACTORS[lb + 1]) * frac) * unit


def calculate_anomaly_score(
    value: float, expected_value: float, unit: float, is_anomaly: bool
) -> float:
    """Severity in [0, 1]: position of |expected − value| within the 101
    margin levels (margins shrink as sensitivity rises, so the lookup runs
    over the reversed table). Reference: boundary_utils.py:98-114."""
    if not is_anomaly:
        return 0.0
    distance = abs(expected_value - value)
    # margins at sensitivity 100..0 → ascending sequence
    margins = np.array(
        [calculate_margin(unit, s) for s in range(100, -1, -1)], dtype=float
    )
    lb = int(np.searchsorted(margins, distance, side="left"))
    if lb == 0:
        return 0.0
    if lb >= 100:
        return 1.0
    a, b = margins[lb - 1], margins[lb]
    return (lb - 1 + (distance - a) / (b - a)) / 100.0


def calculate_anomaly_scores(values, expected_values, units, is_anomaly):
    """Vector wrapper over ``calculate_anomaly_score``
    (reference: boundary_utils.py:117-120)."""
    return [
        calculate_anomaly_score(v, e, u, a)
        for v, e, u, a in zip(values, expected_values, units, is_anomaly)
    ]
