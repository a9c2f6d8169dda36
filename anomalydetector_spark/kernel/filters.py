"""Linear-time sliding filters used by the Spectral-Residual kernel.

From-scratch reimplementations (numpy / pandas-rolling) of the reference
semantics:

* trailing mean with an expanding head window
  (reference: msanomalydetector/util.py:51-73 ``average_filter``)
* centered sliding median computed in float32
  (reference: msanomalydetector/_anomaly_kernel_cython.pyx:18-65
  ``median_filter`` — an insertion-sorted C kernel; here expressed as a
  pandas ``rolling(...).median()``, which is C-speed already and keeps the
  exact same window bounds).

These run inside Arrow/pandas UDFs on small per-group series, so plain
numpy is the right tool — there is no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["average_filter", "median_filter"]


def average_filter(values: np.ndarray, n: int = 3) -> np.ndarray:
    """Trailing mean over a window of ``n`` points with an expanding head.

    ``res[i] = mean(values[max(0, i-n+1) .. i])`` — i.e. the divisor is
    ``min(n, i+1)``, so the first ``n-1`` outputs average everything seen
    so far.  Semantics match the reference's cumsum formulation
    (msanomalydetector/util.py:51-73) including the clamp ``n = len(values)``
    when the window exceeds the series.
    """
    values = np.asarray(values, dtype=float)
    m = len(values)
    if m == 0:
        return values.copy()
    if n >= m:
        n = m

    out = np.cumsum(values, dtype=float)
    # body: difference of cumsums = sliding sum of exactly n points
    out[n:] = (out[n:] - out[:-n]) / n
    # head: cumsum itself divided by the expanding count
    out[1:n] = out[1:n] / np.arange(2, n + 1, dtype=float)
    return out


def median_filter(
    data: np.ndarray, window: int, need_two_end: bool = False
) -> np.ndarray:
    """Centered sliding median with float32 arithmetic.

    Window width is forced odd: ``w = window//2*2 + 1``.  For interior
    points the output is the median of the ``w`` points centered on the
    position.  At the edges:

    * ``need_two_end=True``: the window shrinks to whatever is available
      (head position ``j`` sees ``data[0 : j + w//2 + 1]``, tail position
      ``i`` sees ``data[i - w//2 : end]``) — exactly what
      ``rolling(w, center=True, min_periods=1)`` computes.
    * ``need_two_end=False``: the first and last ``w//2`` outputs keep the
      input values unchanged.

    If the series is shorter than ``w`` the input is returned unchanged
    (as float32-rounded values).  All medians are computed over
    float32-rounded inputs and the result is rounded back to float32
    before being returned as float64 — this reproduces the reference's C
    ``float`` kernel to unit-test tolerance
    (msanomalydetector/_anomaly_kernel_cython.pyx:18-65; float-parity note
    in SURVEY.md §7.3).
    """
    arr32 = np.asarray(data, dtype=np.float32)
    t_len = len(arr32)
    w_len = window // 2 * 2 + 1
    if t_len < w_len:
        return arr32.astype(float)

    med = (
        pd.Series(arr32.astype(float))
        .rolling(w_len, center=True, min_periods=1)
        .median()
        .to_numpy()
    )
    # Even-count medians average two float32 values; rounding the float64
    # result back to float32 equals the reference's float32 arithmetic.
    med = med.astype(np.float32)

    half = w_len // 2
    out = arr32.copy()
    if need_two_end:
        out[:] = med
    else:
        out[half : t_len - half] = med[half : t_len - half]
    return out.astype(float)
