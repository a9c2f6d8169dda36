"""Drop-in reference API: ``SpectralResidual`` + ``DetectMode``.

A user of the reference library imports

    from msanomalydetector import SpectralResidual, DetectMode

and calls ``SpectralResidual(series, ...).detect()`` on a pandas frame
with ``timestamp, value`` columns (reference
msanomalydetector/spectral_residual.py:36-56, __init__.py:1-4). This
module provides the same constructor surface and result frame over this
repo's kernel, so switching is an import change:

    from anomalydetector_spark.kernel import SpectralResidual, DetectMode
"""

from __future__ import annotations

from enum import Enum

import pandas as pd

from anomalydetector_spark.kernel.sr import (
    MAG_WINDOW,
    SCORE_WINDOW,
    THRESHOLD,
    SrParams,
    sr_detect,
)

_ANOMALY_ONLY_COLS = ["timestamp", "value", "mag", "score", "isAnomaly"]
_MARGIN_COLS = _ANOMALY_ONLY_COLS + [
    "expectedValue",
    "unit",
    "lowerBoundary",
    "upperBoundary",
]


class DetectMode(Enum):
    """Reference enum values verbatim (util.py:46-48)."""

    anomaly_only = "AnomalyOnly"
    anomaly_and_margin = "AnomalyAndMargin"


class SpectralResidual:
    """Single-series detector with the reference's constructor defaults
    (spectral_residual.py:36-50; util.py:39-43) and memoized ``detect()``
    (spectral_residual.py:52-56)."""

    def __init__(
        self,
        series: pd.DataFrame,
        threshold: float = THRESHOLD,
        mag_window: int = MAG_WINDOW,
        score_window: int = SCORE_WINDOW,
        sensitivity: float = 99,
        detect_mode: DetectMode = DetectMode.anomaly_only,
        batch_size: int = -1,
    ) -> None:
        self.__series__ = series
        self.__params = SrParams(
            threshold=threshold,
            mag_window=mag_window,
            score_window=score_window,
            sensitivity=sensitivity,
            batch_size=max(batch_size, 0),  # ≤0 → whole series, like the ref
            with_margin=detect_mode == DetectMode.anomaly_and_margin,
        )
        self.__detect_mode = detect_mode
        self.__anomaly_frame: pd.DataFrame | None = None

    def detect(self) -> pd.DataFrame:
        if self.__anomaly_frame is None:
            self.__anomaly_frame = self.__detect()
        return self.__anomaly_frame

    def __detect(self) -> pd.DataFrame:
        res = sr_detect(
            self.__series__["timestamp"].to_numpy(),
            self.__series__["value"].to_numpy(),
            self.__params,
        )
        cols = (
            _MARGIN_COLS
            if self.__detect_mode == DetectMode.anomaly_and_margin
            else _ANOMALY_ONLY_COLS
        )
        return pd.DataFrame({c: res[c] for c in cols})
