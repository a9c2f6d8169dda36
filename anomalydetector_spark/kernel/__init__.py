from anomalydetector_spark.kernel.filters import average_filter, median_filter
from anomalydetector_spark.kernel import boundary
from anomalydetector_spark.kernel.api import DetectMode, SpectralResidual
from anomalydetector_spark.kernel.sr import (
    SrParams,
    sr_detect,
    spectral_residual_transform,
    generate_spectral_score,
    extend_series,
    predict_next,
    calculate_expected_value,
    deanomaly_entire,
)

__all__ = [
    "DetectMode",
    "SpectralResidual",
    "average_filter",
    "median_filter",
    "boundary",
    "SrParams",
    "sr_detect",
    "spectral_residual_transform",
    "generate_spectral_score",
    "extend_series",
    "predict_next",
    "calculate_expected_value",
    "deanomaly_entire",
]
