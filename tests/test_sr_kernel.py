"""Contract + parity tests for the numpy SR kernel.

Shape/contract cases mirror the reference's own tests
(/root/reference/tests/test_spectral_residual.py:8-48): 100-pt linear ramp,
both detect modes, batch_size=33 path. Numeric cases pin down the filter
semantics (expanding-head average, centered float32 median) directly.
"""

import numpy as np
import pandas as pd
import pytest

from anomalydetector_spark.kernel import (
    SrParams,
    average_filter,
    extend_series,
    median_filter,
    predict_next,
    sr_detect,
)


def ramp(n=100):
    ts = pd.date_range("2020-01-01", periods=n, freq="1D").values
    return ts, np.linspace(1, 100, n)


def test_average_filter_expanding_head():
    v = np.array([2.0, 4.0, 6.0, 8.0, 10.0])
    out = average_filter(v, n=3)
    # head: mean of everything so far; body: trailing window of 3
    np.testing.assert_allclose(out, [2.0, 3.0, 4.0, 6.0, 8.0])


def test_average_filter_window_clamp():
    v = np.array([1.0, 2.0, 3.0])
    out = average_filter(v, n=10)  # n > len → expanding mean everywhere
    np.testing.assert_allclose(out, [1.0, 1.5, 2.0])


def test_median_filter_interior_and_edges():
    v = np.arange(10, dtype=float)
    # window=3 → odd width 3
    out = median_filter(v, 3, need_two_end=False)
    np.testing.assert_allclose(out, v)  # median of monotone = identity
    shuffled = np.array([5.0, 1.0, 4.0, 2.0, 8.0, 3.0, 9.0, 0.0])
    out = median_filter(shuffled, 3, need_two_end=False)
    # edges untouched in one-end mode
    assert out[0] == 5.0 and out[-1] == 0.0
    np.testing.assert_allclose(out[1:-1], [4.0, 2.0, 4.0, 3.0, 8.0, 3.0])


def test_median_filter_two_end_shrinks():
    v = np.array([3.0, 1.0, 2.0, 5.0, 4.0])
    out = median_filter(v, 4, need_two_end=True)  # width 5
    # position 0: median of v[0:3]=2; position 4: median of v[2:5]=4
    assert out[0] == 2.0 and out[-1] == 4.0
    assert out[2] == 3.0  # full window median


def test_median_filter_short_series_returned_unchanged():
    v = np.array([1.0, 2.0])
    out = median_filter(v, 10, need_two_end=True)
    np.testing.assert_allclose(out, v)


def test_predict_next_matches_formula():
    v = np.array([1.0, 2.0, 3.0, 4.0])
    # slopes to last: (4-1)/3, (4-2)/2, (4-3)/1 → sum=3; anchored at v[1]=2
    assert predict_next(v) == pytest.approx(5.0)
    with pytest.raises(ValueError):
        predict_next(np.array([1.0]))


def test_extend_series_appends_five():
    v = np.linspace(1, 20, 20)
    ext = extend_series(v)
    assert len(ext) == 25
    assert np.all(ext[20:] == ext[20])


def test_anomaly_only_mode_contract():
    ts, v = ramp()
    out = sr_detect(ts, v, SrParams(score_window=21, batch_size=0))
    assert len(out["score"]) == 100
    for col in ("timestamp", "value", "mag", "score", "isAnomaly"):
        assert col in out
    assert "expectedValue" not in out


def test_anomaly_and_margin_mode_contract():
    ts, v = ramp()
    out = sr_detect(ts, v, SrParams(score_window=21, batch_size=0, with_margin=True))
    assert len(out["score"]) == 100
    for col in ("expectedValue", "upperBoundary", "lowerBoundary", "unit"):
        assert col in out
    # margin-mode boundaries must bracket the expected value
    assert np.all(out["upperBoundary"] >= out["expectedValue"])
    assert np.all(out["lowerBoundary"] <= out["expectedValue"])


def test_batch_mode_contract():
    ts, v = ramp()
    out = sr_detect(ts, v, SrParams(score_window=21, batch_size=33, with_margin=True))
    assert len(out["score"]) == 100  # 33+33+33+1, tail re-detected & sliced


def test_batch_tail_extension_equals_whole_window_slice():
    """The <12-pt tail is re-detected on a backward-extended window; the
    sliced rows must equal the corresponding rows of a standalone run on
    that extended window (reference: spectral_residual.py:58-71)."""
    ts, v = ramp(70)
    out = sr_detect(ts, v, SrParams(batch_size=64))
    ref_tail = sr_detect(ts[6:70], v[6:70], SrParams(batch_size=0))
    np.testing.assert_allclose(out["score"][64:], ref_tail["score"][58:])
    np.testing.assert_allclose(out["mag"][64:], ref_tail["mag"][58:])


def test_spike_detected():
    ts = pd.date_range("2020-01-01", periods=200, freq="1h").values
    rng = np.random.default_rng(7)
    v = np.sin(np.linspace(0, 12, 200)) + rng.normal(0, 0.02, 200)
    v[120] += 5.0
    out = sr_detect(ts, v, SrParams())
    assert out["isAnomaly"][120]
    assert out["isAnomaly"].sum() <= 10  # no blanket firing


def test_min_points_enforced():
    ts, v = ramp(10)
    with pytest.raises(ValueError):
        sr_detect(ts, v, SrParams())


class TestReferenceApiSurface:
    """Drop-in SpectralResidual class: the reference's own shape contract
    (reference tests/test_spectral_residual.py:8-48)."""

    def _ramp(self):
        import pandas as pd
        import numpy as np
        return pd.DataFrame({
            "timestamp": pd.date_range("2020-01-01", periods=100, freq="D"),
            "value": np.linspace(1, 100, 100),
        })

    def test_anomaly_only_columns(self):
        from anomalydetector_spark.kernel import DetectMode, SpectralResidual
        out = SpectralResidual(self._ramp()).detect()
        assert len(out) == 100
        assert list(out.columns) == ["timestamp", "value", "mag", "score", "isAnomaly"]

    def test_margin_mode_columns_and_batch(self):
        from anomalydetector_spark.kernel import DetectMode, SpectralResidual
        out = SpectralResidual(
            self._ramp(),
            detect_mode=DetectMode.anomaly_and_margin,
            batch_size=33,
        ).detect()
        assert len(out) == 100
        for c in ["expectedValue", "unit", "lowerBoundary", "upperBoundary"]:
            assert c in out.columns

    def test_memoized(self):
        from anomalydetector_spark.kernel import SpectralResidual
        sr = SpectralResidual(self._ramp())
        assert sr.detect() is sr.detect()
