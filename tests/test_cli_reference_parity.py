"""CLI parity with the reference batch pipeline.

Error-contract cases mirror aml_component/tests/test_error_input.py:35-120
(each invalid input must raise the EXACT reference message), and the
functionality cases mirror test_functionality.py:42-221 (200-pt sine,
row counts preserved, mode-dependent column sets, batch=66)."""

import numpy as np
import pandas as pd
import pytest

from anomalydetector_spark import cli
from anomalydetector_spark.operators import errors


def _write_sine(spark, path, n=200, start="2018-01-01"):
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range(start, periods=n, freq="1D").astype(str),
            "value": np.sin(np.linspace(1, 20, n)),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return path


def _detect(spark, in_path, out_path, **kw):
    argv = [
        "detect", "--input-path", in_path, "--output-path", out_path,
        "--detect-mode", kw.get("mode", "AnomalyOnly"),
        "--batch-size", str(kw.get("batch_size", 0)),
    ]
    if kw.get("value_column"):
        argv += ["--value-column", kw["value_column"]]
    if kw.get("append"):
        argv += ["--append-mode"]
    cli.main(argv)
    return spark.read.parquet(out_path)


def test_detect_anomaly_only(spark, tmp_path):
    p = _write_sine(spark, str(tmp_path / "in"))
    out = _detect(spark, p, str(tmp_path / "out"))
    assert out.count() == 200
    assert {"timestamp", "value", "mag", "score", "isAnomaly"} <= set(out.columns)
    assert "expectedValue" not in out.columns


def test_detect_margin_mode_batch(spark, tmp_path):
    p = _write_sine(spark, str(tmp_path / "in"))
    out = _detect(spark, p, str(tmp_path / "out"), mode="AnomalyAndMargin",
                  batch_size=66)
    assert out.count() == 200
    assert {"expectedValue", "lowerBoundary", "upperBoundary"} <= set(out.columns)


def test_detect_append_mode(spark, tmp_path):
    p = _write_sine(spark, str(tmp_path / "in"))
    out = _detect(spark, p, str(tmp_path / "out"), append=True)
    assert out.count() == 200
    assert "value" in out.columns and "score" in out.columns


def _expect_error(spark, tmp_path, pdf, message, **kw):
    path = str(tmp_path / "in_err")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    with pytest.raises(Exception, match=__import__("re").escape(message)):
        _detect(spark, path, str(tmp_path / "out_err"), **kw)


def test_error_not_enough_points(spark, tmp_path):
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=5, freq="1D").astype(str),
         "value": [1.0] * 5}
    )
    _expect_error(spark, tmp_path, pdf, errors.NOT_ENOUGH_POINTS.format(12))


def test_error_invalid_batch_size(spark, tmp_path):
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=20, freq="1D").astype(str),
         "value": np.arange(20.0)}
    )
    _expect_error(
        spark, tmp_path, pdf, errors.INVALID_BATCH_SIZE.format(12), batch_size=5
    )


def test_error_column_not_found(spark, tmp_path):
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=20, freq="1D").astype(str),
         "value": np.arange(20.0)}
    )
    _expect_error(
        spark, tmp_path, pdf, errors.COLUMN_NOT_FOUND.format("nope"),
        value_column="nope",
    )


def test_error_malformed_timestamp(spark, tmp_path):
    ts = pd.date_range("2020-01-01", periods=20, freq="1D").astype(str).tolist()
    ts[3] = "not-a-time"
    pdf = pd.DataFrame({"timestamp": ts, "value": np.arange(20.0)})
    _expect_error(spark, tmp_path, pdf, errors.INVALID_TIMESTAMPS)


def test_error_descending_timestamps(spark, tmp_path):
    ts = pd.date_range("2020-01-01", periods=20, freq="1D").astype(str).tolist()
    ts[5], ts[6] = ts[6], ts[5]
    pdf = pd.DataFrame({"timestamp": ts, "value": np.arange(20.0)})
    _expect_error(spark, tmp_path, pdf, errors.INVALID_SERIES_ORDER)


def test_error_duplicate_timestamps(spark, tmp_path):
    ts = pd.date_range("2020-01-01", periods=20, freq="1D").astype(str).tolist()
    ts[6] = ts[5]
    pdf = pd.DataFrame({"timestamp": ts, "value": np.arange(20.0)})
    _expect_error(spark, tmp_path, pdf, errors.DUPLICATE_SERIES_TIMESTAMP)


def test_error_non_numeric_value(spark, tmp_path):
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=20, freq="1D").astype(str),
         "value": ["x"] * 20}
    )
    _expect_error(spark, tmp_path, pdf, errors.INVALID_VALUE_FORMAT.format("value"))


def test_error_nan_value(spark, tmp_path):
    vals = np.arange(20.0)
    vals[4] = np.nan
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=20, freq="1D").astype(str),
         "value": vals}
    )
    _expect_error(spark, tmp_path, pdf, errors.INVALID_SERIES_VALUE.format("value"))


def test_error_value_overflow(spark, tmp_path):
    vals = np.arange(20.0)
    vals[4] = 1e200
    pdf = pd.DataFrame(
        {"timestamp": pd.date_range("2020-01-01", periods=20, freq="1D").astype(str),
         "value": vals}
    )
    _expect_error(spark, tmp_path, pdf, errors.VALUE_OVERFLOW.format("value"))


def test_multi_column_detect(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "timestamp": pd.date_range("2020-01-01", periods=100, freq="1D").astype(str),
            "a": np.sin(np.linspace(0, 10, 100)),
            "b": np.cos(np.linspace(0, 10, 100)),
        }
    )
    path = str(tmp_path / "in_mc")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    out = _detect(spark, path, str(tmp_path / "out_mc"), value_column="a,b")
    assert out.count() == 100
    assert {"score_a", "isAnomaly_a", "score_b", "isAnomaly_b"} <= set(out.columns)
