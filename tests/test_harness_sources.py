"""S4/S5 reference test-harness scans (srcnn/utils.py:41-43, 228-244)."""

import json
import pickle

import numpy as np
import pytest

from anomalydetector_spark.sources.harness import (
    read_json_windows,
    read_pickle_series,
)


@pytest.fixture()
def pkl_dir(tmp_path):
    rng = np.random.default_rng(4)
    truth = {}
    d = tmp_path / "pkl"
    d.mkdir()
    for i in range(3):
        n = int(rng.integers(20, 60))
        data = {
            "timestamp": (1_600_000_000 + np.arange(n) * 60).tolist(),
            "value": rng.normal(10, 2, n).round(6).tolist(),
            "label": (rng.random(n) < 0.1).astype(int).tolist(),
        }
        truth[f"s{i}.pkl"] = data
        with open(d / f"s{i}.pkl", "wb") as f:
            pickle.dump(data, f)
    return str(d), truth


def test_read_pickle_series_matches_reference_format(spark, pkl_dir):
    path, truth = pkl_dir
    df = read_pickle_series(spark, path).toPandas()
    assert set(df["series_id"]) == set(truth)
    for sid, data in truth.items():
        grp = df[df["series_id"] == sid].sort_values("ts")
        assert grp["ts"].tolist() == data["timestamp"]
        np.testing.assert_allclose(grp["value"].to_numpy(), data["value"])
        assert grp["label"].tolist() == data["label"]


def test_read_pickle_series_missing_label(spark, tmp_path):
    p = tmp_path / "one.pkl"
    with open(p, "wb") as f:
        pickle.dump({"timestamp": [1, 2, 3], "value": [1.0, 2.0, 3.0]}, f)
    df = read_pickle_series(spark, str(p)).toPandas().sort_values("ts")
    assert df["label"].tolist() == [0, 0, 0]


def test_read_json_windows(spark, tmp_path):
    rng = np.random.default_rng(9)
    w = 16
    windows = [
        [rng.normal(0, 1, w).round(6).tolist(),
         (rng.random(w) < 0.2).astype(float).tolist()]
        for _ in range(5)
    ]
    p = tmp_path / "train.json"
    p.write_text(json.dumps(windows))

    df = read_json_windows(spark, str(p)).toPandas().sort_values("window_id")
    assert len(df) == 5
    for i, (vals, labs) in enumerate(windows):
        row = df[df["window_id"] == i].iloc[0]
        np.testing.assert_allclose(list(row["value"]), vals)
        np.testing.assert_allclose(list(row["label"]), labs)
