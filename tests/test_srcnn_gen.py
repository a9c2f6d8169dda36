"""SR-CNN training-window generation: bit-for-bit parity with the
reference generator (srcnn/generate_data.py gen.generate_train_data,
imported with torch/srcnn.utils stubbed), plus the Spark operator's
round-trip through the reference JSON format."""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pandas as pd
import pytest

from anomalydetector_spark.operators.srcnn_features import (
    generate_train_windows_np,
    generate_training_windows,
    write_reference_train_json,
)


@pytest.fixture(scope="module")
def ref_gen():
    """Import the reference's gen class. generate_data.py needs
    ``srcnn.utils`` (star-import — only np/json reach the gen class) and
    ``msanomalydetector.util.average_filter`` (pure python; the cython
    kernel is stubbed with ours, same trick as test_reference_parity)."""
    path = "/root/reference/srcnn/generate_data.py"
    try:
        open(path).close()
    except OSError:
        pytest.skip("reference repo not available")

    from anomalydetector_spark.kernel.filters import median_filter

    stubs = {}
    utils_stub = types.ModuleType("srcnn.utils")
    utils_stub.np = np
    import json as _json

    utils_stub.json = _json
    utils_stub.__all__ = ["np", "json"]
    srcnn_pkg = types.ModuleType("srcnn")
    srcnn_pkg.utils = utils_stub
    cy = types.ModuleType("msanomalydetector._anomaly_kernel_cython")
    cy.median_filter = median_filter

    saved = {
        k: sys.modules[k]
        for k in list(sys.modules)
        if k.startswith("msanomalydetector") or k.startswith("srcnn")
    }
    for k in saved:
        del sys.modules[k]
    stubs = {"srcnn": srcnn_pkg, "srcnn.utils": utils_stub}
    sys.modules.update(stubs)
    sys.modules["msanomalydetector._anomaly_kernel_cython"] = cy
    sys.path.insert(0, "/root/reference")
    sys.dont_write_bytecode = True
    try:
        spec = importlib.util.spec_from_file_location("ref_srcnn_gen", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.dont_write_bytecode = False
        sys.path.remove("/root/reference")
        for name in list(stubs) + [
            k for k in list(sys.modules) if k.startswith("msanomalydetector")
        ]:
            sys.modules.pop(name, None)
        sys.modules.update(saved)


@pytest.mark.parametrize("seed,n,window,step,num", [
    (54321, 400, 128, 64, 10),   # the reference CLI defaults
    (7, 300, 64, 16, 4),
    (99, 150, 32, 8, 2),         # num=2 → randint(1,2) always 1 anomaly
])
def test_generator_parity_with_reference(ref_gen, seed, n, window, step, num):
    rng = np.random.default_rng(seed)
    values = np.abs(rng.normal(50, 12, n)).tolist()

    np.random.seed(seed)
    generator = ref_gen.gen(window, step, num)
    want = generator.generate_train_data(values)

    got = generate_train_windows_np(
        values, win_siz=window, step=step, nums=num, seed=seed
    )
    assert len(got) == len(want) > 0
    for (gd, gl), (wd, wl) in zip(got, want):
        np.testing.assert_allclose(gd, wd, rtol=0, atol=0)  # bit-exact
        assert gl == wl


def test_control_counter_forces_anomaly_position(ref_gen):
    """The stateful control counter (generate_data.py:63-69) eventually
    forces position win-6; with num=2 and a small window the forcing
    path triggers within a long series — parity covers it."""
    seed, n, window, step, num = 3, 5000, 16, 1, 2
    rng = np.random.default_rng(seed)
    values = rng.normal(0, 1, n).tolist()
    np.random.seed(seed)
    want = ref_gen.gen(window, step, num).generate_train_data(values)
    got = generate_train_windows_np(
        values, win_siz=window, step=step, nums=num, seed=seed
    )
    assert len(got) == len(want)
    forced = [i for i, (_, wl) in enumerate(want) if wl[window - 6] == 1]
    assert forced, "fixture must exercise the control-forcing branch"
    for (gd, gl), (wd, wl) in zip(got, want):
        np.testing.assert_allclose(gd, wd)
        assert gl == wl


def test_spark_generation_roundtrip(spark, tmp_path):
    """generate → write reference JSON → read_json_windows: shapes,
    values and labels survive the round trip; single-series Spark output
    equals the plain-numpy generator for the same seed."""
    from anomalydetector_spark.sources.harness import read_json_windows

    seed, n, window, step, num = 11, 500, 64, 32, 6
    rng = np.random.default_rng(seed)
    values = np.abs(rng.normal(20, 5, n))
    pdf = pd.DataFrame(
        {
            "series_id": "s0",
            "ts": pd.date_range("2025-01-01", periods=n, freq="min"),
            "value": values,
        }
    )
    out = generate_training_windows(
        spark.createDataFrame(pdf),
        window=window, step=step, num=num, seed=seed,
        reseed_per_series=False,
    )
    rows = out.orderBy("window_id").collect()
    want = generate_train_windows_np(
        values, win_siz=window, step=step, nums=num, seed=seed
    )
    assert len(rows) == len(want)
    for r, (wd, wl) in zip(rows, want):
        np.testing.assert_allclose(list(r["data"]), wd)
        assert list(r["labels"]) == wl

    path = str(tmp_path / "train.json")
    n_written = write_reference_train_json(out, path)
    assert n_written == len(want)
    back = read_json_windows(spark, path).orderBy("window_id").collect()
    assert len(back) == len(want)
    for r, (wd, wl) in zip(back, want):
        np.testing.assert_allclose(list(r["value"]), wd)
        assert [int(x) for x in r["label"]] == wl


def test_spark_generation_multi_series(spark):
    """Per-series reseeding yields independent anomaly placements;
    series shorter than the window are skipped like the reference."""
    n = 300
    rng = np.random.default_rng(2)
    frames = [
        pd.DataFrame(
            {
                "series_id": sid,
                "ts": pd.date_range("2025-01-01", periods=n, freq="min"),
                "value": np.abs(rng.normal(10, 2, n)),
            }
        )
        for sid in ("a", "b")
    ]
    frames.append(
        pd.DataFrame(
            {
                "series_id": "tiny",
                "ts": pd.date_range("2025-01-01", periods=10, freq="min"),
                "value": np.ones(10),
            }
        )
    )
    out = generate_training_windows(
        spark.createDataFrame(pd.concat(frames)),
        window=64, step=32, num=6, seed=5,
    ).toPandas()
    assert set(out["series_id"]) == {"a", "b"}  # tiny skipped
    la = out[out["series_id"] == "a"].sort_values("window_id")["labels"]
    lb = out[out["series_id"] == "b"].sort_values("window_id")["labels"]
    assert len(la) == len(lb) > 0
    assert [list(x) for x in la] != [list(x) for x in lb]  # independent draws
    # every window: correct width, labels mark at least one anomaly
    for _, r in out.iterrows():
        assert len(r["data"]) == 64 and len(r["labels"]) == 64
        assert sum(r["labels"]) >= 1
