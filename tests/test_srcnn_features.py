"""W14 sliding SR featurizer: geometry vs an independent transliteration
of the reference loop, transform parity vs srcnn's own
``spectral_residual`` (imported with torch/tqdm stubbed)."""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pandas as pd
import pytest


def _naive_reference_loop(value, window, back_k=0, backaddnum=5, step=1):
    """Direct, independent transliteration of srcnn/utils.py:279-299
    (sr_cnn_eval without the CNN): used as the geometry oracle."""
    from anomalydetector_spark.kernel.sr import (
        extend_series,
        spectral_residual_transform,
    )

    length = len(value)
    back = back_k if back_k <= 5 else 5
    scores = [0.0] * (window - backaddnum)
    for pt in range(window - backaddnum + back + step, length - back, step):
        head = max(0, pt - (window - backaddnum))
        tail = min(length, pt)
        wave = extend_series(np.array(value[head : tail + back], dtype=float))
        mag = spectral_residual_transform(wave)
        for ipt in range(pt - step - back, pt - back):
            scores.append(float(mag[ipt - head]))
    scores += [0.0] * (length - len(scores))
    return np.array(scores[:length])


@pytest.mark.parametrize(
    "n,window,back_k,step",
    [(200, 64, 0, 1), (200, 64, 3, 1), (150, 32, 0, 2), (90, 128, 0, 1)],
)
def test_feature_series_geometry(n, window, back_k, step):
    from anomalydetector_spark.operators.srcnn_features import sr_feature_series

    rng = np.random.default_rng(5)
    v = np.sin(np.arange(n) * 0.2) * 10 + rng.normal(0, 0.5, n)
    got = sr_feature_series(v, window, back_k=back_k, step=step)
    want = _naive_reference_loop(v, window, back_k=back_k, step=step)
    assert len(got) == n
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # reference head-fill contract
    assert (got[: max(0, window - 5)] == 0).all()


def test_transform_matches_srcnn_module():
    """our spectral_residual_transform == srcnn/utils.py spectral_residual
    (the saliency the CNN consumes), on the same window."""
    path = "/root/reference/srcnn/utils.py"
    try:
        open(path).close()
    except OSError:
        pytest.skip("reference repo not available")

    # srcnn/utils.py imports torch/tqdm/srcnn.net at module level; none are
    # used by the function under test — stub them.
    stubs = {}
    torch = types.ModuleType("torch")
    torch.nn = types.ModuleType("torch.nn")
    torch.nn.Module = object
    tud = types.ModuleType("torch.utils.data")
    tud.Dataset = object
    tud.DataLoader = object
    tu = types.ModuleType("torch.utils")
    tu.data = tud
    torch.utils = tu
    ta = types.ModuleType("torch.autograd")
    ta.Variable = object
    torch.autograd = ta
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, *a, **k: x
    srcnn_pkg = types.ModuleType("srcnn")
    srcnn_net = types.ModuleType("srcnn.net")
    srcnn_pkg.net = srcnn_net
    for name, mod in {
        "torch": torch,
        "torch.nn": torch.nn,
        "torch.utils": tu,
        "torch.utils.data": tud,
        "torch.autograd": ta,
        "tqdm": tqdm_mod,
        "srcnn": srcnn_pkg,
        "srcnn.net": srcnn_net,
    }.items():
        if name not in sys.modules:
            stubs[name] = mod

    # msanomalydetector import inside utils.py: reuse the parity fixture
    # technique — our median filter injected (not used by the function
    # under test either).
    from anomalydetector_spark.kernel.filters import median_filter

    cy = types.ModuleType("msanomalydetector._anomaly_kernel_cython")
    cy.median_filter = median_filter
    had_msad = "msanomalydetector" in sys.modules
    saved = {
        k: sys.modules[k]
        for k in list(sys.modules)
        if k.startswith("msanomalydetector")
    }
    for k in saved:
        del sys.modules[k]
    sys.modules.update(stubs)
    sys.modules["msanomalydetector._anomaly_kernel_cython"] = cy
    sys.path.insert(0, "/root/reference")
    sys.dont_write_bytecode = True
    try:
        spec = importlib.util.spec_from_file_location("ref_srcnn_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        from anomalydetector_spark.kernel.sr import spectral_residual_transform

        rng = np.random.default_rng(9)
        for n in (30, 64, 128):
            v = np.abs(rng.normal(10, 3, n))
            np.testing.assert_allclose(
                spectral_residual_transform(v),
                mod.spectral_residual(v),
                rtol=1e-9,
                err_msg=f"n={n}",
            )
    finally:
        sys.dont_write_bytecode = False
        sys.path.remove("/root/reference")
        for name in stubs:
            sys.modules.pop(name, None)
        for k in list(sys.modules):
            if k.startswith("msanomalydetector"):
                del sys.modules[k]
        sys.modules.update(saved)
        _ = had_msad


def test_sliding_sr_features_spark(spark):
    from anomalydetector_spark.operators.srcnn_features import (
        sliding_sr_features,
        sr_feature_series,
    )

    rng = np.random.default_rng(2)
    frames = []
    for key in ("a", "b"):
        n = 120
        v = np.sin(np.arange(n) * 0.25) * 5 + rng.normal(0, 0.3, n)
        v[70] += 40  # spike
        frames.append(
            pd.DataFrame(
                {
                    "series_key": key,
                    "ts": pd.date_range("2022-01-01", periods=n, freq="h"),
                    "value": v,
                }
            )
        )
    pdf = pd.concat(frames)
    df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=0))  # shuffled

    out = (
        sliding_sr_features(df, window=64)
        .toPandas()
        .sort_values(["series_key", "ts"])
    )
    assert len(out) == len(pdf)
    for key in ("a", "b"):
        got = out[out["series_key"] == key]["sr_feature"].to_numpy()
        want = sr_feature_series(
            pdf[pdf["series_key"] == key]["value"].to_numpy(), 64
        )
        np.testing.assert_allclose(got, want, rtol=1e-9)
    # the spike position carries a clearly elevated saliency
    a = out[out["series_key"] == "a"]["sr_feature"].to_numpy()
    assert a[70] > 5 * np.median(a[60:70])


def test_vectorized_equals_loop_large():
    """Vectorized path == per-window loop across chunk boundaries and
    parameter corners (incl. step>1 and back>0)."""
    from anomalydetector_spark.operators.srcnn_features import (
        _sr_feature_series_loop,
        sr_feature_series,
    )

    rng = np.random.default_rng(13)
    v = np.cumsum(rng.normal(0, 1, 9000)) + 50
    for window, back_k, step in [(64, 0, 1), (64, 3, 1), (128, 5, 1), (32, 0, 3)]:
        got = sr_feature_series(v, window, back_k=back_k, step=step)
        want = _sr_feature_series_loop(v, window, back_k=back_k, step=step)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12,
                                   err_msg=f"w={window} back={back_k} step={step}")
