#!/usr/bin/env python
"""Single-node kernel throughput: our SR kernel vs the reference's.

The task's bar is "matches-or-beats the reference's single-node
throughput at the same data scale". The reference's unit of work is one
pandas series through ``SpectralResidual.detect()`` (main.py over the
4000-pt sample.csv shape); this tool times both implementations on the
same series set and prints one JSON line.

The reference is imported verbatim from /root/reference with our median
filter injected for its uncompilable Cython symbol (same technique as
tests/test_reference_parity.py — the substitution is itself
golden-fixture-validated, and it only makes the reference FASTER, so the
comparison is conservative).
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time
import types

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_reference():
    from anomalydetector_spark.kernel.filters import median_filter

    stub = types.ModuleType("msanomalydetector._anomaly_kernel_cython")
    stub.median_filter = median_filter
    sys.modules["msanomalydetector._anomaly_kernel_cython"] = stub
    sys.path.insert(0, "/root/reference")
    sys.dont_write_bytecode = True
    return importlib.import_module("msanomalydetector")


def _series(n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    v = np.sin(np.arange(n) * 0.02) * 10 + rng.normal(0, 0.4, n)
    v[rng.choice(n, n // 100, replace=False)] += 25
    return pd.DataFrame(
        {
            "timestamp": pd.date_range("2024-01-01", periods=n, freq="min"),
            "value": v,
        }
    )


def main() -> None:
    n_points = int(os.environ.get("SPARK_GRAFT_KERNEL_POINTS", "4000"))
    n_series = int(os.environ.get("SPARK_GRAFT_KERNEL_SERIES", "50"))
    batch = 2000  # reference pipeline default (ad_component.yaml:35)

    ref = _load_reference()
    from anomalydetector_spark.kernel import DetectMode, SpectralResidual

    frames = [_series(n_points, s) for s in range(n_series)]
    results = {}
    for mode_name, ref_mode, our_mode in (
        ("anomaly_only", ref.DetectMode.anomaly_only, DetectMode("AnomalyOnly")),
        (
            "anomaly_and_margin",
            ref.DetectMode.anomaly_and_margin,
            DetectMode("AnomalyAndMargin"),
        ),
    ):
        t0 = time.perf_counter()
        for f in frames:
            ref.SpectralResidual(
                f.copy(), 0.3, 3, 40, 99, ref_mode, batch
            ).detect()
        t_ref = time.perf_counter() - t0

        t0 = time.perf_counter()
        for f in frames:
            SpectralResidual(f.copy(), 0.3, 3, 40, 99, our_mode, batch).detect()
        t_ours = time.perf_counter() - t0

        pts = n_points * n_series
        results[mode_name] = {
            "reference_pts_per_sec": round(pts / t_ref, 1),
            "ours_pts_per_sec": round(pts / t_ours, 1),
            "speedup_vs_reference": round(t_ref / t_ours, 3),
        }

    print(
        json.dumps(
            {
                "metric": "kernel_throughput_vs_reference",
                "points_per_series": n_points,
                "n_series": n_series,
                "modes": results,
            }
        )
    )


if __name__ == "__main__":
    main()
