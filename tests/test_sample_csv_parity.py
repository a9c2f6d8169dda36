"""End-to-end CLI parity on the reference's OWN sample data.

/root/reference/samples/sample.csv (4000 pts, 1-min cadence) is the
reference's smoke input (main.py). Our full CLI path — csv read, typed
casts, applyInPandas detection, parquet sink — must reproduce the
reference library's numbers on it exactly.

(main.py itself calls SpectralResidual with six args against a
seven-positional-arg constructor — it would TypeError as checked in; the
semantics it documents are batch_size<=0 → whole series, which both
sides use here.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

SAMPLE = Path("/root/reference/samples/sample.csv")

pytestmark = pytest.mark.skipif(
    not SAMPLE.exists(), reason="reference sample.csv not available"
)


def test_cli_detect_matches_reference_on_sample(spark, tmp_path, ref):
    from anomalydetector_spark import cli

    out_dir = str(tmp_path / "out")
    cli.main(
        [
            "detect",
            "--input-path", str(SAMPLE),
            "--output-path", out_dir,
            "--detect-mode", "AnomalyOnly",
            "--batch-size", "0",
        ]
    )
    ours = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values("timestamp")
        .reset_index(drop=True)
    )

    sample = pd.read_csv(SAMPLE)
    want = ref.SpectralResidual(
        sample, 0.3, 3, 40, 99, ref.DetectMode.anomaly_only, 0
    ).detect()

    assert len(ours) == len(want) == 4000
    np.testing.assert_allclose(
        ours["mag"].to_numpy(), want["mag"].to_numpy(), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        ours["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-9, atol=1e-12
    )
    assert (
        ours["isAnomaly"].to_numpy() == want["isAnomaly"].to_numpy()
    ).all()
    # the sample has real anomalies; make sure the run is non-trivial
    assert ours["isAnomaly"].sum() > 0
