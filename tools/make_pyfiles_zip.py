#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files`` (north rule).

Produces ``dist/anomalydetector_spark.zip`` containing the package so a
multi-executor cluster run is:

    spark-submit \
        --py-files dist/anomalydetector_spark.zip \
        anomalydetector_spark/cli.py validate \
        --input-path <iceberg-or-parquet path> \
        --output-path <out> --manifest <manifest dir> \
        --partition-by domain --verify-text-extraction

The zip holds only .py sources (no tests, no caches) — executors import
it straight off the distributed classpath.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out = out_path or os.path.join(REPO, "dist", "anomalydetector_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "anomalydetector_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    with zipfile.ZipFile(path) as zf:
        n = len(zf.namelist())
    print(f"wrote {path} ({n} modules)")
    print(
        "launch: spark-submit --py-files "
        f"{path} {os.path.join(REPO, 'anomalydetector_spark', 'cli.py')} "
        "validate --input-path ... --output-path ..."
    )
