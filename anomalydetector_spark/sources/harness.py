"""Reference test-harness scans — S4 pickle series and S5 JSON windows
(SURVEY.md §2.1).

The reference's SR-CNN harness reads labeled series from per-file pickles
(srcnn/utils.py:41-43; each file a dict ``{'timestamp', 'value',
'label'}``, consumed at srcnn/evalue.py:69-70) and training windows from
one JSON file (a list of 2×W arrays — row 0 values, row 1 labels —
written by srcnn/generate_data.py:113-134, consumed by
srcnn/utils.py:228-244). These close the last two §2.1 rows; both stay
distributed:

* pickles ride ``binaryFiles`` — one (path, bytes) record per file, so a
  directory of thousands of series unpickles across executors, never on
  the driver;
* the JSON window file is read ``wholetext`` and parsed JVM-side with
  ``from_json`` + ``posexplode`` — no Python in the path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SERIES_SCHEMA = (
    "series_id string, ts long, value double, label int"
)


def read_pickle_series(spark: SparkSession, path: str) -> DataFrame:
    """S4 — load a file/directory of reference-format pickle series
    (``{'timestamp': [...], 'value': [...], 'label': [...]}`` per file)
    into one long DataFrame ``(series_id, ts, value, label)``.

    ``series_id`` is the source file name, matching the reference's
    per-file evaluation protocol (evalue.py keeps the path ``f`` with
    each result). Only unpickle files you trust — pickle is code.
    """
    import os
    import pickle

    def unpack(rec):
        fname, contents = rec
        data = pickle.loads(bytes(contents))
        sid = os.path.basename(fname)
        labels = data.get("label")
        n = len(data["timestamp"])
        if labels is None:
            labels = [0] * n
        for t, v, lb in zip(data["timestamp"], data["value"], labels):
            yield (sid, int(t), float(v), int(lb))

    rdd = spark.sparkContext.binaryFiles(path).flatMap(unpack)
    return spark.createDataFrame(rdd, SERIES_SCHEMA)


def read_json_windows(spark: SparkSession, path: str) -> DataFrame:
    """S5 — load a reference training-window JSON file (one list of
    2×W arrays) as ``(window_id, value array<double>, label
    array<double>)``. Parsed entirely JVM-side: wholetext scan →
    ``from_json`` → ``posexplode``."""
    raw = spark.read.option("wholetext", True).text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"), "array<array<array<double>>>"
        ).alias("windows")
    )
    return parsed.select(
        F.posexplode("windows").alias("window_id", "w")
    ).select(
        "window_id",
        F.col("w")[0].alias("value"),
        F.col("w")[1].alias("label"),
    )
