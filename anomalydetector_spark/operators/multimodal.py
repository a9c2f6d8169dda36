"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no codec libraries, so the decode kernels are stubs —
either a clearly-marked ``NotImplementedError`` or a deterministic fake —
but everything Spark-side is real and tested: schemas, ``mapInPandas``
batch shape, partition sizing, and the metadata contract. Swapping a real
decoder in changes only the marked function bodies.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

_FEATURE_DIM = 8


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB — real impl: PIL/With cv2 decode to HxWxC uint8. The container
    ships no codecs, so this raises; tests use :func:`_fake_decode`."""
    raise NotImplementedError("image decode requires a codec library")


def _fake_decode(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic fake decoder: stable pseudo-features from payload
    bytes — keeps the Arrow plumbing and batch shapes real in tests."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array(
        [c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32
    ) / 255.0


def extract_features(
    media: DataFrame, use_stub: bool = True, batch_hint: int = 256
) -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas``.

    Real part: Arrow streaming of binary columns in bounded batches (cap
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of images
    fits executor memory), per-kind dispatch, typed output schema.
    Stub part: the decode itself (``use_stub=True`` → deterministic fake;
    False → NotImplementedError, marking where a codec goes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if use_stub:
                    feats.append(_fake_decode(payload))
                else:
                    feats.append(_decode_image(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def _resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — real impl: decode, resample to (width, height), re-encode.
    No codecs in this container; tests use the deterministic fake below."""
    raise NotImplementedError("image resize requires a codec library")


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake: length-scaled byte payload (area ratio), so
    batch shapes and size accounting behave like a real resample."""
    if payload is None:
        return b""
    target = max(1, int(len(payload) * min(1.0, (width * height) / (64 * 48))))
    reps = target // max(len(payload), 1) + 1
    return (payload * reps)[:target]


def resize_images(
    media: DataFrame, width: int = 32, height: int = 24, use_stub: bool = True
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` (same Arrow-batch contract
    as :func:`extract_features`); non-image rows pass through unchanged.
    Output schema equals the input media schema with updated dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["kind"] == "image"
            fn = _fake_resize if use_stub else _resize_image
            out.loc[is_img, "payload"] = [
                fn(p, width, height) for p in out.loc[is_img, "payload"]
            ]
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            yield out

    return media.select(
        "media_id", "kind", "payload", "mime", "width", "height", "duration_ms"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    derived from metadata — the pure-Spark half of frame extraction (the
    decode of each frame is the stubbed kernel above). ``sequence`` keeps
    the expansion JVM-side."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id, metadata consistent with kind."""
    df = spark.range(n)
    kind = (
        F.when(F.pmod("id", F.lit(3)) == 0, "image")
        .when(F.pmod("id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.encode(
            F.repeat(F.concat(F.lit("payload-"), F.col("id").cast("string")), 8),
            "UTF-8",
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        (F.pmod("id", F.lit(5)) * 1000 + 1000).cast("int").alias("duration_ms"),
    )
