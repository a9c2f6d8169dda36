"""Deduplication operators for training-data pipelines.

Four families, each picked for a different scale/recall point:

* **exact** — one hash-groupBy; at 100 TB this is the cheapest pass and
  always runs first so later stages see a smaller corpus.
* **MinHash + LSH** — shingle → signature → band → bucket-join; candidate
  generation is an equi-join on (band_id, band_hash), so the quadratic
  blow-up is confined to same-bucket groups. This is the scale path for
  near-dup text.
* **n-gram Jaccard** — exact verification of candidate pairs (used behind
  LSH, or standalone within small blocking groups).
* **SimHash** — 64-bit signatures via a vectorized pandas UDF; Hamming
  buckets by signature prefix.

Everything except SimHash's bit-fold is pure JVM expressions
(functions/__init__.py helpers), and hashing is md5-based so the DuckDB
oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from anomalydetector_spark.functions import (
    jaccard,
    md5_long,
    minhash_signature,
    word_shingles,
)


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content hash: every row mapped to its group's
    canonical (min id); ``is_canonical`` marks the keeper. One groupBy +
    one broadcast-join-free self-merge (the group table is aggregated,
    so it is orders of magnitude smaller than the corpus)."""
    hashed = df.select(
        F.col(id_col), md5_long(F.col(text_col)).alias("text_hash")
    )
    groups = hashed.groupBy("text_hash").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        hashed.join(groups, "text_hash")
        .select(
            id_col,
            "text_hash",
            "canonical_id",
            "group_size",
            (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    ``n_hashes`` minhashes split into ``bands`` bands of ``n_hashes/bands``
    rows each; two docs collide if any band's sub-signature matches. The
    pair join is an equi-join on (band, band_signature) — shuffles only
    signatures (small), never text; AQE splits skewed buckets. Pairs are
    deduped with ``a < b``.
    """
    rows_per_band = n_hashes // bands
    # explode → per-shingle hashes → groupBy(min): the shingle array is
    # computed ONCE per doc (a single nested-expression signature column
    # would be inlined n_hashes times by CollapseProject, exploding
    # codegen size), and the mins partial-aggregate map-side so the
    # shuffle carries one row per (doc × partition), not per shingle.
    # spread the hash-heavy stage across the cluster even when the input
    # is a handful of files (a real 100-TB scan is already thousands of
    # splits; repartition() here is a no-op cost next to 16 md5/shingle)
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    exploded = df.select(F.col(id_col).alias("_id"), F.col(text_col)).repartition(
        n_parts
    ).select(
        "_id",
        F.explode(word_shingles(F.col(text_col), k_shingle)).alias("_s"),
    )
    hashed = exploded.select(
        "_id",
        *[
            md5_long(F.concat(F.lit(f"{i}|"), F.col("_s"))).alias(f"_h{i}")
            for i in range(n_hashes)
        ],
    )
    sig = hashed.groupBy("_id").agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(n_hashes)]
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"_h{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("_id", "bs.band", "bs.band_sig")

    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    ``pairs`` (id_a, id_b) usually comes from :func:`minhash_lsh_candidates`;
    alternatively ``block_col`` forms all pairs within a blocking key
    (only sane for bounded blocks). Returns pairs with ``jaccard_sim ≥
    threshold``.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k_shingle).alias("_sh"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    if pairs is None:
        if block_col is None:
            raise ValueError("need either candidate pairs or a blocking column")
        a, b = sh.alias("a"), sh.alias("b")
        joined = a.join(
            b,
            (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")),
        )
    else:
        a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
        b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
        joined = (
            pairs.join(a, "id_a").join(b, "id_b")
            .select(
                F.col("id_a").alias("a_id"),
                F.col("id_b").alias("b_id"),
                F.col("_sh_a"),
                F.col("_sh_b"),
            )
            .withColumnRenamed("a_id", "id_a")
            .withColumnRenamed("b_id", "id_b")
        )
        return (
            joined.withColumn("jaccard_sim", jaccard(F.col("_sh_a"), F.col("_sh_b")))
            .filter(F.col("jaccard_sim") >= threshold)
            .select("id_a", "id_b", "jaccard_sim")
        )

    return (
        joined.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jaccard(F.col("a._sh"), F.col("b._sh")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


_SIMHASH_BITS = 64


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash of whitespace tokens, vectorized per Arrow batch.

    Per doc: each token hashes to 64 bits (stable numpy pipeline); bit
    positions vote +1/−1; the sign vector folds back into one int64. Pure
    numpy — the only Python loop is per-document over already-vectorized
    token arrays.
    """
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = t.split()
        if not toks:
            continue
        # stable per-token 64-bit hashes
        hs = np.array(
            [hash_bytes(tok.encode()) for tok in toks], dtype=np.uint64
        )
        bits = ((hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def hash_bytes(b: bytes) -> int:
    """FNV-1a 64-bit — deterministic across processes (unlike Python's
    seeded ``hash``)."""
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash, prefix16) — prefix bucketing gives cheap Hamming-
    neighborhood candidate generation (near-dups almost always share the
    16-bit prefix; multi-table probing would extend recall)."""
    return df.select(
        F.col(id_col), simhash64(F.col(text_col)).alias("simhash")
    ).withColumn("prefix16", F.shiftrightunsigned(F.col("simhash"), 48))
