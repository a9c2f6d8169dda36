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


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(_id, band, band_sig) — the banded MinHash signature table shared
    by within-corpus dedup and cross-corpus decontamination (the hash
    family is a pure function of the text, so two tables built with the
    same parameters are directly bucket-joinable)."""
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
    return sig.select(
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
    banded = banded_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        n_hashes=n_hashes,
        bands=bands,
    )
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


def simhash_fold_np(hash_arrays: pd.Series) -> pd.Series:
    """Fold per-token 64-bit hashes (already computed JVM-side via
    ``xxhash64``) into one SimHash signature per document.

    Fully vectorized across the Arrow batch: all docs' token hashes are
    concatenated into one flat uint64 array; each of the 64 bit planes is
    extracted with a single shift-and-mask over the flat array and summed
    per document with ``np.add.reduceat``; votes > half the token count
    set the signature bit. The only Python-level loop is per *bit plane*
    (64 iterations) plus one cheap per-doc ``np.asarray`` during
    flattening — no per-token Python anywhere (round-1 perf finding #3).
    """
    n = len(hash_arrays)
    out = np.zeros(n, dtype=np.int64)
    lens = np.fromiter(
        (0 if a is None else len(a) for a in hash_arrays),
        dtype=np.int64,
        count=n,
    )
    nonempty = lens > 0
    if not nonempty.any():
        return pd.Series(out)
    flat = np.concatenate(
        [np.asarray(a, dtype=np.int64) for a in hash_arrays[nonempty]]
    ).view(np.uint64)

    ne_lens = lens[nonempty]
    starts = np.zeros(len(ne_lens), dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=starts[1:])

    # per-bit-plane popcount: 64 × O(total_tokens), O(total_tokens) memory
    ones = np.empty((len(ne_lens), _SIMHASH_BITS), dtype=np.int64)
    for b in range(_SIMHASH_BITS):
        plane = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        ones[:, b] = np.add.reduceat(plane, starts)

    majority = (2 * ones) > ne_lens[:, None]
    weights = np.uint64(1) << np.arange(_SIMHASH_BITS, dtype=np.uint64)
    sigs = (majority.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sigs.view(np.int64)
    return pd.Series(out)


simhash_fold = F.pandas_udf(simhash_fold_np, LongType())


def hash_bytes(b: bytes) -> int:
    """FNV-1a 64-bit — deterministic across processes (unlike Python's
    seeded ``hash``). Kept as a reference hash for tests; the SimHash hot
    path hashes tokens JVM-side with ``xxhash64`` instead."""
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash, prefix16) — prefix bucketing gives cheap Hamming-
    neighborhood candidate generation (near-dups almost always share the
    16-bit prefix; :func:`simhash_near_duplicates` extends this to
    multi-table block probing with GUARANTEED recall at small Hamming
    radii).

    Token hashing happens inside whole-stage codegen: split → filter
    empties → per-token hash via a ``transform`` lambda, so the Arrow
    batch that reaches Python carries int64 arrays, not strings.

    ``hash_fn`` selects the per-token hash:

    * ``"xxhash64"`` (default, production) — fastest, full 64-bit planes.
    * ``"md5"`` — ``functions.md5_long`` (first 15 md5 hex chars → 60-bit
      non-negative int). Exactly reproducible in ANSI SQL
      (``('0x' || substr(md5(t),1,15))::BIGINT``), which is what lets the
      driver hash-oracle the signature AND pair queries end-to-end.
      Bit planes 60-63 are constantly zero, so signatures live in 60
      bits; the Manku block-probing recall guarantee is unaffected
      (differing bits still touch ≤ d of the 4 disjoint 16-bit blocks).

    Both modes share :func:`simhash_fold_np` verbatim — the oracle on the
    md5 twin therefore pins the fold arithmetic the xxhash64 path runs.
    """
    if hash_fn == "xxhash64":
        # Strictly-unary wrapper: F.transform inspects the lambda's
        # signature and rejects varargs callables like F.xxhash64 itself.
        def token_hash(t):
            return F.xxhash64(t)

    elif hash_fn == "md5":
        from anomalydetector_spark.functions import md5_long

        def token_hash(t):
            return md5_long(t)

    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|md5)")
    token_hashes = F.transform(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != F.lit(""),
        ),
        token_hash,
    )
    return df.select(
        F.col(id_col), simhash_fold(token_hashes).alias("simhash")
    ).withColumn("prefix16", F.shiftrightunsigned(F.col("simhash"), 48))


def _rotate64(col, r: int):
    """64-bit rotate-left by ``r`` — pure codegen (two shifts + OR); the
    arithmetic stays in long, the unsigned right shift keeps sign bits
    out."""
    if r % 64 == 0:
        return col
    r = r % 64
    return F.shiftleft(col, r).bitwiseOR(F.shiftrightunsigned(col, 64 - r))


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    n_tables: int = 4,
    prefix_bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate pairs ``(id_a, id_b, hamming)`` with
    ``hamming ≤ max_hamming``, candidates from multi-table BLOCK
    probing (the Manku/Jain/Das Sarma WWW'07 scheme): table *t* buckets
    on the ``prefix_bits``-bit prefix of the signature rotated by
    ``t · prefix_bits``, i.e. each table keys on a disjoint bit block.

    Recall is GUARANTEED, not probabilistic, when
    ``max_hamming < n_tables`` and ``n_tables · prefix_bits ≤ 64``
    (defaults: 4 disjoint 16-bit blocks): d differing bits can touch at
    most d blocks, so at least one block is identical and the pair
    collides in that table — unlike the single-prefix variant, whose
    near-dups differing in the top 16 bits were never candidates
    (round-2 finding #1).

    Scale shape: signatures are one codegen projection + one Arrow fold
    (never text); candidates are per-table equi-joins on the bucket key
    (explode → self-join, id-pair distinct BEFORE verification); the
    verify is ``bit_count(a ^ b)`` — pure codegen on two longs. Only
    (id, 8-byte signature) pairs ever shuffle.
    """
    if n_tables * prefix_bits > 64:
        raise ValueError("n_tables * prefix_bits must be <= 64")
    sigs = simhash_signatures(
        df, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    ).select(id_col, "simhash")
    buckets = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.shiftrightunsigned(
                            _rotate64(F.col("simhash"), t * prefix_bits),
                            64 - prefix_bits,
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("s"),
    ).select("_id", "s.tbl", "s.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
