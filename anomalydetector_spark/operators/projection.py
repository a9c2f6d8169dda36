"""Seeded Rademacher random projection (Johnson-Lindenstrauss) for
embedding columns.

ANN at 10^12 vectors is dominated by the dimensionality: IVF cell
assignment, LSH hashing, and the verify-stage dot products all scale
linearly in d. A random projection with ±1 (Rademacher) entries
(Achlioptas 2001, "Database-friendly random projections" — public
method) preserves inner products within the JL bound while replacing
the Gaussian matrix with signs — no floating-point matrix to ship,
because every sign derives from the repo's cross-engine md5 rule
``md5('<seed>:<i>:<j>') % 2``. Project once, then run the existing
`operators/similarity.py` stack (IVF / hyperplane-LSH / brute verify)
in the reduced space.

Two implementations, the `repetition_profile` twin pattern:

* :func:`rademacher_project` — the ORACLE path: per output dim, an
  in-row ``zip_with`` multiply + LEFT-FOLD ``aggregate``. Both Spark's
  ``aggregate`` and DuckDB's ``list_reduce`` fold left over doubles in
  the same order, so results are BIT-identical cross-engine (probed:
  equal ``repr`` on ulp-sensitive sums) — the driver query is
  hash-oracled on raw doubles, no quantization needed. Fully codegen,
  zero shuffle, zero Python; cost O(d_in · d_out) interpreted HOF per
  row — fine for verification scale.
* :func:`rademacher_project_arrow` — the SCALE path: one numpy matmul
  per Arrow batch (the k-means assignment pattern — signs matrix in
  the closure, zero shuffle, zero join). BLAS pairwise summation
  reorders the adds, so values match the fold path to ~1e-12 relative,
  not bitwise — tests pin both paths at 1e-9.

The matrix never exists as data: any executor, any engine, any future
session regenerates it from ``(seed, d_in, d_out)`` alone — the same
property that makes the repo's md5 sampling retry-stable.
"""

from __future__ import annotations

import hashlib
import math
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign(seed: int, i: int, j: int) -> float:
    """±1.0 from the cross-engine md5-long parity rule (DuckDB:
    ``('0x' || substr(md5('<seed>:<i>:<j>'), 1, 15))::BIGINT % 2``)."""
    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def sign_matrix(d_in: int, d_out: int, seed: int = 0) -> List[List[float]]:
    """The full ±1 matrix, rows = output dims — regenerable anywhere
    from (seed, d_in, d_out)."""
    return [
        [_sign(seed, i, j) for i in range(d_in)] for j in range(d_out)
    ]


def _fold_outputs(vec_col: str, d_in: int, d_out: int, seed: int):
    """The d_out fold expressions as one array<double> column — the
    shared oracle-exact core of both fold-path entry points."""
    scale = 1.0 / math.sqrt(d_out)
    signs = sign_matrix(d_in, d_out, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(s) for s in signs[j]]),
                        lambda x, s: F.coalesce(x * s, F.lit(0.0)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(scale)
            )
            for j in range(d_out)
        ]
    )


def rademacher_project_wide(
    emb: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Fold-path projection in WIDE form: ``(id_col, projected
    array<double>)`` — same bit-reproducible values as
    :func:`rademacher_project`, shaped for feeding the similarity
    stack (cosine top-k / LSH / IVF) directly."""
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _fold_outputs(vec_col, d_in, d_out, seed).alias("projected"),
    )


def rademacher_project(
    emb: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Oracle-exact projection: ``(id_col, dim, value)`` long form,
    ``value = (1/sqrt(d_out)) · Σ_i sign(i, dim) · v[i]`` with the sum
    evaluated as a LEFT fold (bit-reproducible in DuckDB). Vectors
    shorter than ``d_in`` contribute only their present components
    (``zip_with`` pads with NULL → treated as 0); NULL vectors emit no
    rows."""
    scale = 1.0 / math.sqrt(d_out)
    signs = sign_matrix(d_in, d_out, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    outs = F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(s) for s in signs[j]]),
                        lambda x, s: F.coalesce(x * s, F.lit(0.0)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(scale)
            ).alias(f"_d{j}")
            for j in range(d_out)
        ]
    )
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.posexplode(outs).alias("dim", "value")
    )


def rademacher_project_arrow(
    emb: DataFrame,
    d_in: int,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Scale twin: same projection as one numpy matmul per Arrow batch
    (signs in the closure — zero shuffle, zero join). Returns
    ``(id_col, projected array<double>)`` wide form; values match
    :func:`rademacher_project` to BLAS-summation tolerance (~1e-12
    relative), not bitwise."""
    import numpy as np

    spark_id_type = dict(emb.dtypes)[id_col]
    mat = np.array(sign_matrix(d_in, d_out, seed)).T  # d_in × d_out
    scale = 1.0 / math.sqrt(d_out)

    def batch(it):
        import pandas as pd

        for pdf in it:
            vecs = np.zeros((len(pdf), d_in))
            for r, v in enumerate(pdf[vec_col].to_numpy()):
                a = np.asarray(v, dtype=np.float64)[:d_in]
                vecs[r, : len(a)] = a
            proj = vecs @ mat * scale
            yield pd.DataFrame(
                {id_col: pdf[id_col], "projected": list(proj)}
            )

    return emb.filter(F.col(vec_col).isNotNull()).select(
        id_col, vec_col
    ).mapInPandas(
        batch, schema=f"{id_col} {spark_id_type}, projected array<double>"
    )
