"""Shannon entropy + mutual information column analyzers — the two
Deequ analyzers (``Entropy``, ``MutualInformation``) the one-pass
profiler can't express as plain aggregate expressions (both need a
value-counts aggregation first). Entropy is the standard
"is this column degenerate / near-constant / secretly an id" signal;
MI is the dependency strength behind functional-dependency suggestion
(``A → B`` holds exactly when ``H(B|A) = H(B) − MI ≈ 0``).

Determinism contract (the repo's cross-engine float rule): all
quantities reduce to integer value counts; the single transcendental
per distinct value is micro-nat-quantized BEFORE aggregation
(``round(ln(·)·1e6)`` HALF_UP, the PMI contract), sums run over exact
decimal(38,0), and one final double division chain produces the score —
partitioning-independent, SQL-reproducible:

* ``H(X) = ln N − (Σ_v n_v · ln n_v) / N``  (natural log, Deequ's
  convention), computed as
  ``(N·round(ln N·1e6) − Σ n_v·round(ln n_v·1e6)) / N / 1e6``;
* ``MI(X;Y) = Σ_xy (n_xy/N) · ln(n_xy·N / (n_x·n_y))`` with the
  ln-argument built in pinned double order from the pair table's own
  margins (the PMI formulation, aggregated);
* ``NMI = MI / min(H(X), H(Y))`` (0 when the min is 0 — a constant
  column carries no information to normalize by).

NULL policy: entropy excludes NULL values from both the counts and N
(completeness is its own profile metric); MI uses only rows where BOTH
columns are non-null, and its entropies are computed on that same row
subset so ``MI ≤ min(Hx, Hy)`` holds exactly.

Scale shape: one value-counts groupBy per column (the shuffle moves
cardinality-sized partials, map-side combined — never rows); MI's
margins are two further groupBys OF the bounded pair table joined back
(AQE broadcasts them when small). For unbounded-cardinality columns the
pair table approaches the row count — these are CATEGORICAL analyzers;
quantize or bin first (same caveat as the KS drift path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _micro_ln(col) -> F.Column:
    """``round(ln(x)·1e6)`` HALF_UP as decimal(38,0) — the quantized
    transcendental (x arrives as an exact-integer count cast double)."""
    return F.round(F.log(col.cast("double")) * F.lit(1e6), 0).cast(_DEC)


def column_entropy(
    df: DataFrame, cols: list[str] | tuple[str, ...]
) -> DataFrame:
    """Exact Shannon entropy (nats) per column: ``(column, entropy,
    n_distinct, n_values)`` — one value-counts aggregation per column,
    unioned. NULLs excluded (see module docstring)."""
    outs = []
    for c in cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        n = F.sum(F.col("_n").cast(_DEC))
        s = F.sum(F.col("_n").cast(_DEC) * _micro_ln(F.col("_n")))
        outs.append(
            counts.agg(
                n.alias("_N"),
                s.alias("_S"),
                F.count(F.lit(1)).alias("n_distinct"),
            ).select(
                F.lit(c).alias("column"),
                F.when(F.col("_N").isNull(), F.lit(None).cast("double"))
                .otherwise(
                    (
                        F.col("_N") * _micro_ln(F.col("_N")) - F.col("_S")
                    ).cast(_DEC).cast("double")
                    / F.col("_N").cast("double")
                    / F.lit(1e6)
                )
                .alias("entropy"),
                "n_distinct",
                F.coalesce(F.col("_N").cast("long"), F.lit(0)).alias(
                    "n_values"
                ),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def mutual_information(
    df: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """One-row frame ``(col_x, col_y, mi, entropy_x, entropy_y, nmi,
    n_pairs, n_rows)`` — exact MI between two categorical columns over
    the rows where both are non-null, plus the marginal entropies on
    that same subset and the min-entropy-normalized NMI ∈ [0, 1]."""
    pairs = (
        df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(
            F.col(col_x).alias("_x"), F.col(col_y).alias("_y")
        )
        .agg(F.count(F.lit(1)).alias("_nxy"))
    )
    mx = pairs.groupBy("_x").agg(F.sum("_nxy").alias("_nx"))
    my = pairs.groupBy("_y").agg(F.sum("_nxy").alias("_ny"))
    tot = pairs.agg(
        F.sum(F.col("_nxy").cast(_DEC)).alias("_N"),
        F.count(F.lit(1)).alias("_n_pairs"),
    )

    joined = pairs.join(mx, "_x").join(my, "_y").crossJoin(
        F.broadcast(tot)
    )
    # pinned double order for the ln argument: (n_xy · N) / (n_x · n_y)
    ln_arg = (
        F.col("_nxy").cast("double") * F.col("_N").cast("double")
    ) / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
    lnm = F.round(F.log(ln_arg) * F.lit(1e6), 0).cast(_DEC)

    mi_sum = joined.agg(
        F.sum(F.col("_nxy").cast(_DEC) * lnm).alias("_MI"),
        F.first("_N").alias("_N"),
        F.first("_n_pairs").alias("_n_pairs"),
    )

    def _h(col: str):
        e = column_entropy(
            df.filter(
                F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
            ),
            [col],
        )
        return e.select(F.col("entropy").alias(f"_h_{col}"))

    hx, hy = _h(col_x), _h(col_y)
    out = mi_sum.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    mi = (
        F.col("_MI").cast(_DEC).cast("double")
        / F.col("_N").cast("double")
        / F.lit(1e6)
    )
    hmin = F.least(F.col(f"_h_{col_x}"), F.col(f"_h_{col_y}"))
    return out.select(
        F.lit(col_x).alias("col_x"),
        F.lit(col_y).alias("col_y"),
        mi.alias("mi"),
        F.col(f"_h_{col_x}").alias("entropy_x"),
        F.col(f"_h_{col_y}").alias("entropy_y"),
        F.when(hmin > 0, mi / hmin).otherwise(F.lit(0.0)).alias("nmi"),
        F.col("_n_pairs").alias("n_pairs"),
        F.col("_N").cast("long").alias("n_rows"),
    )
