"""Data-layout operators: Z-order (Morton) clustering keys and
clustered writes for multi-dimensional scan pruning.

At 100 TB the dominant cost of a selective query is how many files and
row groups the scan TOUCHES, not how fast it processes them. Parquet
footers carry per-column min/max; a file layout where rows close in
query space land in the same files turns a box predicate into file- and
row-group-level pruning. Sorting by one column prunes that column only;
interleaving the bits of several normalized columns (the Z-order /
Morton curve — the same construction Delta Lake's OPTIMIZE ZORDER BY
uses) bounds the min/max range of EVERY participating column within
each file.

Everything here is pure whole-stage-codegen expression work:

* :func:`zorder_key` builds the interleaved key as one expression tree
  (``bits × n_cols`` shift/mask/or terms — wide but flat, no Python,
  no shuffle: a free projection fused into the scan).
* Normalization bounds are LITERALS. Pass them from table statistics
  (parquet/Iceberg column min/max are free metadata) or compute once
  with :func:`compute_bounds` (one aggregate — the only action here).
  Stale bounds degrade clustering quality, never correctness: values
  are clamped into range.
* :func:`write_clustered` is ``repartitionByRange(zkey)`` (one range
  shuffle — sampling picks balanced boundaries even under skew) +
  ``sortWithinPartitions`` + ``maxRecordsPerFile``.

The reference repo has no layout surface (single-process, in-memory);
this is part of the 100-TB contract the task brief adds.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into integer [0, 2**bits) by linear scaling
    against literal bounds; out-of-range values clamp, NULLs sort first
    (cell 0). floor((x - lo) / (hi - lo) * 2**bits), identical double
    arithmetic on the oracle side."""
    if not hi > lo:
        raise ValueError(f"bounds must satisfy hi > lo, got ({lo}, {hi})")
    cells = float(2**bits)
    q = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(cells)
    )
    return F.coalesce(
        F.least(F.greatest(q, F.lit(0)), F.lit(int(cells) - 1)), F.lit(0)
    )


def zorder_key(
    cols: list[Column | str],
    bounds: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton-interleaved BIGINT sort key over 2-4 numeric columns.

    Column ``c``'s quantized bit ``b`` lands at output bit
    ``b * n_cols + c``, so consecutive key values differ in the
    lowest-order bits of ALL columns at once — rows adjacent on the key
    are adjacent in every dimension. ``bits * len(cols)`` must fit in
    63 bits (signed long, non-negative).
    """
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError("zorder_key interleaves 2-4 columns")
    if len(bounds) != n:
        raise ValueError("one (lo, hi) bound pair per column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63")
    qs = [
        _quantize(F.col(c) if isinstance(c, str) else c, lo, hi, bits)
        for c, (lo, hi) in zip(cols, bounds)
    ]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for c, q in enumerate(qs):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(q, b).bitwiseAND(F.lit(1)).cast("long"),
                    b * n + c,
                )
            )
    return key


def zorder_key_np(values, bounds, bits: int = 16):
    """Pure-python mirror of :func:`zorder_key` for tests: ``values`` is
    a list of per-column lists."""
    n = len(values)
    cells = float(2**bits)
    out = []
    for row in zip(*values):
        key = 0
        for c, (x, (lo, hi)) in enumerate(zip(row, bounds)):
            if x is None:
                q = 0
            else:
                q = math.floor((float(x) - lo) / (hi - lo) * cells)
                q = min(max(q, 0), int(cells) - 1)
            for b in range(bits):
                key |= ((q >> b) & 1) << (b * n + c)
        out.append(key)
    return out


def zorder_sql(
    cols: list[str], bounds: list[tuple[float, float]], bits: int = 16
) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (same generated expression,
    same double arithmetic) so a DuckDB oracle can hash-verify the key.
    """
    n = len(cols)
    cells = float(2**bits)
    terms = []
    for c, (col, (lo, hi)) in enumerate(zip(cols, bounds)):
        q = (
            f"COALESCE(LEAST(GREATEST(FLOOR((CAST({col} AS DOUBLE) - {float(lo)!r}) "
            f"/ {float(hi) - float(lo)!r} * {cells!r}), 0), {int(cells) - 1}), 0)::BIGINT"
        )
        for b in range(bits):
            terms.append(f"((({q} >> {b}) & 1) << {b * n + c})")
    return "(" + " | ".join(terms) + ")"


def compute_bounds(
    df: DataFrame, cols: list[str]
) -> list[tuple[float, float]]:
    """(min, max) per column in ONE aggregate pass — the fallback when
    table statistics aren't at hand. max is nudged up so the true
    maximum quantizes into the top cell rather than clamping."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).first()
    out = []
    for i in range(len(cols)):
        lo, hi = row[f"_lo{i}"], row[f"_hi{i}"]
        if lo is None:
            lo, hi = 0.0, 1.0
        span = (hi - lo) or 1.0
        out.append((lo, hi + span * 1e-9))
    return out


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bounds: list[tuple[float, float]],
    n_files: int,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``n_files`` Z-order-clustered parquet files:
    one range shuffle on the key (sampled boundaries stay balanced under
    skew), an in-partition sort so row groups inside each file are tight
    too, key column dropped before the write."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bounds, bits=bits))
    writer = (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
