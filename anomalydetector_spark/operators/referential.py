"""Referential-integrity checks as semi/anti joins (north rule;
SURVEY.md §2.2 referential note).

Physical strategy is a ladder, chosen by dimension size:

* ``broadcast`` (default, the north rule's stated shape): the dimension
  (domains, allowed langs, …) is small relative to the fact table, so
  the join is forced broadcast — no shuffle of the 10^12-row side, each
  task streams its split against an in-memory hash set.
* ``auto``: no hint. Catalyst picks from statistics and AQE re-plans at
  runtime (a sort-merge join whose built side turns out under
  ``spark.sql.adaptive.autoBroadcastJoinThreshold`` is promoted to
  broadcast after the shuffle materializes). The right setting when the
  dimension's size is unknown at plan time.
* ``shuffle``: explicit ``shuffle_hash`` hint — for dimensions that can
  never broadcast (say 10^9 distinct keys): both sides hash-partition on
  the key, no sort, no driver-side collect of the dim.
* ``shuffle_salted``: ``shuffle`` plus explicit hot-key spreading — the
  fact side gets a per-row salt, the dimension is replicated once per
  salt, and the join key becomes (key, salt), so a domain owning half
  the corpus splits across ``salts`` tasks instead of serializing into
  one. Exact: the replicated dimension contains every salt for every
  key, so match/no-match per fact row is unchanged. (AQE's skew-join
  splitting only applies to sort-merge joins, hence the explicit salt.)
* ``shuffle_bloom``: semi-join reduction for dimensions too big to
  broadcast but whose MISSES dominate (or whose hits do — either way
  most rows are decidable without the join). The dim's Bloom bitmap
  (``operators/bloom``) rides as a broadcast 1-row map column; every
  fact row gets a pure-codegen membership probe, and only
  bloom-POSITIVE rows enter the shuffle join. No false negatives by
  construction, so bloom-negative rows are DEFINITE non-members: for
  an anti join they are emitted directly, for a semi join dropped —
  exact either way, with shuffled bytes cut to (hit rate + FP rate) of
  the fact. The bitmap must fit a broadcast row (~1.2 MB per 10^6 dim
  keys at 1% FP) — for 10^9-key dims stay on ``shuffle``/``salted``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.operators import errors
from anomalydetector_spark.operators.checks import (
    CheckResult,
    _part,
    _verdict_from_violation_count,
)

REF_STRATEGIES = (
    "broadcast",
    "auto",
    "shuffle",
    "shuffle_salted",
    "shuffle_bloom",
)


def _salt_expr(salt_on: Column | str | None, salts: int) -> Column:
    """Deterministic-when-possible per-row salt in [0, salts). Pass a
    high-cardinality column (the fact's unique key) for a salt that is
    stable under task retry; the fallback varies per retry, which is
    still exact here because the replicated dim carries every salt."""
    src = (
        F.monotonically_increasing_id()
        if salt_on is None
        else (F.col(salt_on) if isinstance(salt_on, str) else salt_on)
    )
    return F.pmod(F.xxhash64(src), F.lit(salts)).cast("int")


def _dim_keys(parent: DataFrame, parent_col: str, child_col: str) -> DataFrame:
    return parent.select(F.col(parent_col).alias(child_col)).distinct()


def dim_join(
    fact: DataFrame,
    parent: DataFrame,
    child_col: str,
    parent_col: str | None = None,
    how: str = "left",
    strategy: str = "broadcast",
    salts: int = 16,
    salt_on: Column | str | None = None,
    bloom_fp: float = 0.01,
) -> DataFrame:
    """Join ``fact`` against the distinct parent key set under the chosen
    physical strategy. ``how='left'`` appends a ``_known`` boolean column
    (True where the key exists, NULL otherwise); ``how='left_anti'`` /
    ``'left_semi'`` return the usual filtered fact rows. ``bloom_fp``
    sizes the ``shuffle_bloom`` rung's bitmap (ignored elsewhere)."""
    if strategy not in REF_STRATEGIES:
        raise ValueError(
            f"strategy must be one of {REF_STRATEGIES}, got {strategy!r}"
        )
    dim = _dim_keys(parent, parent_col or child_col, child_col)
    if how == "left":
        dim = dim.withColumn("_known", F.lit(True))

    if strategy == "broadcast":
        return fact.join(F.broadcast(dim), child_col, how)
    if strategy == "auto":
        return fact.join(dim, child_col, how)
    if strategy == "shuffle":
        return fact.join(dim.hint("shuffle_hash"), child_col, how)

    if strategy == "shuffle_bloom":
        return _bloom_reduced_join(fact, dim, child_col, how, bloom_fp)

    # shuffle_salted: spread each hot fact key across `salts` tasks
    fact_s = fact.withColumn("_ref_salt", _salt_expr(salt_on, salts))
    dim_s = dim.withColumn(
        "_ref_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).hint("shuffle_hash")
    return fact_s.join(dim_s, [child_col, "_ref_salt"], how).drop("_ref_salt")


def _bloom_probe(key: Column, m_bits: int, n_hashes: int, seed: int) -> Column:
    """Pure-codegen membership probe against the broadcast ``_bloom``
    map column: every one of the key's bit positions must be set. Uses
    the same scalar position expression the build uses."""
    from anomalydetector_spark.operators.bloom import _position

    out = None
    for i in range(n_hashes):
        p = _position(key, m_bits, seed, i)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(32)).cast("int")
        )
        word = F.coalesce(
            F.element_at(F.col("_bloom"), (p / 32).cast("long")),
            F.lit(0).cast("long"),
        )
        c = word.bitwiseAND(mask) == mask
        out = c if out is None else (out & c)
    return out


def _bloom_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    child_col: str,
    how: str,
    bloom_fp: float,
) -> DataFrame:
    """Semi-join reduction: probe every fact row against the dim's
    broadcast Bloom bitmap in codegen; only bloom-positive rows (true
    members + the FP fraction) reach the shuffle join. Bloom-negative
    rows are definite non-members — emitted directly for anti/left,
    dropped for semi. Exact for every ``how`` because the filter has no
    false negatives."""
    from anomalydetector_spark.operators.bloom import bloom_params, build_bloom

    n_keys = dim.count()  # dim is already distinct; bounded action
    m_bits, n_hashes = bloom_params(max(n_keys, 1), bloom_fp)
    bloom_row = F.broadcast(
        build_bloom(dim, child_col, m_bits=m_bits, n_hashes=n_hashes).agg(
            F.map_from_entries(
                F.collect_list(F.struct("chunk", "bits"))
            ).alias("_bloom")
        )
    )
    probed = fact.crossJoin(bloom_row).withColumn(
        "_maybe",
        F.col(child_col).isNotNull()
        & _bloom_probe(F.col(child_col), m_bits, n_hashes, seed=0),
    )
    candidates = (
        probed.filter(F.col("_maybe")).drop("_bloom", "_maybe")
    )
    negatives = probed.filter(~F.col("_maybe")).drop("_bloom", "_maybe")
    dim_h = dim.hint("shuffle_hash")
    if how == "left_semi":
        return candidates.join(dim_h, child_col, "left_semi")
    if how == "left_anti":
        return candidates.join(dim_h, child_col, "left_anti").unionByName(
            negatives
        )
    if how == "left":
        # dim already carries _known=True (added by dim_join for left)
        joined = candidates.join(dim_h, child_col, "left")
        return joined.unionByName(
            negatives.withColumn("_known", F.lit(None).cast("boolean"))
        )
    raise ValueError(f"shuffle_bloom does not support how={how!r}")


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
    strategy: str = "broadcast",
    salts: int = 16,
    salt_on: Column | str | None = None,
    bloom_fp: float = 0.01,
) -> CheckResult:
    """Every non-null ``child[child_col]`` must exist in
    ``parent[parent_col]``. Violations via LEFT ANTI join under the
    chosen ``strategy`` (see module docstring); the passing set is the
    LEFT SEMI complement (not materialized here)."""
    name = f"ref_{child_col}"
    p = _part(child, partition_by)

    dangling = dim_join(
        p.filter(F.col(child_col).isNotNull()),
        parent,
        child_col,
        parent_col,
        how="left_anti",
        strategy=strategy,
        salts=salts,
        salt_on=salt_on,
        bloom_fp=bloom_fp,
    )

    counted = (
        p.groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("rows_scanned"))
        .join(
            dangling.groupBy("partition_key").agg(
                F.count(F.lit(1)).alias("_bad")
            ),
            "partition_key",
            "left",
        )
        .withColumn("violation_count", F.coalesce(F.col("_bad"), F.lit(0)))
        .drop("_bad")
    )
    verdicts = _verdict_from_violation_count(
        counted,
        name,
        errors.DANGLING_REFERENCE.format(child_col, parent_col),
    )
    violations = dangling.select(
        F.lit(name).alias("check_name"), "partition_key", *(keep or [child_col])
    )
    return CheckResult(verdicts, violations)
