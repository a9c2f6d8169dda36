"""Partition-balance and join-fanout profiling (operators/
cardinality.py): pure-Python mirrors on exact integers, skew
detection, NULL-key semantics, partition invariance."""

import random

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.cardinality import (
    fanout_histogram,
    join_fanout_profile,
    partition_balance,
    partition_sizes,
)


def _mirror_balance(sizes):
    p = len(sizes)
    s = sum(sizes)
    s2 = sum(n * n for n in sizes)
    asc = sorted(sizes)
    rank_sum = sum((i + 1) * n for i, n in enumerate(asc))
    import math

    return {
        "n_partitions": p,
        "n_rows": s,
        "max_rows": max(sizes),
        "median_rows": asc[(p + 1) // 2 - 1],
        "mean_rows": float(s) / float(p),
        "cv": math.sqrt(float(p * s2 - s * s)) / float(s),
        "gini": float(2 * rank_sum - (p + 1) * s) / float(p * s),
        "max_over_median": float(max(sizes)) / float(asc[(p + 1) // 2 - 1]),
        "top_share": float(max(sizes)) / float(s),
    }


def test_partition_balance_mirror(spark):
    rnd = random.Random(5)
    sizes = {f"d{i}": rnd.randint(1, 50) for i in range(20)}
    sizes["hot"] = 600
    rows = [(k,) for k, n in sizes.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "domain string")
    got = partition_balance(df, ["domain"]).collect()[0]
    exp = _mirror_balance(list(sizes.values()))
    for field, want in exp.items():
        assert got[field] == want, (field, got[field], want)
    assert got.gini > 0.4  # the hot partition dominates
    assert got.top_share == pytest.approx(600 / sum(sizes.values()))

    # uniform sizes: gini == 0, cv == 0, ratio == 1
    uni = spark.createDataFrame(
        [(f"p{i}",) for i in range(8) for _ in range(25)], "domain string"
    )
    g2 = partition_balance(uni, ["domain"]).collect()[0]
    assert g2.gini == 0.0 and g2.cv == 0.0 and g2.max_over_median == 1.0


def test_partition_sizes_ranks_and_null_partition(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 3 + [("b",)] * 1, "domain string"
    )
    got = {r.domain: r for r in partition_sizes(df, ["domain"]).collect()}
    assert got["a"].size_rank == 1 and got["a"].n_rows == 5
    assert got[None].n_rows == 3 and got[None].size_rank == 2
    assert got["b"].share == pytest.approx(1 / 9)


def test_partition_balance_invariance(spark):
    rnd = random.Random(6)
    rows = [(f"d{rnd.randint(0, 30)}",) for _ in range(2000)]
    df = spark.createDataFrame(rows, "domain string")
    a = partition_balance(df.coalesce(1), ["domain"]).collect()[0]
    b = partition_balance(df.repartition(11), ["domain"]).collect()[0]
    assert a == b


def test_join_fanout_profile_exact(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "key int"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (3,), (4,), (None,)], "key int"
    )
    got = join_fanout_profile(left, right, "key").collect()[0]
    # key 1: 2x3=6, key 3: 1x1=1 -> out 7; nulls never join
    assert got.n_left == 4 and got.n_right == 5
    assert got.n_keys_left == 3 and got.n_keys_right == 3
    assert got.n_keys_common == 2
    assert got.out_rows == 7
    assert got.max_left_mult == 2 and got.max_right_mult == 3
    assert got.max_key_fanout == 6
    assert got.amplification == 7 / 5
    # the prediction equals the materialized join
    real = left.dropna().join(right.dropna(), "key").count()
    assert real == got.out_rows


def test_join_fanout_disjoint_keys(spark):
    left = spark.createDataFrame([(1,), (2,)], "key int")
    right = spark.createDataFrame([(3,)], "key int")
    got = join_fanout_profile(left, right, "key").collect()[0]
    assert got.out_rows == 0 and got.n_keys_common == 0
    assert got.max_key_fanout == 0 and got.amplification == 0.0


def test_fanout_histogram(spark):
    df = spark.createDataFrame(
        [(1,)] * 3 + [(2,)] * 3 + [(3,)] * 1 + [(None,)] * 5, "key int"
    )
    got = {r.multiplicity: r.n_keys for r in fanout_histogram(df, "key").collect()}
    assert got == {3: 2, 1: 1}
