"""SemDeDup (operators/semdedup — Abbas et al. 2023): sign-bucket
partitioning, within-bucket cosine pairs, keep-one-per-group."""

import hashlib
import math
import random

import pyspark.sql.functions as F

from anomalydetector_spark.operators.semdedup import (
    embedding_buckets,
    semantic_dedup,
    semdedup_pairs,
)

D_IN = 6


def _sign(seed, i, j):
    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def bucket_py(vec, d_out, seed=0):
    scale = 1.0 / math.sqrt(d_out)
    b = 0
    for j in range(d_out):
        v = sum(x * _sign(seed, i, j) for i, x in enumerate(vec)) * scale
        if v >= 0:
            b |= 1 << j
    return b


def cos_py(a, b):
    # the operator's LEFT-fold order
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    nb = 0.0
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def semdedup_py(rows, d_out, threshold, seed=0):
    bk = {i: bucket_py(v, d_out, seed) for i, v in rows if v is not None}
    nz = {i for i, v in rows if v is not None and any(x != 0 for x in v)}
    ids = sorted(nz)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    vec = dict(rows)
    for ia in ids:
        for ib in ids:
            if ia < ib and bk[ia] == bk[ib]:
                if cos_py(vec[ia], vec[ib]) >= threshold:
                    ra, rb = find(ia), find(ib)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i, v in rows:
        if v is None:
            out[i] = (None, i, True)
        elif i not in nz:
            out[i] = (bk[i], i, True)  # zero-norm: never paired
        else:
            g = find(i)
            out[i] = (bk[i], g, g == i)
    return out


def _mkrows(rng, n, with_dups=True):
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(D_IN)]
        rows.append((i, base))
        if with_dups and rng.random() < 0.3:
            # near-duplicate: tiny jitter keeps cosine ~1
            rows.append(
                (1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base])
            )
    rows.append((9998, None))
    return rows


def _run(spark, rows, d_out=3, threshold=0.95):
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    got = {
        r.vec_id: (r.bucket, r.group_id, r.keep)
        for r in semantic_dedup(
            df, d_in=D_IN, d_out=d_out, threshold=threshold
        ).collect()
    }
    return got


def test_matches_pure_python(spark):
    rng = random.Random(11)
    rows = _mkrows(rng, 25)
    assert _run(spark, rows) == semdedup_py(rows, d_out=3, threshold=0.95)


def test_near_duplicates_collapse_to_one_keeper(spark):
    base = [0.5, -0.2, 0.9, 0.1, -0.7, 0.3]
    rows = [
        (1, base),
        (2, [x * 1.001 for x in base]),       # same direction
        (3, [x + 0.001 for x in base]),
        (4, [-x for x in base]),              # opposite: not a dup
    ]
    got = _run(spark, rows, threshold=0.99)
    assert got[1][2] and not got[2][2] and not got[3][2]
    assert got[2][1] == got[3][1] == 1
    assert got[4][2]


def test_cross_bucket_duplicates_are_missed_by_design(spark):
    # a vector straddling a hyperplane can land in another bucket than
    # its near-dup; the operator documents this recall ceiling.
    rng = random.Random(5)
    rows = _mkrows(rng, 40)
    got = _run(spark, rows, d_out=6, threshold=0.95)
    want = semdedup_py(rows, d_out=6, threshold=0.95)
    assert got == want  # exact agreement INCLUDING the misses


def test_every_row_gets_a_verdict(spark):
    rng = random.Random(7)
    rows = _mkrows(rng, 10)
    got = _run(spark, rows)
    assert set(got) == {i for i, _ in rows}
    assert got[9998] == (None, 9998, True)


def test_zero_norm_vector_never_pairs(spark):
    # a zero vector lands in the all-nonnegative-signs bucket alongside
    # real vectors; its cosine is 0/0 = NaN and Spark sorts NaN above
    # every double — without the norm guard it would chain the whole
    # bucket into one "duplicate" group
    base = [0.5, 0.2, 0.9, 0.1, 0.7, 0.3]
    rows = [
        (1, base),
        (2, [x * 1.001 for x in base]),
        (3, [0.0] * D_IN),
    ]
    got = _run(spark, rows, d_out=1, threshold=0.99)  # one bucket each
    want = semdedup_py(rows, d_out=1, threshold=0.99)
    assert got == want
    assert got[3][2] is True            # zero vector kept
    assert got[3][1] == 3               # ... and alone in its group
    assert not got[2][2]                # the real dup still collapses


def test_keep_set_is_one_per_group(spark):
    rng = random.Random(13)
    rows = _mkrows(rng, 30)
    got = _run(spark, rows)
    groups = {}
    for i, (_, g, k) in got.items():
        groups.setdefault(g, []).append((i, k))
    for g, members in groups.items():
        keepers = [i for i, k in members if k]
        assert keepers == [g] == [min(i for i, _ in members)]


def test_pairs_are_bucket_equi_join_not_all_pairs(spark):
    rng = random.Random(3)
    rows = [r for r in _mkrows(rng, 20) if r[1] is not None]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    plan = (
        semdedup_pairs(df, d_in=D_IN, d_out=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" in plan
    assert "Cartesian" not in plan and "cross" not in plan.lower()
    # join condition carries the bucket key
    assert "bucket" in plan.split("Join")[1].splitlines()[0]


def test_bucket_projection_is_zero_shuffle(spark):
    rows = [(1, [0.1] * D_IN), (2, [0.2] * D_IN)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    plan = (
        embedding_buckets(df, d_in=D_IN, d_out=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
