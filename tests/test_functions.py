"""Regression pins for the shared expression helpers
(anomalydetector_spark/functions)."""

from pyspark.sql import functions as F

from anomalydetector_spark.functions import (
    md5_long,
    minhash_signature,
    word_shingles,
)


def test_minhash_signature_is_md5long_min_and_deterministic(spark):
    """The signature must equal element-wise mins of md5_long(f'{i}|'+s)
    and be identical across occurrences AND across the explode-path
    formulation. Regression: a two-parameter transform lambda silently
    receives the element INDEX as its second argument, turning the seed
    into a stringified Column repr — every occurrence then hashes
    differently (the bug shipped in the original helper; pinned here)."""
    sh = ["alpha bravo charlie", "bravo charlie delta", "charlie delta echo"]
    df = spark.createDataFrame([(1, sh)], "id long, sh array<string>")
    r = df.select(
        minhash_signature(F.col("sh"), 3).alias("a"),
        minhash_signature(F.col("sh"), 3).alias("b"),
    ).collect()[0]
    assert r["a"] == r["b"]
    # explode-path equivalent: min over shingles per seed
    want = []
    for i in range(3):
        mins = (
            df.select(F.explode("sh").alias("s"))
            .select(md5_long(F.concat(F.lit(f"{i}|"), F.col("s"))).alias("h"))
            .agg(F.min("h"))
            .collect()[0][0]
        )
        want.append(mins)
    assert list(r["a"]) == want


def test_minhash_signature_survives_project_collapse(spark):
    """CollapseProject inlines a word_shingles expression INTO the
    transform — nested higher-order lambdas must still evaluate
    correctly (the buggy form corrupted exactly this shape)."""
    df = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo")], "id long, text string"
    )
    nested = df.select(
        word_shingles(F.col("text"), 3).alias("sh")
    ).select(minhash_signature(F.col("sh"), 2).alias("sig"))
    direct = df.select(
        minhash_signature(word_shingles(F.col("text"), 3), 2).alias("sig")
    )
    materialized = spark.createDataFrame(
        [(1, ["alpha bravo charlie", "bravo charlie delta", "charlie delta echo"])],
        "id long, sh array<string>",
    ).select(minhash_signature(F.col("sh"), 2).alias("sig"))
    a = nested.collect()[0]["sig"]
    b = direct.collect()[0]["sig"]
    c = materialized.collect()[0]["sig"]
    assert list(a) == list(b) == list(c)
