

def test_fineweb_flags_hand_computed(spark):
    from anomalydetector_spark.operators.quality import (
        fineweb_filter,
        fineweb_quality_flags,
    )

    good = "\n".join(
        [f"This is a long enough well formed sentence number {i}." for i in range(10)]
    )
    # 10 lines, all end '.', all >= 30 chars, no duplicates -> keep
    listy = "\n".join(["item"] * 20)  # short, duplicated, no punct -> all 3 fail
    half = "\n".join(
        ["A proper sentence that is long enough to pass the bar."] * 2
        + ["x"] * 2
    )  # punct ratio 0.5 ok; dup chars (55+1)/112 >= 0.1 fail; short 0.5 ok
    rows = [(1, good), (2, listy), (3, half), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["line_punct_ratio"],
            r["dup_line_char_frac"],
            r["short_line_frac"],
            r["keep"],
        )
        for r in fineweb_quality_flags(df).collect()
    }
    assert got[1] == (1.0, 0.0, 0.0, True)
    assert got[2] == (0.0, round(19 * 4 / 80, 6), 1.0, False)
    assert got[3][1] == round(56 / 112, 6) and got[3][3] is False
    assert got[4] == (0.0, 0.0, 1.0, False)  # null text: one empty line
    kept = {r["doc_id"] for r in fineweb_filter(df).collect()}
    assert kept == {1}


def test_fineweb_boundary_conventions(spark):
    """Pinned boundaries: punct ratio EXACTLY 0.12 drops (<=), dup frac
    exactly 0.1 drops (>=), short frac exactly 0.67 keeps (< 0.67 is
    false at equality -> drops). Empty lines count in line ratios but
    not in duplicate mass."""
    from pyspark.sql import functions as F

    from anomalydetector_spark.operators.quality import fineweb_quality_flags

    # 25 lines: 3 end with '.', 22 don't -> ratio 0.12 exactly
    text = "\n".join(
        [f"ending sentence number {i} properly okay." for i in range(3)]
        + [f"no terminal punctuation line {i} that is long" for i in range(22)]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = fineweb_quality_flags(df).collect()
    assert r["line_punct_ratio"] == 0.12 and r["ok_line_punct"] is False

    # duplicate empty lines contribute nothing to dup mass
    df2 = spark.createDataFrame(
        [(1, "A unique long sentence that ends with a period today.\n\n\n\nAnother unique long sentence ending well.")],
        "doc_id long, text string",
    )
    (r2,) = fineweb_quality_flags(df2).collect()
    assert r2["dup_line_char_frac"] == 0.0
