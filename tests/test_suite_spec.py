

def test_robust_outliers_spec(spark):
    """robust_outliers rides the suite: per-partition MAD gate with a
    tolerated fraction, verdict + violation rows in the standard shape."""
    from pyspark.sql import functions as F

    from anomalydetector_spark.plans import suite as S

    rows = (
        [("a", float(v)) for v in [10, 11, 9, 10, 12, 8, 500]]
        + [("b", 5.0)] * 10
    )
    df = spark.createDataFrame(rows, "grp string, value double")
    res = S.run_suite(
        df,
        [S.robust_outliers("value", k=5.0)],
        partition_by="grp",
    )
    v = {r["partition_key"]: r for r in res.verdicts.collect()}
    assert v["a"]["passed"] is False and v["a"]["violation_count"] == 1
    assert v["b"]["passed"] is True and v["b"]["violation_count"] == 0
    assert "MAD" in v["a"]["error_message"]
    viol = res.violations.collect()
    assert [(r["partition_key"], r["value"]) for r in viol] == [("a", 500.0)]

    # tolerated fraction: 1 outlier of 7 rows passes at 20%
    res2 = S.run_suite(
        df,
        [S.robust_outliers("value", k=5.0, max_outlier_frac=0.2)],
        partition_by="grp",
    )
    v2 = {r["partition_key"]: r["passed"] for r in res2.verdicts.collect()}
    assert v2 == {"a": True, "b": True}
    res.unpersist(); res2.unpersist()
