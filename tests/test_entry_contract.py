"""Driver-contract smoke: entry() runs at sf0.001 with a stable schema;
every oracle key has a query; a sample of queries executes at sf0.001.
(Full value parity vs DuckDB is exercised by tools/check_oracle_parity.py
and by the driver at sf0.01.)"""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "partition_key", "stat_name", "n_windows", "n_anomalous", "verdict"
    }


def test_oracle_keys_subset():
    qs = entry_mod.queries()
    missing = set(entry_mod.oracle_sql()) - set(qs)
    assert not missing


@pytest.mark.parametrize(
    "name",
    ["stats_pass_events", "duplicate_keys", "dedup_exact", "embedding_topk",
     "token_counts", "segment_adjusted"],
)
def test_sample_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0  # executes without error
