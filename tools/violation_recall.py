#!/usr/bin/env python
"""Violation-row recall/precision vs ground truth (the north metric's
"violation-row recall" term, BASELINE.json).

Builds the synthetic pages table, derives each check's ground-truth
violation row multiset with an INDEPENDENT DataFrame program (no engine
code), runs the engine, and scores the engine's violation rows against
the truth. Prints one JSON line:

    {"metric": "violation_row_recall", "checks": {name: {"recall": r,
     "precision": p, "truth_rows": n, "engine_rows": m}}, ...}

Row identity is the (check_name, url) multiset — the engine emits one
violation row per offending input row, so multiset equality means both
recall AND precision are exact.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def score(spark, n_rows: int = 200_000) -> dict:
    from anomalydetector_spark import datagen
    from anomalydetector_spark.engine import ValidationConfig, run_validation

    pages = datagen.generate_pages(spark, n_rows).persist()
    domains = datagen.domains_dim(spark)

    # --- ground truth, derived independently of the engine -------------
    # unique_url: every row whose url occurs more than once globally
    dup_urls = (
        pages.groupBy("url")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    truth_unique = (
        pages.join(dup_urls.select("url"), "url", "left_semi")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # ref_domain: rows whose domain is absent from the dimension
    truth_ref = (
        pages.filter(F.col("domain").isNotNull())
        .join(domains, "domain", "left_anti")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    truths = {"unique_url": truth_unique, "ref_domain": truth_ref}

    # --- engine --------------------------------------------------------
    res = run_validation(pages, domains, ValidationConfig())
    engine = (
        res.violations.groupBy("check_name", "url")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )

    out: dict = {}
    for name, truth in truths.items():
        t = truth.withColumnRenamed("n", "tn")
        e = engine.filter(F.col("check_name") == name).withColumnRenamed("n", "en")
        joined = t.join(e.select("url", "en"), "url", "full").select(
            F.coalesce(F.col("tn"), F.lit(0)).alias("tn"),
            F.coalesce(F.col("en"), F.lit(0)).alias("en"),
        )
        agg = joined.agg(
            F.sum("tn").alias("truth_rows"),
            F.sum("en").alias("engine_rows"),
            F.sum(F.least("tn", "en")).alias("hit"),
        ).first()
        out[name] = {
            "recall": agg.hit / agg.truth_rows if agg.truth_rows else 1.0,
            "precision": agg.hit / agg.engine_rows if agg.engine_rows else 1.0,
            "truth_rows": int(agg.truth_rows),
            "engine_rows": int(agg.engine_rows),
        }
    res.unpersist()
    engine.unpersist()
    pages.unpersist()
    return out


def main() -> None:
    from anomalydetector_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_RECALL_ROWS", "200000"))
    spark = get_spark("violation-recall", cores=8, shuffle_partitions=16)
    checks = score(spark, n)
    print(
        json.dumps(
            {"metric": "violation_row_recall", "rows": n, "checks": checks}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
