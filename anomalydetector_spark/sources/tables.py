"""Table source abstraction: Iceberg when a catalog is configured,
parquet directories otherwise (SURVEY.md §7.3 "Iceberg in sandbox").

The engine codes against ``read_table`` / ``table_version`` only, so the
same programs run on an Iceberg catalog (partition pruning, snapshot
lineage, time travel) and on plain parquet (sandbox / tests). Lineage for
the checkpoint manifest comes from ``table_version`` — the Iceberg
snapshot id when available, else a file-listing digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_iceberg_ref(ref: str) -> bool:
    """Catalog references look like ``catalog.db.table`` (no slashes);
    paths contain a separator or end in .parquet."""
    return "/" not in ref and not ref.endswith(".parquet")


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_iceberg_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def table_version(spark: SparkSession, ref: str) -> str:
    """Lineage id: Iceberg current snapshot id, or a digest of the parquet
    file listing (name/size/mtime)."""
    if is_iceberg_ref(ref):
        try:
            row = (
                spark.sql(f"SELECT snapshot_id FROM {ref}.snapshots "
                          "ORDER BY committed_at DESC LIMIT 1")
                .collect()
            )
            if row:
                return str(row[0][0])
        except Exception:
            pass
        return f"table:{ref}"
    from anomalydetector_spark.manifest import snapshot_id_for_path

    return snapshot_id_for_path(ref)


def write_output(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Sink twin of read_table: ``writeTo`` for catalog tables, parquet
    for paths."""
    if is_iceberg_ref(ref):
        writer = df.writeTo(ref)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        df.write.mode(mode).parquet(ref)
