"""Span-table IO: parquet today, Iceberg when a catalog is configured.

The engine's table contract is format-neutral: ``(doc_id string, spans
array<struct<kind,text,media_ref,offset>>)``. ``read_spans`` /
``write_spans`` try Iceberg first (snapshot lineage for the manifest
layer) and fall back to parquet directories — same schema, same
partitioning discipline (bucket by xxhash64(doc_id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docstrange_spark.datagen import SPAN_SCHEMA_DDL


def is_iceberg_table(path_or_table: str) -> bool:
    """Heuristic: catalog-qualified identifiers (db.table / cat.db.table)
    are Iceberg identifiers; filesystem paths are parquet dirs."""
    return "/" not in path_or_table and "." in path_or_table


def read_spans(spark: SparkSession, src: str) -> DataFrame:
    if is_iceberg_table(src):
        try:
            return spark.read.format("iceberg").load(src)
        except Exception:
            # no Iceberg runtime jar in this environment — table reads
            # degrade to the session catalog
            return spark.table(src)
    return spark.read.schema(SPAN_SCHEMA_DDL).parquet(src)


def write_spans(df: DataFrame, dst: str, buckets: int = 64, mode: str = "overwrite") -> None:
    """Write a span table clustered by doc hash — downstream extraction
    then shuffles minimally (inputs are already well-spread)."""
    clustered = df.repartition(buckets, F.xxhash64("doc_id"))
    if is_iceberg_table(dst):
        try:
            clustered.writeTo(dst).createOrReplace()
            return
        except Exception:
            pass
    clustered.write.mode(mode).parquet(dst)


def snapshot_id(spark: SparkSession, src: str) -> str:
    """Lineage id of the input: Iceberg snapshot when available, else a
    content fingerprint of the parquet dir (sources.manifest)."""
    if is_iceberg_table(src):
        try:
            row = (
                spark.sql(f"SELECT snapshot_id FROM {src}.snapshots "
                          "ORDER BY committed_at DESC LIMIT 1").collect()
            )
            if row:
                return str(row[0][0])
        except Exception:
            pass
    from docstrange_spark.sources.manifest import snapshot_id_of

    return snapshot_id_of(src)
