"""Bucketed tables: shuffle-free co-located joins for repeated keyed
work (the classic Spark bucketing pattern — both sides pre-hashed into
the same bucket layout, so an equi-join on the bucket key plans as a
sort-merge join with ZERO exchanges).

At corpus scale the span table, section table, and per-doc feature
tables are all keyed by doc_id and joined repeatedly; bucketing them
once turns every later join from a full shuffle into a local zip. The
sandbox has no Hive metastore service, but Spark's built-in catalog
persists bucket specs to the local warehouse, which is exactly the
mechanism a cluster deployment uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    key: str = "doc_id",
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key``. Sorting within
    buckets lets the sort-merge join skip its sort too."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str = "doc_id", how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned
    without exchanges when bucket counts match."""
    return spark.table(left).join(spark.table(right), key, how)
