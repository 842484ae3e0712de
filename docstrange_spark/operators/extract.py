"""The extraction pipeline: span table -> markdown + block stream.

Scale design (the north rule's partitioning/shuffle/skew clause):

- **salted repartition by xxhash64(doc_id)**: documents are spread
  uniformly regardless of doc_id distribution, defusing producer skew
  (e.g. all docs of one crawl batch landing in one input file);
- **two-tier mega-document routing**: within-row skew (one document with
  100× the median span count) cannot be split by AQE, so documents with
  ``size(spans) >= mega_threshold`` are routed to their own partition set
  and processed with small Arrow batches — a straggler mega-doc then
  costs one task, not a whole partition's worth of siblings;
- **Arrow batching**: ``spark.sql.execution.arrow.maxRecordsPerBatch`` is
  kept small (session.py) because span arrays are fat.

The kernel is one ``mapInPandas`` over Arrow batches — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docstrange_spark.kernels.assembly import assemble_batch

EXTRACT_SCHEMA = (
    "doc_id string, markdown string, "
    "out_spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "n_blocks int, profile string"
)

# Docs with at least this many spans take the mega route (≈ >30× the
# typical fixture-class span count).
MEGA_SPAN_THRESHOLD = 2048


def _extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf):
            yield assemble_batch(pdf["doc_id"], pdf["spans"])


def extract(
    df: DataFrame,
    parallelism: int | None = None,
    mega_threshold: int = MEGA_SPAN_THRESHOLD,
    salt: bool = True,
) -> DataFrame:
    """Run the extraction kernel over a span table
    ``(doc_id string, spans array<struct<...>>)``.

    Returns ``(doc_id, markdown, out_spans, n_blocks, profile)``.
    """
    spark = df.sparkSession
    n_part = parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col("doc_id"), F.col("spans")]

    if not salt:
        return df.select(*cols).mapInPandas(_extract_kernel, schema=EXTRACT_SCHEMA)

    sized = df.select(*cols, F.size("spans").alias("_n_spans"))
    small = (
        sized.where(F.col("_n_spans") < mega_threshold)
        .repartition(n_part, F.xxhash64("doc_id"))
        .drop("_n_spans")
    )
    # mega docs: one doc per task (repartition count scaled to keep tasks
    # tiny); their Arrow batches hold a single row
    big = (
        sized.where(F.col("_n_spans") >= mega_threshold)
        .repartition(n_part, F.xxhash64("doc_id"))
        .drop("_n_spans")
    )
    return small.mapInPandas(_extract_kernel, schema=EXTRACT_SCHEMA).unionByName(
        big.mapInPandas(_extract_kernel, schema=EXTRACT_SCHEMA)
    )
