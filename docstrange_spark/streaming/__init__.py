"""Structured Streaming variant of the extraction pipeline.

The reference is strictly batch (one-shot per document); a web-scale
deployment ingests continuously, so the engine exposes the same kernel
as a streaming stage: ``readStream`` over the span table directory ->
``mapInPandas`` extract -> sink. The kernel is stateless per document,
so no watermark/state is needed for extraction itself; the manifest
layer covers replay (exactly-once via file-sink transaction log +
checkpointLocation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from docstrange_spark.datagen import SPAN_SCHEMA_DDL
from docstrange_spark.operators.extract import BASE_SCHEMA, _extract_kernel


def read_span_stream(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(SPAN_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Streaming extraction: same kernel, streaming plan. Salting is a
    no-op in micro-batch mode (each batch is already file-bounded)."""
    return stream_df.select("doc_id", "spans").mapInPandas(
        _extract_kernel, schema=BASE_SCHEMA
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked session aggregation over an event stream: one row per
    (user_id, session window) with event count and value sum. Works on
    both streaming and batch frames (same plan, state only when
    streaming); late data beyond the watermark is dropped — the standard
    Structured Streaming pattern for the engine's ingest telemetry."""
    from pyspark.sql import functions as F

    # event time must be TIMESTAMP (parquet may carry TIMESTAMP_NTZ)
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("session"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_first_seen(
    docs: DataFrame,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Custom stateful operator: emit only the FIRST document seen for
    each content hash across the whole stream — streaming exact-dedup
    via ``applyInPandasWithState`` (keyed state = "seen" flag + keeper).

    Input: a streaming frame with (doc_id, content_hash). Output: one row
    per hash, the first doc that carried it. Batch mode falls back to a
    plain groupBy-min (same result on a bounded input).
    """
    from pyspark.sql import functions as F

    if not docs.isStreaming:
        return docs.groupBy(hash_col).agg(F.min("doc_id").alias("keeper_doc_id"))

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup_fn(key, pdfs, state):
        first = None
        for pdf in pdfs:
            cand = pdf["doc_id"].min()
            first = cand if first is None else min(first, cand)
        if state.exists:
            return iter(())  # hash already emitted in an earlier batch
        state.update((str(first),))
        yield pd.DataFrame({"content_hash": [key[0]], "keeper_doc_id": [first]})

    return (
        docs.groupBy(hash_col)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType="content_hash string, keeper_doc_id string",
            stateStructType="keeper string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_parquet(
    extracted: DataFrame, out_path: str, checkpoint: str, available_now: bool = True
):
    """Write the stream to parquet with exactly-once file-sink semantics;
    ``available_now`` drains what exists and stops (test/backfill mode)."""
    w = (
        extracted.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
