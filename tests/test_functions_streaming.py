"""Column helpers + Structured Streaming pipeline + plan-shape checks
(pushdown/pruning — the scale-hygiene assertions)."""

import time

import pytest
from pyspark.sql import functions as F

from docstrange_spark import datagen
from docstrange_spark import functions as dsf
from docstrange_spark import streaming
from docstrange_spark.operators import extract


def test_span_column_helpers(spark):
    df = datagen.fixture_spans(spark)
    row = (
        df.where(F.col("doc_id").startswith("html_page"))
        .select(
            dsf.span_kind_counts().alias("counts"),
            dsf.drop_boilerplate_spans().alias("clean"),
            dsf.media_refs().alias("refs"),
        )
        .first()
    )
    assert row["counts"]["script"] == 1
    assert all(s["kind"] not in ("script", "style") for s in row["clean"])
    assert "/about" in row["refs"]

    # reading-order sort puts the pdf fixture's out-of-order pair right
    pdf_row = (
        df.where(F.col("doc_id").startswith("pdf_pages"))
        .select(dsf.spans_sorted().alias("s"))
        .first()
    )
    offs = [s["offset"] for s in pdf_row["s"]]
    assert offs == sorted(offs)

    text = (
        df.where(F.col("doc_id").startswith("md_structure"))
        .select(dsf.text_payload().alias("t"))
        .first()["t"]
    )
    assert text.startswith("Main Title This is the introduction")


def test_streaming_extract(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    datagen.fixture_spans(spark).write.parquet(src)

    stream = streaming.read_span_stream(spark, src, max_files=2)
    assert stream.isStreaming
    q = streaming.run_to_parquet(streaming.extract_stream(stream), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = extract.extract(datagen.fixture_spans(spark), salt=False)
    a = {r["doc_id"]: r["markdown"] for r in got.collect()}
    b = {r["doc_id"]: r["markdown"] for r in batch.collect()}
    assert a == b

    # restart with nothing new: exactly-once, no duplicate rows
    q2 = streaming.run_to_parquet(
        streaming.extract_stream(streaming.read_span_stream(spark, src)), out, ckpt
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(a)


def test_parquet_pushdown_and_pruning(spark, tmp_path):
    """Filters and projections must reach the scan: PushedFilters carries
    the predicate and ReadSchema holds only the selected columns."""
    p = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(p)
    df = (
        spark.read.parquet(p)
        .where(F.col("lang") == "en")
        .select("doc_id", "lang")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan
    assert "n_chars" not in plan.split("ReadSchema")[1][:200]


def test_extract_plan_shape(spark):
    """Default plan: ONE salt exchange (hashpartitioning on xxhash64)
    feeding ONE Python kernel stage; two-tier routing doubles both only
    when explicitly requested."""
    plan = (
        extract.extract(datagen.fixture_spans(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64(doc_id" in plan
    assert plan.count("MapInPandas") == 1

    plan2 = (
        extract.extract(datagen.fixture_spans(spark), mega_threshold=1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan2.count("MapInPandas") == 2  # small tier + mega tier
