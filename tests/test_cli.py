"""CLI + span-table IO smoke tests."""

import pandas as pd

from docstrange_spark import cli, datagen
from docstrange_spark.sources import span_table


def test_cli_markdown_roundtrip(spark, tmp_path):
    src = str(tmp_path / "spans_in")
    out = str(tmp_path / "md_out")
    datagen.fixture_spans(spark).write.parquet(src)

    assert cli.main([src, "--out", out, "--output-format", "markdown", "--cpus", "4"]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 15
    assert "markdown" in got.columns


def test_cli_combine_and_spanize(spark, tmp_path):
    out = str(tmp_path / "combined")
    rc = cli.main(
        [
            "/root/testdata/sf0.001/documents.parquet",
            "--spanize",
            "--out", out,
            "--output-format", "markdown",
            "--combine",
            "--cpus", "4",
        ]
    )
    assert rc == 0
    row = spark.read.parquet(out).collect()[0]
    assert row["count"] == 500
    assert "\n\n---\n\n" in row["combined"]


def test_cli_resume_mode(spark, tmp_path):
    src = str(tmp_path / "spans_in2")
    out = str(tmp_path / "resumable_out")
    datagen.fixture_spans(spark).write.parquet(src)
    rc = cli.main([src, "--out", out, "--output-format", "json", "--resume", "--cpus", "4"])
    assert rc == 0
    got = span_table.read_spans.__globals__  # noqa: F841 (import sanity)
    data = spark.read.parquet(out + "/data")
    assert data.count() == 15
    assert "json" in data.columns


def test_span_table_helpers(spark, tmp_path):
    p = str(tmp_path / "st")
    df = datagen.fixture_spans(spark)
    span_table.write_spans(df, p, buckets=4)
    back = span_table.read_spans(spark, p)
    assert back.count() == df.count()
    assert not span_table.is_iceberg_table(p)
    assert span_table.is_iceberg_table("db.tbl")
    assert len(span_table.snapshot_id(spark, p)) == 32


def test_cli_csv_combine_errors_without_tables(spark, tmp_path):
    """Reference parity (cli.py:533-535): csv combine over a corpus with
    zero tables exits 1 with the reference's error message; a corpus
    WITH tables combines fine."""
    from docstrange_spark import cli

    rc = cli.main([
        "/root/testdata/sf0.001/documents.parquet", "--spanize",
        "--out", str(tmp_path / "none"), "--combine",
        "--output-format", "csv", "--cpus", "4",
    ])
    assert rc == 1

    src = str(tmp_path / "spans")
    datagen.fixture_spans(spark).write.parquet(src)
    rc = cli.main([
        src, "--out", str(tmp_path / "some"), "--combine",
        "--output-format", "csv", "--cpus", "4",
    ])
    assert rc == 0
    got = spark.read.parquet(str(tmp_path / "some")).first()
    assert got["count"] > 0 and "=== File " in got["combined"]
