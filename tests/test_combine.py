"""Multi-document combination parity with the reference CLI
(``cli.py:488-538``): markdown/text ``\\n\\n---\\n\\n`` joins, html
``\\n\\n<hr>\\n\\n`` joins, the json ``{"results", "count", "errors"}``
envelope (indent=2), and csv ``=== File {i} ===`` sections that keep
their position among ALL documents while skipping table-less ones."""

import json

import pytest

from docstrange_spark import datagen
from docstrange_spark.operators import extract, renditions


@pytest.fixture(scope="module")
def combined_inputs(spark):
    df = extract.extract(
        datagen.fixture_spans(spark), formats=("json", "html", "csv")
    )
    rows = df.select("doc_id", "markdown", "json", "html", "csv").orderBy(
        "doc_id"
    ).collect()
    return df, rows


def test_combine_markdown_and_text(spark, combined_inputs):
    df, rows = combined_inputs
    exp = "\n\n---\n\n".join(r["markdown"] for r in rows)
    for fmt in ("markdown", "text"):
        got = renditions.combine_documents(df, fmt).first()
        assert got["combined"] == exp
        assert got["count"] == len(rows)


def test_combine_html_reference_join(spark, combined_inputs, ref_result):
    df, rows = combined_inputs
    got = renditions.combine_documents(df, "html").first()["combined"]
    exp = "\n\n<hr>\n\n".join(
        ref_result.ConversionResult(r["markdown"]).extract_html() for r in rows
    )
    assert got == exp


def test_combine_json_envelope(spark, combined_inputs, ref_result):
    df, rows = combined_inputs
    got = renditions.combine_documents(df, "json").first()
    assert got["count"] == len(rows)
    parsed = json.loads(got["combined"])
    expected_results = [
        {
            **ref_result.MarkdownToJSONParser().parse(r["markdown"]),
            "format": "structured_json",
        }
        for r in rows
    ]
    assert parsed == {
        "results": expected_results,
        "count": len(rows),
        "errors": [],
    }
    # the envelope skeleton matches the reference's indent-2 key order
    assert got["combined"].startswith('{\n  "results": [')
    assert got["combined"].rstrip().endswith('"errors": []\n}')


def test_combine_csv_file_sections(spark, combined_inputs, ref_result):
    df, rows = combined_inputs
    got = renditions.combine_documents(df, "csv").first()
    sections = []
    for i, r in enumerate(rows):
        try:
            csv = ref_result.ConversionResult(r["markdown"]).extract_csv(
                include_all_tables=True
            )
        except ValueError:
            continue  # reference skips table-less files, keeping i
        if csv.strip():
            sections.append(f"=== File {i + 1} ===\n{csv}")
    assert sections, "fixture corpus must contain table docs"
    assert got["combined"] == "\n\n".join(sections)
    assert got["count"] == len(sections)


def test_combine_json_envelope_bytes_non_ascii(spark):
    """Byte-level envelope parity on non-ASCII content: the reference
    serializes with json.dumps(..., indent=2) and the default
    ensure_ascii=True (cli.py:505-518), so 'café' must appear as
    'caf\\u00e9'. Inner keys are OUR canonical sort order (documented
    deviation); the envelope bytes are built the reference's way here,
    independently of the operator."""
    spans = spark.createDataFrame(
        [
            ("doc-a", [{"kind": "text", "text": "café déjà-vu naïve", "media_ref": "", "offset": 0}]),
            ("doc-b", [{"kind": "heading", "text": "Überschrift", "media_ref": "h1", "offset": 0}]),
        ],
        datagen.SPAN_SCHEMA_DDL,
    )
    df = extract.extract(spans, formats=("json",))
    got = renditions.combine_documents(df, "json").first()["combined"]
    payloads = [
        r["json"] for r in df.select("doc_id", "json").orderBy("doc_id").collect()
    ]
    exp = json.dumps(
        {"results": [json.loads(p) for p in payloads], "count": 2, "errors": []},
        indent=2,
    )
    assert got == exp
    assert "caf\\u00e9" in got and "café" not in got
