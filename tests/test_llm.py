"""U1-U3 LLM surface over the deterministic fake:// endpoint — prompt
shape, the reference's {.*} JSON repair, the U2 from_json schema
validation, the U3 document envelope, and every fallback path. No
network: fake:// is an in-process test double; the unavailable path
uses a closed localhost port (instant refusal)."""

import json

import pytest

from docstrange_spark.operators import llm

SCHEMA = {
    "type": "object",
    "properties": {
        "title": {"type": "string"},
        "age": {"type": "integer"},
        "score": {"type": "number"},
        "active": {"type": "boolean"},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
}


@pytest.fixture(scope="module")
def mddf(spark):
    return spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "delta epsilon")],
        "doc_id string, markdown string",
    )


def test_ddl_from_json_schema():
    ddl = llm.ddl_from_json_schema(SCHEMA)
    assert "`title` string" in ddl
    assert "`age` bigint" in ddl
    assert "`score` double" in ddl
    assert "`active` boolean" in ddl
    assert "`tags` array<string>" in ddl


def test_scrape_json_repair():
    assert llm._scrape_json('{"a": 1}') == {"a": 1}
    assert llm._scrape_json('noise before {"a": 1} after') == {"a": 1}
    assert llm._scrape_json("no json at all") is None
    assert llm._scrape_json("[1, 2]") is None  # must be an object


def test_u1_fields_fake_endpoint(mddf):
    out = llm.extract_fields(
        mddf, ["title", "author"], endpoint="fake://llm"
    ).orderBy("doc_id").collect()
    assert [r["extractor"] for r in out] == ["llm", "llm"]
    got = json.loads(out[0]["extracted_fields"])
    assert got == {"title": "title:alpha", "author": "author:alpha"}


def test_u1_unavailable_null_fills(mddf):
    out = llm.extract_fields(
        mddf, ["title"], endpoint="http://127.0.0.1:9"
    ).collect()
    assert all(r["extractor"] == "unavailable" for r in out)
    assert all(json.loads(r["extracted_fields"]) == {"title": None} for r in out)


def test_u2_schema_conformant_and_validated(mddf):
    out = llm.extract_with_schema(mddf, SCHEMA, endpoint="fake://llm").orderBy(
        "doc_id"
    ).collect()
    r = out[0]
    assert r["extractor"] == "llm" and r["valid"]
    # from_json produced a TYPED struct matching the user schema
    assert r["data"]["title"] == "alpha"
    assert r["data"]["age"] == 42
    assert r["data"]["score"] == 3.5
    assert r["data"]["active"] is True


def test_u2_parse_error_path(mddf):
    out = llm.extract_with_schema(mddf, SCHEMA, endpoint="fake://bad").collect()
    assert all(r["extractor"] == "parse_error" for r in out)
    assert not any(r["valid"] for r in out)
    # null-filled payload still parses under the schema (fields all null)
    assert all(r["data"]["title"] is None for r in out)


def test_u3_document_envelope(mddf):
    out = llm.extract_document_json(mddf, endpoint="fake://llm").orderBy(
        "doc_id"
    ).collect()
    doc = json.loads(out[0]["document_json"])
    assert out[0]["extractor"] == "llm"
    assert doc == {"document": {"lead_token": "alpha"}}


def test_u3_fallback_is_deterministic_parser(mddf):
    from docstrange_spark.kernels import mdjson

    out = llm.extract_document_json(mddf, endpoint="http://127.0.0.1:9").orderBy(
        "doc_id"
    ).collect()
    assert out[0]["extractor"] == "fallback_parser"
    assert json.loads(out[0]["document_json"]) == mdjson.parse_markdown(
        "alpha beta gamma"
    )


def test_cloud_envelope_shapes(mddf):
    """R7 deterministic envelopes match the reference's dict shapes
    (cloud_processor.py:140-184) and the JVM-side wrapper serializes
    them byte-for-byte."""
    assert llm.cloud_envelope_fields({"a": 1}) == {
        "extracted_fields": {"a": 1},
        "format": "specified_fields",
    }
    assert llm.cloud_envelope_schema({"b": 2}) == {
        "structured_data": {"b": 2},
        "format": "structured_json",
    }
    assert llm.cloud_envelope_document({"c": 3}) == {
        "document": {"c": 3},
        "format": "cloud_flat_json",
    }
    err = llm.cloud_envelope_error("raw", "boom")
    assert err["format"] == "json_parse_error" and err["error"] == "boom"

    out = llm.extract_fields(mddf, ["title"], endpoint="fake://llm")
    env = llm.with_cloud_envelope(out, "extracted_fields", "fields").first()
    parsed = json.loads(env["extracted_fields_enveloped"])
    assert parsed == llm.cloud_envelope_fields(
        json.loads(env["extracted_fields"])
    )
    # concat-built envelope is byte-equal to a real json.dumps of it
    assert env["extracted_fields_enveloped"] == json.dumps(
        parsed, ensure_ascii=False
    )


def test_repair_json_gpu_differential():
    """Byte-for-byte differential vs the reference GPU processor's
    try_parse_json (gpu_processor.py:176-186), reimplemented here from
    its source: plain parse, bare-key + quote repair, raw_text fallback."""
    import json as _json
    import re as _re

    from docstrange_spark.operators.llm import repair_json_gpu

    def reference_try_parse_json(text):
        try:
            return _json.loads(text)
        except _json.JSONDecodeError:
            try:
                text = _re.sub(r"(\w+):", r'"\1":', text)
                text = text.replace("'", '"')
                return _json.loads(text)
            except Exception:
                return {"raw_text": text}

    cases = [
        '{"a": 1, "b": "x"}',                 # already valid
        "{a: 1, b: 'two'}",                   # bare keys + single quotes
        "{total: 42, note: 'it''s'}",         # repair makes it worse -> raw_text
        "not json at all",
        "{'nested': {'k': 3}}",
        "[1, 2, 3]",                          # non-dict valid JSON passes through
        "{price: 9.5}",
        "",
    ]
    for c in cases:
        assert repair_json_gpu(c) == reference_try_parse_json(c), c


def test_gpu_envelope_shape():
    from docstrange_spark.operators.llm import gpu_envelope, repair_json_gpu

    got = gpu_envelope(repair_json_gpu("{invoice: '12'}"))
    assert got["format"] == "gpu_structured_json"
    assert got["document"] == {"invoice": "12"}
    info = got["gpu_processing_info"]
    assert info["ocr_provider"] == "nanonets"
    assert info["processing_mode"] == "gpu"
    assert info["json_extraction_method"] == "nanonets_model"
