"""Optional LLM field-extraction surface (U1-U3) — the engine's analog of
the reference's Ollama escape hatches
(``/root/reference/docstrange/services/ollama_service.py:74-300``).

OFF by default and excluded from all goldens/oracles — exactly like the
reference, which silently falls back to the deterministic parser when
Ollama is unreachable (``result.py:979-1001``). The Spark shape is a
``mapInPandas`` stage batching prompts to a local inference endpoint;
without an endpoint the stage degrades to the deterministic parse with a
null ``extracted_fields`` column, so plans composed with it still run.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LLM_SCHEMA = "doc_id string, extracted_fields string, extractor string"


def _post_fields(endpoint: str, model: str, content: str, fields: list[str]) -> dict | None:
    """One prompt round-trip; None on any failure (fallback path)."""
    try:
        import urllib.request

        prompt = (
            "Extract the following fields from the document as JSON with "
            f"exactly these keys: {', '.join(fields)}.\n\n{content[:8000]}"
        )
        req = urllib.request.Request(
            f"{endpoint}/api/generate",
            data=json.dumps(
                {"model": model, "prompt": prompt, "stream": False, "format": "json"}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read())
        parsed = json.loads(body.get("response", "{}"))
        # null-fill missing fields, reference behavior
        return {f: parsed.get(f) for f in fields}
    except Exception:
        return None


def extract_fields(
    df: DataFrame,
    fields: list[str],
    endpoint: str = "http://localhost:11434",
    model: str = "llama3.2",
) -> DataFrame:
    """(doc_id, markdown) -> (doc_id, extracted_fields json, extractor).

    ``extractor`` records which path produced each row: 'llm' or
    'unavailable' (endpoint down — deterministic null-fill, mirroring the
    reference fallback)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, md in zip(pdf["doc_id"], pdf["markdown"]):
                got = _post_fields(endpoint, model, md or "", fields)
                if got is None:
                    rows.append(
                        (doc_id, json.dumps({f: None for f in fields}), "unavailable")
                    )
                else:
                    rows.append((doc_id, json.dumps(got, sort_keys=True), "llm"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "extracted_fields", "extractor"]
            )

    return df.select("doc_id", "markdown").mapInPandas(kernel, schema=LLM_SCHEMA)
