"""Spanizer: deterministic (doc_id, text) -> span-stream bridge.

Turns a plain text corpus (the driver's ``documents`` table) into the
engine's interleaved span format with a fixed, SQL-reconstructible
layout, so the *whole extraction pipeline* can be verified end-to-end
against a DuckDB oracle:

- tokens = text split on single spaces;
- title  = first 3 tokens  -> ``heading`` span (h1);
- body   = remaining tokens in chunks of 12 -> one ``text`` span each;
- every 3rd paragraph is preceded by a ``## Part {k}`` heading span.

The resulting documents take the ``direct`` profile, so extraction
markdown is exactly::

    # {title}\n\n[## Part 1\n\n]para0\n\npara1\n\npara2\n\n## Part 2\n\n...

which a DuckDB query can rebuild with list/string functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from docstrange_spark.datagen import SPAN_SCHEMA_DDL

TITLE_TOKENS = 3
PARA_TOKENS = 12
PARAS_PER_PART = 3


def spanize_text(doc_id: str, text: str) -> list[dict]:
    toks = (text or "").split(" ")
    title = " ".join(toks[:TITLE_TOKENS])
    spans = [{"kind": "heading", "text": title, "media_ref": "h1", "offset": 0}]
    off = 1
    body = toks[TITLE_TOKENS:]
    for i in range(0, len(body), PARA_TOKENS):
        pidx = i // PARA_TOKENS
        if pidx % PARAS_PER_PART == 0:
            spans.append(
                {
                    "kind": "heading",
                    "text": f"Part {pidx // PARAS_PER_PART + 1}",
                    "media_ref": "h2",
                    "offset": off,
                }
            )
            off += 1
        spans.append(
            {
                "kind": "text",
                "text": " ".join(body[i : i + PARA_TOKENS]),
                "media_ref": "",
                "offset": off,
            }
        )
        off += 1
    return spans


def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = "doc-" + pdf["doc_id"].astype(str)
        spans = [
            spanize_text(d, t)
            for d, t in zip(ids, pdf["text"].fillna(""))
        ]
        yield pd.DataFrame({"doc_id": ids, "spans": spans})


def spanize(documents: DataFrame) -> DataFrame:
    """(doc_id int64, text string, ...) -> (doc_id 'doc-{id}', spans)."""
    return documents.select("doc_id", "text").mapInPandas(
        _kernel, schema=SPAN_SCHEMA_DDL
    )
