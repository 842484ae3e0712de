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


TABLE_ROWS = 3
TABLE_COLS = 3


def spanize_tabular(doc_id: str, text: str) -> list[dict]:
    """Tabular bridge: first 9 tokens as a 3x3 table_cell grid under a
    heading — exercises the grid-pivot (O13/O14) and CSV-rendition (R5)
    paths end-to-end with a SQL-reconstructible layout. Missing tokens
    pad as ``v{i}``."""
    toks = (text or "").split(" ")
    spans = [
        {"kind": "heading", "text": f"Sheet {doc_id}", "media_ref": "h1", "offset": 0}
    ]
    for r in range(TABLE_ROWS):
        for c in range(TABLE_COLS):
            i = TABLE_ROWS * r + c
            tok = toks[i] if i < len(toks) else ""
            spans.append(
                {
                    "kind": "table_cell",
                    # empty cells would be dropped by the markdown table
                    # parser; pad so the layout is SQL-reconstructible
                    "text": tok if tok else f"v{i}",
                    "media_ref": f"r{r}:c{c}:t0",
                    "offset": 1 + i,
                }
            )
    return spans


def _tabular_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = "csv_sheet-" + pdf["doc_id"].astype(str)
        spans = [
            spanize_tabular(d, t) for d, t in zip(ids, pdf["text"].fillna(""))
        ]
        yield pd.DataFrame({"doc_id": ids, "spans": spans})


def spanize_tables(documents: DataFrame) -> DataFrame:
    """(doc_id int64, text, ...) -> ('csv_sheet-{id}', table spans)."""
    return documents.select("doc_id", "text").mapInPandas(
        _tabular_kernel, schema=SPAN_SCHEMA_DDL
    )


def spanize_list(doc_id: str, text: str) -> list[dict]:
    """List bridge: first 4 tokens as a nested unordered pair + an
    ordered pair — exercises list rendering (ul/ol markers, indent)
    end-to-end, SQL-reconstructible. Missing/empty tokens pad as w{i}."""
    toks = (text or "").split(" ")

    def tok(i: int) -> str:
        return toks[i] if i < len(toks) and toks[i] else f"w{i}"

    return [
        {"kind": "heading", "text": f"List {doc_id}", "media_ref": "h2", "offset": 0},
        {"kind": "list_item", "text": tok(0), "media_ref": "ul:0", "offset": 1},
        {"kind": "list_item", "text": tok(1), "media_ref": "ul:1", "offset": 2},
        {"kind": "list_item", "text": tok(2), "media_ref": "ol:0:1", "offset": 3},
        {"kind": "list_item", "text": tok(3), "media_ref": "ol:0:2", "offset": 4},
    ]


def _list_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids = "no_headers-" + pdf["doc_id"].astype(str)
        spans = [spanize_list(d, t) for d, t in zip(ids, pdf["text"].fillna(""))]
        yield pd.DataFrame({"doc_id": ids, "spans": spans})


def spanize_lists(documents: DataFrame) -> DataFrame:
    return documents.select("doc_id", "text").mapInPandas(
        _list_kernel, schema=SPAN_SCHEMA_DDL
    )


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
