"""Markdown -> CSV rendition kernel (R5).

Behavior-compatible with ``/root/reference/docstrange/result.py:1028-1135``:
tables are collected depth-first from the structured-JSON parse (sections
then subsections), falling back to a direct markdown table scrape; output
is ``csv.writer`` formatting with ``=== Table {i} ===`` separators in
all-tables mode. Returns '' (rather than raising) when a document has no
tables so the kernel stays total over a corpus column.
"""

from __future__ import annotations

import csv
import io
from typing import Any

from docstrange_spark.kernels.mdjson import _tables as scrape_markdown_tables
from docstrange_spark.kernels.mdjson import parse_markdown


def collect_tables(doc: dict[str, Any]) -> list[dict[str, Any]]:
    """Depth-first table collection over the section hierarchy."""
    found: list[dict[str, Any]] = []

    def walk(sections: list[dict[str, Any]]) -> None:
        for sec in sections:
            found.extend(sec.get("content", {}).get("tables", []))
            if "subsections" in sec:
                walk(sec["subsections"])

    walk(doc.get("document", {}).get("sections", []))
    return found


def _write_table(writer: Any, table: dict[str, Any]) -> None:
    if table.get("headers"):
        writer.writerow(table["headers"])
    for row in table.get("rows", []):
        writer.writerow(row)


def markdown_to_csv(
    markdown_text: str,
    table_index: int = 0,
    include_all_tables: bool = True,
) -> str:
    """Render the document's tables as CSV ('' if none found)."""
    tables = collect_tables(parse_markdown(markdown_text))
    if not tables:
        tables = scrape_markdown_tables(markdown_text)
    if not tables:
        return ""
    buf = io.StringIO()
    writer = csv.writer(buf)
    if include_all_tables:
        for i, table in enumerate(tables):
            if i > 0:
                writer.writerow([])
                writer.writerow([f"=== Table {i + 1} ==="])
                writer.writerow([])
            _write_table(writer, table)
    else:
        if table_index >= len(tables):
            return ""
        _write_table(writer, tables[table_index])
    return buf.getvalue()
