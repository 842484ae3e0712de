"""Navigation operators N1-N9 over markdown documents.

Two implementations, deliberately:

- a **relational** path (pure DataFrame ops: posexplode + windows +
  aggregates) — the idiomatic-Spark form used by the oracle-checked
  queries; whole plan stays JVM-side in codegen;
- a **kernel** path (mapInPandas over the sections kernel) for pipeline
  composition after extraction and for ops that are not expressible
  relationally (greedy chunking, recursive hierarchy).

Reference semantics: ``/root/reference/mcp_server_module/server.py``
(section split :94-145, hierarchy :147-182, chunking :184-220, search
:265-296, summary :298-305, recommendation :307-337, doc stats :650-673).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docstrange_spark.kernels.sections import (
    build_tree,
    chunk_sections,
    set_token_counter,
    split_sections,
)

HEADER_REGEX = r"^#{1,6}\s+.+$"

SECTION_SCHEMA = (
    "doc_id string, section_idx int, level int, title string, content string, "
    "start_line int, end_line int, token_count int"
)


# ---------------------------------------------------------------------------
# relational path (oracle-checkable)


def explode_lines(df: DataFrame, doc_col: str = "doc_id", text_col: str = "markdown") -> DataFrame:
    """(doc, line_no, line) — 0-based line numbers, the shared base of the
    relational navigation ops. Column pruning keeps the scan minimal."""
    return df.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )


def sections_relational(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "markdown"
) -> DataFrame:
    """Section table via posexplode + running header count + group-agg.

    Matches the kernel's MCP semantics: a section spans its header line
    up to the line before the next header; pre-first-header lines belong
    to no section; a header-less document is one level-0
    "Document Content" section covering every line.
    """
    lines = explode_lines(df, doc_col, text_col)
    marked = lines.withColumn(
        "is_header", F.col("line").rlike(HEADER_REGEX).cast("int")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = marked.withColumn("sec_seq", F.sum("is_header").over(w))
    # deterministic line order inside the group: sort the collected structs
    seq2 = seq.groupBy("doc_id", "sec_seq").agg(
        F.max("is_header").alias("has_header"),
        F.min(F.when(F.col("is_header") == 1, F.col("line"))).alias("header_line"),
        F.min("line_no").alias("start_line"),
        F.max("line_no").alias("end_line"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda x: x["line"],
            ),
        ).alias("content"),
    )
    # header count per doc as a window over the (already tiny) grouped
    # rows — one lineage, no second full-lines aggregation + join
    secs = seq2.withColumn(
        "n_headers", F.sum("has_header").over(Window.partitionBy("doc_id"))
    )

    # single-pass section emit — no union (a union would duplicate the
    # whole upstream lineage in the plan). A header-less document is by
    # construction ONE group (sec_seq = 0 everywhere), which is exactly
    # its level-0 "Document Content" section; pre-first-header groups in
    # header-ful docs are dropped; an exactly-empty document yields no
    # section at all (kernel: ``if not sections and markdown_content``).
    has_hdrs = F.col("n_headers") > 0
    return secs.where(
        (has_hdrs & (F.col("has_header") == 1))
        | (~has_hdrs & (F.length("content") > 0))
    ).select(
        "doc_id",
        F.when(has_hdrs, F.col("sec_seq") - 1).otherwise(0).cast("int").alias("section_idx"),
        F.when(
            has_hdrs,
            F.length(F.regexp_extract("header_line", r"^(#{1,6})\s", 1)),
        ).otherwise(0).cast("int").alias("level"),
        F.when(
            has_hdrs,
            F.trim(F.regexp_extract("header_line", r"^#{1,6}\s+(.+)$", 1)),
        ).otherwise("Document Content").alias("title"),
        "content",
        F.col("start_line").cast("int"),
        F.col("end_line").cast("int"),
        F.floor(F.length("content") / 4).cast("int").alias("token_count"),
    )


def search_relational(
    df: DataFrame,
    query: str,
    doc_col: str = "doc_id",
    text_col: str = "markdown",
    case_sensitive: bool = False,
) -> DataFrame:
    """Substring search with ±2-line window context and enclosing-section
    attribution (N5). The section join is a broadcast range join on line
    spans — the only join in the reference's whole surface."""
    lines = explode_lines(df, doc_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    ctx = lines.withColumn(
        "context",
        F.concat_ws(
            "\n",
            F.collect_list("line").over(w.rowsBetween(-2, 2)),
        ),
    )
    needle = query if case_sensitive else query.lower()
    hay = F.col("line") if case_sensitive else F.lower(F.col("line"))
    hits = ctx.where(F.instr(hay, needle) > 0)
    secs = sections_relational(df, doc_col, text_col).select(
        "doc_id",
        F.col("title").alias("section"),
        F.col("start_line").alias("s"),
        F.col("end_line").alias("e"),
    )
    joined = hits.join(
        secs,
        (hits["doc_id"] == secs["doc_id"])
        & (F.col("line_no") >= F.col("s"))
        & (F.col("line_no") <= F.col("e")),
        "left",
    )
    return joined.select(
        hits["doc_id"],
        (F.col("line_no") + 1).alias("line_number"),
        F.col("line").alias("line_content"),
        F.coalesce(F.col("section"), F.lit("Unknown Section")).alias("section"),
        "context",
    )


def search_over_sections(
    sections: DataFrame,
    query: str,
    case_sensitive: bool = False,
) -> DataFrame:
    """N5 production path: search a PRE-MATERIALIZED section table.

    ``search_relational`` is self-contained (re-derives sections from
    markdown: 4 exchanges + a range join); at corpus scale the section
    table is materialized once and queried many times, so this variant
    reconstructs lines from section content (line_no = start_line +
    position), carries the enclosing title with the row (NO join), and
    needs a single exchange (the per-doc context window). Context still
    crosses section boundaries because sections partition the document's
    lines contiguously. Covers sectioned content — identical to
    ``search_relational`` for any document whose first line is a header
    (pre-first-header lines belong to no section in MCP semantics).
    """
    lines = sections.select(
        "doc_id",
        F.col("title").alias("section"),
        "start_line",
        F.posexplode(F.split("content", "\n")).alias("rel", "line"),
    ).withColumn("line_no", F.col("start_line") + F.col("rel"))
    w = Window.partitionBy("doc_id").orderBy("line_no")
    ctx = lines.withColumn(
        "context",
        F.concat_ws("\n", F.collect_list("line").over(w.rowsBetween(-2, 2))),
    )
    needle = query if case_sensitive else query.lower()
    hay = F.col("line") if case_sensitive else F.lower(F.col("line"))
    return ctx.where(F.instr(hay, needle) > 0).select(
        "doc_id",
        (F.col("line_no") + 1).alias("line_number"),
        F.col("line").alias("line_content"),
        "section",
        "context",
    )


def doc_info_relational(sections: DataFrame) -> DataFrame:
    """N9: per-document token distribution over the section table."""
    return sections.groupBy("doc_id").agg(
        F.count("*").alias("n_sections"),
        F.min("token_count").alias("min_tokens"),
        F.max("token_count").alias("max_tokens"),
        F.avg("token_count").alias("avg_tokens"),
        F.sum("token_count").alias("total_tokens"),
    )


def recommendation_col(total_tokens_col: str = "total_tokens"):
    """N7: context-size bucket as a column expression."""
    c = F.col(total_tokens_col)
    return (
        F.when(c < 8000, F.lit("full_document"))
        .when(c < 32000, F.lit("full_document_or_chunked"))
        .when(c < 128000, F.lit("chunked_processing"))
        .otherwise(F.lit("hierarchical_navigation"))
    )


def section_summary_col(content_col: str = "content", max_length: int = 200):
    """N6: truncate-with-ellipsis as a column expression."""
    c = F.trim(F.col(content_col))
    return F.when(F.length(c) <= max_length, c).otherwise(
        F.concat(F.substring(c, 1, max_length), F.lit("..."))
    )


# ---------------------------------------------------------------------------
# kernel path


def _sections_kernel(batches: Iterator[pd.DataFrame], token_mode: str = "approx") -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "section_idx", "level", "title", "content",
        "start_line", "end_line", "token_count",
    ]
    set_token_counter(token_mode)  # executes ON the worker
    for pdf in batches:
        rows = []
        for doc_id, md in zip(pdf["doc_id"], pdf["markdown"]):
            for i, s in enumerate(split_sections(md or "")):
                rows.append(
                    (doc_id, i, s["level"], s["title"], s["content"],
                     s["start_line"], s["end_line"], s["token_count"])
                )
        yield pd.DataFrame(rows, columns=cols)


def sections_kernel(df: DataFrame, token_mode: str = "approx") -> DataFrame:
    """Section table via the N1 kernel (exact MCP walker). ``token_mode``
    selects the token counter INSIDE the Python workers ('approx' golden
    default, 'tiktoken' when importable on executors)."""
    return df.select("doc_id", "markdown").mapInPandas(
        lambda b: _sections_kernel(b, token_mode), schema=SECTION_SCHEMA
    )


CHUNK_SCHEMA = (
    "doc_id string, chunk_idx int, start_index int, end_index int, "
    "token_count int, titles array<string>"
)


def _chunks_kernel(max_tokens: int, token_mode: str = "approx"):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        set_token_counter(token_mode)  # executes ON the worker
        for pdf in batches:
            rows = []
            for doc_id, md in zip(pdf["doc_id"], pdf["markdown"]):
                secs = split_sections(md or "")
                for i, ch in enumerate(chunk_sections(secs, max_tokens)):
                    rows.append(
                        (doc_id, i, ch["start_index"], ch["end_index"],
                         ch["token_count"], [s["title"] for s in ch["sections"]])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "chunk_idx", "start_index", "end_index",
                         "token_count", "titles"],
            )

    return run


def chunks_kernel(
    df: DataFrame, max_tokens: int = 4000, token_mode: str = "approx"
) -> DataFrame:
    """N4: greedy token-bounded chunk packing (not expressible as a
    window — the accumulator resets on overflow)."""
    return df.select("doc_id", "markdown").mapInPandas(
        _chunks_kernel(max_tokens, token_mode), schema=CHUNK_SCHEMA
    )


def _hierarchy_kernel(batches: Iterator[pd.DataFrame], token_mode: str = "approx") -> Iterator[pd.DataFrame]:
    set_token_counter(token_mode)  # executes ON the worker
    for pdf in batches:
        out = []
        for doc_id, md in zip(pdf["doc_id"], pdf["markdown"]):
            tree = build_tree(split_sections(md or ""))
            out.append((doc_id, json.dumps(tree, ensure_ascii=False, sort_keys=True)))
        yield pd.DataFrame(out, columns=["doc_id", "hierarchy"])


def hierarchy_kernel(df: DataFrame, token_mode: str = "approx") -> DataFrame:
    """N3: recursive hierarchy tree as a JSON column."""
    return df.select("doc_id", "markdown").mapInPandas(
        lambda b: _hierarchy_kernel(b, token_mode),
        schema="doc_id string, hierarchy string",
    )
