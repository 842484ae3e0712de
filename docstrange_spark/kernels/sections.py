"""Document-navigation kernels (N1-N7): section split, hierarchy,
token counting, chunking, search, summaries, recommendations.

Behavior-compatible with the reference MCP server
(``/root/reference/mcp_server_module/server.py:80-337``). Note the MCP
section split differs from the rendition parser's: a section's content
*includes its own header line*, and a headerless document becomes a
level-0 "Document Content" section (``server.py:94-145``).

Token counting defaults to the reference's deterministic fallback
``len(text) // 4`` (``server.py:86-87``) so goldens and oracles stay
engine-portable; the reference's tiktoken ``cl100k_base`` path
(``server.py:74-87``) is available via ``set_token_counter("tiktoken")``
when the optional dependency is importable — the encoder is created
once per process and batch-encodes, exactly the executor-singleton
pattern the reference uses for its lazily-initialized encoder.
"""

from __future__ import annotations

import re
from typing import Any

HEADER_RE = re.compile(r"^(#{1,6})\s+(.+)$")

TOKENS_SMALL = 8000
TOKENS_MEDIUM = 32000
TOKENS_LARGE = 128000


def _approx_count(text: str) -> int:
    return len(text) // 4


_counter = _approx_count


def set_token_counter(mode: str = "approx") -> bool:
    """Select the token counter: 'approx' (default, golden semantics) or
    'tiktoken' (cl100k_base, reference server.py:74-87). Returns True if
    the requested mode is active — 'tiktoken' falls back to approx when
    the library is missing, mirroring the reference's try/except.

    This mutates a PROCESS-local global: on a cluster, call it inside
    the executor (the navigation kernels take a ``token_mode`` argument
    and do exactly that at batch start); calling it on the driver alone
    does not reach Python workers."""
    global _counter
    if mode == "tiktoken":
        try:
            import tiktoken

            enc = tiktoken.get_encoding("cl100k_base")
            _counter = lambda text: len(enc.encode(text))  # noqa: E731
            return True
        except Exception:
            _counter = _approx_count
            return False
    _counter = _approx_count
    return True


def count_tokens(text: str) -> int:
    return _counter(text)


def split_sections(markdown_content: str) -> list[dict[str, Any]]:
    """Split markdown into sections keyed by ATX headers.

    Returns dicts ``(level, title, content, start_line, end_line,
    token_count)`` with 0-based line spans; content spans include the
    header line itself (reference ``server.py:94-145``).
    """
    lines = markdown_content.split("\n")
    marks: list[tuple[int, int, str]] = []  # (line_no, level, title)
    for i, line in enumerate(lines):
        m = HEADER_RE.match(line)
        if m:
            marks.append((i, len(m.group(1)), m.group(2).strip()))

    sections: list[dict[str, Any]] = []
    for k, (start, level, title) in enumerate(marks):
        end = (marks[k + 1][0] - 1) if k + 1 < len(marks) else len(lines) - 1
        content = "\n".join(lines[start : end + 1])
        sections.append(
            {
                "level": level,
                "title": title,
                "content": content,
                "start_line": start,
                "end_line": end,
                "token_count": count_tokens(content),
            }
        )
    if not sections and markdown_content:
        sections.append(
            {
                "level": 0,
                "title": "Document Content",
                "content": markdown_content,
                "start_line": 0,
                "end_line": len(lines) - 1,
                "token_count": count_tokens(markdown_content),
            }
        )
    return sections


def build_tree(sections: list[dict[str, Any]]) -> dict[str, Any]:
    """Hierarchical structure over the flat section list
    (reference ``server.py:147-182``)."""

    def _tree(secs: list[dict[str, Any]], parent_level: int) -> list[dict[str, Any]]:
        nodes = []
        i = 0
        while i < len(secs):
            sec = secs[i]
            if parent_level > 0 and sec["level"] <= parent_level:
                break
            node = {
                "title": sec["title"],
                "level": sec["level"],
                "token_count": sec["token_count"],
                "start_line": sec["start_line"],
                "end_line": sec["end_line"],
                "children": [],
            }
            j = i + 1
            if j < len(secs) and secs[j]["level"] > sec["level"]:
                kids = []
                while j < len(secs) and secs[j]["level"] > sec["level"]:
                    kids.append(secs[j])
                    j += 1
                node["children"] = _tree(kids, sec["level"])
            nodes.append(node)
            i = j
        return nodes

    return {"structure": _tree(sections, 0), "total_sections": len(sections)}


def chunk_sections(
    sections: list[dict[str, Any]], max_tokens: int = 4000
) -> list[dict[str, Any]]:
    """Greedy packing of consecutive sections into token-bounded chunks
    (reference ``server.py:184-220``). An over-budget single section
    still occupies its own chunk."""
    chunks: list[dict[str, Any]] = []
    cur: dict[str, Any] = {"sections": [], "token_count": 0, "start_index": 0, "end_index": 0}
    for i, sec in enumerate(sections):
        entry = {"title": sec["title"], "level": sec["level"], "tokens": sec["token_count"]}
        if cur["token_count"] + sec["token_count"] <= max_tokens:
            cur["sections"].append(entry)
            cur["token_count"] += sec["token_count"]
            cur["end_index"] = i
        else:
            if cur["sections"]:
                chunks.append(cur)
            cur = {
                "sections": [entry],
                "token_count": sec["token_count"],
                "start_index": i,
                "end_index": i,
            }
    if cur["sections"]:
        chunks.append(cur)
    return chunks


def search_document(
    markdown_content: str,
    sections: list[dict[str, Any]],
    query: str,
    case_sensitive: bool = False,
) -> list[dict[str, Any]]:
    """Substring line scan with enclosing-section attribution and ±2-line
    context (reference ``server.py:265-296``). Line numbers are 1-based."""
    lines = markdown_content.split("\n")
    needle = query if case_sensitive else query.lower()
    hits = []
    for i, line in enumerate(lines):
        hay = line if case_sensitive else line.lower()
        if needle in hay:
            title = "Unknown Section"
            for sec in sections:
                if sec["start_line"] <= i <= sec["end_line"]:
                    title = sec["title"]
                    break
            hits.append(
                {
                    "line_number": i + 1,
                    "line_content": line,
                    "section": title,
                    "context": "\n".join(lines[max(0, i - 2) : min(len(lines), i + 3)]),
                }
            )
    return hits


def section_summary(content: str, max_length: int = 200) -> str:
    """Truncate-with-ellipsis summary (reference ``server.py:298-305``)."""
    content = content.strip()
    return content if len(content) <= max_length else content[:max_length] + "..."


def processing_recommendation(total_tokens: int) -> str:
    """Context-size bucket (reference ``server.py:307-337``); returns the
    ``approach`` label, the deterministic part of the recommendation."""
    if total_tokens < TOKENS_SMALL:
        return "full_document"
    if total_tokens < TOKENS_MEDIUM:
        return "full_document_or_chunked"
    if total_tokens < TOKENS_LARGE:
        return "chunked_processing"
    return "hierarchical_navigation"
