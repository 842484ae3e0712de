"""Navigation kernel tests (N1-N7) — ported MCP-server semantics."""

from docstrange_spark.kernels import mdcsv, sections

MD = """# Title

intro line

## Part One

alpha beta
gamma

### Detail

deep content needle here

## Part Two

closing words
"""


def test_split_sections_spans_and_tokens():
    secs = sections.split_sections(MD)
    assert [s["title"] for s in secs] == ["Title", "Part One", "Detail", "Part Two"]
    assert [s["level"] for s in secs] == [1, 2, 3, 2]
    # a section's content includes its own header line
    assert secs[0]["content"].startswith("# Title")
    assert secs[0]["start_line"] == 0
    assert secs[1]["start_line"] == 4
    assert secs[1]["end_line"] == 8
    for s in secs:
        assert s["token_count"] == len(s["content"]) // 4


def test_headerless_doc():
    secs = sections.split_sections("plain body\nsecond line")
    assert len(secs) == 1
    assert secs[0]["title"] == "Document Content"
    assert secs[0]["level"] == 0
    assert secs[0]["start_line"] == 0 and secs[0]["end_line"] == 1


def test_hierarchy_tree():
    tree = sections.build_tree(sections.split_sections(MD))
    assert tree["total_sections"] == 4
    roots = tree["structure"]
    assert [n["title"] for n in roots] == ["Title"]
    kids = roots[0]["children"]
    assert [n["title"] for n in kids] == ["Part One", "Part Two"]
    assert [n["title"] for n in kids[0]["children"]] == ["Detail"]


def test_chunking_greedy():
    secs = [
        {"title": f"s{i}", "level": 1, "token_count": t}
        for i, t in enumerate([100, 200, 3800, 50, 4500])
    ]
    chunks = sections.chunk_sections(secs, max_tokens=4000)
    assert [(c["start_index"], c["end_index"]) for c in chunks] == [(0, 1), (2, 3), (4, 4)]
    assert chunks[0]["token_count"] == 300
    # an over-budget section still lands in its own chunk
    assert chunks[2]["token_count"] == 4500


def test_search_with_context_and_section():
    secs = sections.split_sections(MD)
    hits = sections.search_document(MD, secs, "NEEDLE", case_sensitive=False)
    assert len(hits) == 1
    hit = hits[0]
    assert hit["section"] == "Detail"
    assert hit["line_number"] == 12
    assert "deep content needle here" in hit["context"]
    assert hits and sections.search_document(MD, secs, "NEEDLE", True) == []


def test_summary_and_recommendation():
    assert sections.section_summary("x" * 300, 200) == "x" * 200 + "..."
    assert sections.section_summary("short", 200) == "short"
    assert sections.processing_recommendation(100) == "full_document"
    assert sections.processing_recommendation(10_000) == "full_document_or_chunked"
    assert sections.processing_recommendation(50_000) == "chunked_processing"
    assert sections.processing_recommendation(500_000) == "hierarchical_navigation"


def test_csv_rendition(ref_result):
    md = "# T\n\n| A | B |\n| --- | --- |\n| 1 | 2 |\n| 3 | 4 |\n"
    ours = mdcsv.markdown_to_csv(md)
    theirs = ref_result.ConversionResult(md).extract_csv(include_all_tables=True)
    assert ours == theirs
    assert ours.splitlines()[0] == "A,B"


def test_csv_multi_table_separator(ref_result):
    md = (
        "# T\n\n| A | B |\n| --- | --- |\n| 1 | 2 |\n\n"
        "## U\n\n| C | D |\n| --- | --- |\n| 5 | 6 |\n"
    )
    ours = mdcsv.markdown_to_csv(md)
    theirs = ref_result.ConversionResult(md).extract_csv(include_all_tables=True)
    assert ours == theirs
    assert "=== Table 2 ===" in ours


def test_csv_no_tables_is_empty():
    assert mdcsv.markdown_to_csv("# T\n\njust text") == ""
