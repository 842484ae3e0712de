"""Golden span-sequence tests for the assembly kernel — the north-rule
invariant: per-document block-stream equality on (kind, text, media_ref,
order) plus exact markdown."""

import pandas as pd
import pytest

from docstrange_spark import datagen
from docstrange_spark.kernels import assembly


def run_one(cls: str):
    docs = [d for d in datagen.fixture_docs(include_mega=True) if d[0].startswith(cls)]
    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    out = assembly.assemble_batch(pdf["doc_id"], pdf["spans"])
    return out.iloc[0]


def seq(row):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["out_spans"]]


def test_md_structure_golden():
    row = run_one("md_structure")
    assert seq(row) == [
        ("heading", "# Main Title", "h1", 0),
        ("paragraph", "This is the introduction paragraph.", "", 1),
        ("heading", "## Section 1", "h2", 2),
        ("paragraph", "Content of section one.", "", 3),
        ("heading", "### Subsection 1.1", "h3", 4),
        ("paragraph", "Subsection content here.", "", 5),
        ("heading", "## Section 2", "h2", 6),
        ("paragraph", "Content of section two.", "", 7),
    ]
    assert row["markdown"].startswith("# Main Title\n\nThis is the introduction")


def test_empty_doc_golden():
    row = run_one("empty_doc")
    assert row["markdown"] == ""
    assert row["out_spans"] == []


def test_business_report_golden():
    row = run_one("business_report")
    kinds = [s[0] for s in seq(row)]
    assert kinds == [
        "heading", "paragraph", "heading", "list", "table", "heading", "list",
    ]
    table = row["out_spans"][4]
    assert table["text"].splitlines()[0] == "| Metric | Q3 | Q4 | Growth |"
    assert table["text"].splitlines()[1] == "| --- | --- | --- | --- |"
    assert len(table["text"].splitlines()) == 5
    # ordered list rendering
    assert row["out_spans"][6]["text"] == "1. Expand sales team\n2. Invest in onboarding"


def test_html_page_boilerplate_golden():
    row = run_one("html_page")
    assert seq(row) == [
        ("heading", "# Welcome Page", "h1", 0),
        ("paragraph", "The main article text.", "", 1),
        ("paragraph", "A second content paragraph.", "", 2),
        ("link", "[Read more](https://example.com/more)", "https://example.com/more", 3),
    ]
    md = row["markdown"]
    # boilerplate must be gone: nav/footer/script/style
    for gone in ("Home", "About", "Copyright", "var x", "color: red"):
        assert gone not in md
    assert md.startswith("# Welcome Page")


def test_docx_like_golden():
    row = run_one("docx_like")
    kinds = [s[0] for s in seq(row)]
    assert kinds == [
        "heading", "paragraph", "heading", "paragraph",
        "notice", "notice", "table", "paragraph",
    ]
    # level 7 clamps to ######
    assert row["out_spans"][2]["text"] == "###### Too Deep Heading"
    assert "merged cells" in row["out_spans"][4]["text"]
    assert "truncated to first 20 rows out of 25" in row["out_spans"][5]["text"]
    # header + separator + 19 body rows
    assert len(row["out_spans"][6]["text"].splitlines()) == 21


def test_pptx_slides_golden():
    row = run_one("pptx_like")
    s = seq(row)
    assert s[0] == ("page_header", "## Slide 1", "slide", 0)
    assert s[3] == ("page_header", "## Slide 2", "slide", 3)
    assert row["out_spans"][1]["text"] == "Slide 1 headline content."


def test_pdf_pages_golden():
    row = run_one("pdf_pages")
    assert seq(row) == [
        ("page_header", "## Page 1", "page", 0),
        ("heading", "# FIRST PAGE TITLE.", "h1", 1),
        ("paragraph", "Body text starts here and continues on the same line.", "", 2),
        ("list", "- 1. first numbered finding", "", 3),
        ("page_header", "## Page 2", "page", 4),
        # offsets 30/31 arrive out of order; the reading-order sort fixes it
        ("paragraph", "Second page opens with continued paragraph on page two.", "", 5),
        ("table_row", "| colA | colB | colC |", "", 6),
    ]


def test_ocr_noisy_golden():
    row = run_one("ocr_noisy")
    assert seq(row) == [
        # | -> I, 0 -> o, 1 -> l, whitespace collapse, symbol strip
        ("paragraph", "HeIIo worId with odd spacing", "", 0),
        ("paragraph", "Date: 2o24!", "", 1),
    ]


def test_classify_edge_golden():
    row = run_one("classify_edge")
    got = [(s["kind"], s["text"]) for s in row["out_spans"]]
    assert got == [
        ("list", "- 1. item"),
        ("list", "- • bullet"),
        ("list", "- - dash"),
        ("list", "- a. lettered"),
        ("table_row", "| A | B | C |"),
        ("table_row", "| w1 | w2 | w3 | w4 |"),
        ("heading", "# SHORT CAPS."),
        ("paragraph", "six words that are not headings"),
    ]


def test_mega_doc_assembles():
    row = run_one("mega_doc")
    assert row["n_blocks"] == 2000
    assert row["profile"] == "layout"


def test_determinism_across_batch_splits():
    """Row content must not depend on how documents are batched —
    assembling docs one-per-batch equals assembling them all at once."""
    docs = datagen.fixture_docs()
    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    whole = assembly.assemble_batch(pdf["doc_id"], pdf["spans"])
    for i in range(len(pdf)):
        single = assembly.assemble_batch(
            pdf["doc_id"].iloc[i : i + 1], pdf["spans"].iloc[i : i + 1]
        )
        assert single.iloc[0]["markdown"] == whole.iloc[i]["markdown"]
        assert single.iloc[0]["out_spans"] == whole.iloc[i]["out_spans"]
