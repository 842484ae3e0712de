"""Markdown -> structured JSON kernel tests.

Assertions ported from the reference's own suite
(/root/reference/tests/test_json_structure.py) plus differential tests:
our kernel must produce byte-identical structures to the reference's
MarkdownToJSONParser on every fixture markdown.
"""

import pandas as pd

from docstrange_spark import datagen
from docstrange_spark.kernels import assembly, mdjson

BASIC_MD = """# Main Title

This is the introduction paragraph.

## Section 1

Content of section 1.

### Subsection 1.1

Content of subsection.

## Section 2

Content of section 2.
"""

CONTENT_TYPES_MD = """# Content Types

A paragraph with **bold** text.

- item one
  - nested item
- item two

1. step one
2. step two

```python
def f():
    return 1
```

```javascript
let x = 2;
```

| Name | Value |
| --- | --- |
| a | 1 |
| b | 2 |

[link text](https://example.com)

![alt text](https://example.com/img.png)

> quoted line one
> quoted line two
"""


def test_basic_sections():
    doc = mdjson.parse_markdown(BASIC_MD)["document"]
    assert doc["metadata"]["total_sections"] == 4
    top = doc["sections"]
    assert len(top) == 1
    assert top[0]["title"] == "Main Title"
    assert top[0]["level"] == 1
    subs = top[0]["subsections"]
    assert [s["title"] for s in subs] == ["Section 1", "Section 2"]
    assert subs[0]["subsections"][0]["title"] == "Subsection 1.1"


def test_content_types():
    doc = mdjson.parse_markdown(CONTENT_TYPES_MD)["document"]
    meta = doc["metadata"]
    assert meta["has_lists"] and meta["has_code_blocks"]
    assert meta["has_tables"] and meta["has_images"]
    content = doc["sections"][0]["content"]
    assert len(content["lists"]) == 2
    assert content["lists"][0]["type"] == "unordered"
    assert content["lists"][0]["items"][1]["level"] == 1
    assert content["lists"][1]["type"] == "ordered"
    assert [c["language"] for c in content["code_blocks"]] == ["python", "javascript"]
    assert content["tables"][0]["headers"] == ["Name", "Value"]
    assert content["tables"][0]["rows"] == [["a", "1"], ["b", "2"]]
    assert content["images"][0]["alt_text"] == "alt text"
    assert content["blockquotes"] == ["quoted line one", "quoted line two"]


def test_no_headers_becomes_content_section():
    doc = mdjson.parse_markdown("Just a paragraph.\n\nAnother one.")["document"]
    assert doc["metadata"]["total_sections"] == 1
    assert doc["sections"][0]["title"] == "Content"
    assert doc["sections"][0]["level"] == 1


def test_empty_content():
    doc = mdjson.parse_markdown("   \n  \n")["document"]
    assert doc["sections"] == []
    assert doc["metadata"] == {"total_sections": 0}


def test_deep_hierarchy_nesting():
    md = (
        "# A\n\ntext\n\n## B\n\ntext\n\n### C\n\ntext\n\n#### D\n\ntext\n\n"
        "### C2\n\ntext\n\n## B2\n\ntext\n\n# A2\n\ntext\n"
    )
    doc = mdjson.parse_markdown(md)["document"]
    assert doc["metadata"]["total_sections"] == 7
    assert [s["title"] for s in doc["sections"]] == ["A", "A2"]
    a = doc["sections"][0]
    assert [s["title"] for s in a["subsections"]] == ["B", "B2"]
    b = a["subsections"][0]
    assert [s["title"] for s in b["subsections"]] == ["C", "C2"]
    assert b["subsections"][0]["subsections"][0]["title"] == "D"


def test_pre_header_content_dropped_when_headers_exist():
    # reference quirk (result.py:53-91): text before the first header is
    # not attached to any section
    doc = mdjson.parse_markdown("orphan text\n\n# Title\n\nbody\n")["document"]
    assert doc["metadata"]["total_sections"] == 1
    assert doc["sections"][0]["title"] == "Title"


def test_image_also_counts_as_link():
    # reference quirk: the link regex matches inside image syntax
    content = mdjson.parse_section_content("![alt](http://u/i.png)")
    assert "images" in content and "links" in content


def test_differential_vs_reference_parser(ref_result):
    parser = ref_result.MarkdownToJSONParser()
    fixtures = [BASIC_MD, CONTENT_TYPES_MD, "", "   ", "no headers at all"]
    docs = datagen.fixture_docs()
    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    out = assembly.assemble_batch(pdf["doc_id"], pdf["spans"])
    fixtures.extend(out["markdown"].tolist())
    for md in fixtures:
        assert mdjson.parse_markdown(md) == parser.parse(md), md[:80]
