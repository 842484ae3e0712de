"""Markdown -> HTML kernel: differential equality against the reference
converter body (result.py:356-686) over every fixture markdown plus the
reference's own feature-soup document (tests/test_html_generation.py)."""

import pandas as pd

from docstrange_spark import datagen
from docstrange_spark.kernels import assembly, mdhtml

FEATURE_MD = """# Main Heading

## Sub Heading

Some **bold** text and *italic* text and ***bold italic*** and ~~strike~~.

Inline `code span` here.

```python
def main():
    return 42
```

    indented code line
    second indented line

| Col1 | Col2 |
|------|------|
| **a** | b |
| c | `d` |

- item one
- item two
  - nested

1. first
2. second

> block quote line
> second quote line

---

[A link](https://example.com) and ![an image](https://example.com/x.png).

Final paragraph.
"""


def test_differential_vs_reference_converter(ref_result):
    conv = ref_result.MarkdownToHTMLConverter()
    docs = datagen.fixture_docs()
    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    out = assembly.assemble_batch(pdf["doc_id"], pdf["spans"])
    mds = [FEATURE_MD, "", "plain text"] + out["markdown"].tolist()
    for md in mds:
        assert mdhtml.markdown_to_html_body(md) == conv.extract(md), md[:80]


def test_structural_features():
    html = mdhtml.markdown_to_html_body(FEATURE_MD)
    for frag in (
        "<h1>Main Heading</h1>",
        "<h2>Sub Heading</h2>",
        "<strong>bold</strong>",
        "<em>italic</em>",
        "<strong><em>bold italic</em></strong>",
        "<del>strike</del>",
        "<code>code span</code>",
        '<pre><code class="language-python">',
        "<table>",
        "<th>Col1</th>",
        "<ul>",
        "<ol>",
        "<blockquote>",
        "<hr>",
        '<a href="https://example.com">A link</a>',
        # reference quirk (result.py:641-644): the link pass runs before
        # the image pass, so image syntax with non-empty alt renders as
        # "!<a ...>"; only empty-alt images reach the <img> branch
        '!<a href="https://example.com/x.png">an image</a>',
    ):
        assert frag in html, frag


def test_empty_alt_image_renders_img():
    html = mdhtml.markdown_to_html_body("![](https://e.com/i.png)")
    assert '<img src="https://e.com/i.png" alt="">' in html


def test_page_shell():
    page = mdhtml.markdown_to_html_page("# T\n\nbody")
    assert page.startswith("<!DOCTYPE html>")
    assert '<div class="content">' in page and "</html>" in page


def test_gpu_badge_matches_reference_format():
    """R6: the GPU banner must be byte-equal to the reference's
    gpu_indicator f-string and land right after the opening <body> tag
    (gpu_processor.py:60-78)."""
    from docstrange_spark.kernels import mdhtml

    # the reference's literal f-string (its observable output format)
    expected_indicator = f"""
        <div style="background: linear-gradient(135deg, #667eea 0%, #764ba2 100%); color: white; padding: 1rem; border-radius: 8px; margin-bottom: 2rem; text-align: center;">
            <strong>🚀 GPU Processed</strong> - Enhanced with {"nanonets"} OCR
        </div>
        """
    assert mdhtml.GPU_BADGE.format(provider="nanonets") == expected_indicator

    page = mdhtml.markdown_to_html_page("# hi")
    badged = mdhtml.add_gpu_badge(page)
    body_end = page.find(">", page.find("<body")) + 1
    assert badged == page[:body_end] + expected_indicator + page[body_end:]
    # no body tag -> unchanged (reference fallback)
    assert mdhtml.add_gpu_badge("<p>x</p>") == "<p>x</p>"
