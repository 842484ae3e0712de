"""Property-based differential testing: on arbitrary generated markdown,
our rendition kernels must agree byte-for-byte with the reference's own
parsers (MarkdownToJSONParser / MarkdownToHTMLConverter / extract_csv).

This is the strongest parity evidence we can produce without ML paths:
the reference implementation itself is the oracle, and hypothesis
explores the input space far beyond the handcrafted fixtures.
"""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from docstrange_spark.kernels import mdcsv, mdhtml, mdjson

# building blocks that exercise every parser branch
WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1,
    max_size=8,
)
WORDS = st.lists(WORD, min_size=1, max_size=6).map(" ".join)

LINE = st.one_of(
    WORDS,
    st.builds(lambda lv, t: "#" * lv + " " + t, st.integers(1, 6), WORDS),
    st.builds(lambda t: "- " + t, WORDS),
    st.builds(lambda n, t: f"{n}. {t}", st.integers(1, 20), WORDS),
    st.builds(lambda t: "> " + t, WORDS),
    st.builds(lambda t: "**" + t + "**", WORDS),
    st.builds(lambda t: "*" + t + "*", WORDS),
    st.builds(lambda t: "`" + t + "`", WORDS),
    st.builds(lambda a, b: f"[{a}]({b})", WORD, WORD),
    st.builds(lambda a, b: f"![{a}]({b})", WORD, WORD),
    st.builds(lambda a, b: f"| {a} | {b} |", WORD, WORD),
    st.just("| --- | --- |"),
    st.just("---"),
    st.just("```python"),
    st.just("```"),
    st.just(""),
    st.just("    indented code"),
    st.builds(lambda t: "  " + t, WORDS),  # indented continuation
)

MARKDOWN = st.lists(LINE, min_size=0, max_size=30).map("\n".join)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(MARKDOWN)
def test_json_parser_matches_reference(ref_result, md):
    assert mdjson.parse_markdown(md) == ref_result.MarkdownToJSONParser().parse(md)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(MARKDOWN)
def test_html_converter_matches_reference(ref_result, md):
    assert mdhtml.markdown_to_html_body(md) == ref_result.MarkdownToHTMLConverter().extract(md)


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(MARKDOWN)
def test_csv_rendition_matches_reference(ref_result, md):
    theirs_obj = ref_result.ConversionResult(md)
    try:
        theirs = theirs_obj.extract_csv(include_all_tables=True)
    except ValueError:
        theirs = ""  # reference raises on no tables; we return ''
    assert mdcsv.markdown_to_csv(md) == theirs


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(MARKDOWN)
def test_full_html_page_matches_reference(ref_result, md):
    """R3 full-page parity: the default shell reproduces the reference's
    entire styled extract_html() output byte-for-byte (result.py:712-938),
    not just the converted body."""
    assert (
        mdhtml.markdown_to_html_page(md)
        == ref_result.ConversionResult(md).extract_html()
    )
