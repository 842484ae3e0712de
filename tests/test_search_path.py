"""Production search over a materialized section table: result parity
with the self-contained search_relational, and a plan assertion that the
materialized path needs at most 2 exchanges (vs 4 + a range join)."""

import pytest

from docstrange_spark.kernels import sections as seckernel
from docstrange_spark.operators import extract, navigation, spanize

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    md = extract.extract(spanize.spanize(docs)).select("doc_id", "markdown")
    path = str(tmp_path_factory.mktemp("sections") / "sections.parquet")
    navigation.sections_relational(md).write.mode("overwrite").parquet(path)
    return md, spark.read.parquet(path)


def test_search_over_sections_matches_relational(spark, corpus):
    md, secs = corpus
    exact = {
        tuple(r)
        for r in navigation.search_relational(md, "query")
        .select("doc_id", "line_number", "line_content", "section", "context")
        .collect()
    }
    fast = {
        tuple(r)
        for r in navigation.search_over_sections(secs, "query").collect()
    }
    assert fast == exact and exact


def test_search_over_sections_plan_shape(spark, corpus):
    _, secs = corpus
    plan = (
        navigation.search_over_sections(secs, "query")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan  # section title travels with the row


def test_tiktoken_counter_optional():
    """The cl100k_base path activates only when tiktoken is importable;
    either way the approx fallback must restore cleanly."""
    try:
        import tiktoken  # noqa: F401

        available = True
    except ImportError:
        available = False
    active = seckernel.set_token_counter("tiktoken")
    assert active == available
    if available:
        assert seckernel.count_tokens("hello world, how are you?") > 0
    else:
        assert seckernel.count_tokens("12345678") == 2  # len // 4 fallback
    assert seckernel.set_token_counter("approx")
    assert seckernel.count_tokens("12345678") == 2
