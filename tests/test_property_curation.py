"""Property-based tests: the curation/retrieval operators against
brute-force Python reimplementations on hypothesis-generated corpora."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from docstrange_spark.operators import curation, retrieval, text_analysis

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "x"]


def _corpus(draw_docs):
    return [(i, " ".join(ws)) for i, ws in enumerate(draw_docs)]


docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_strategy)
def test_bm25_matches_python_reimplementation(spark, docs):
    rows = _corpus(docs)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["alpha", "the"]
    got = {r["doc_id"]: r["score"]
           for r in retrieval.bm25_search(df, terms, top_k=100).collect()}

    # brute-force BM25 (same formula, float math)
    toks = {i: t.split() if t else [] for i, t in rows}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    n_docs = len(rows)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    exp = {}
    for term in terms:
        dfreq = sum(1 for ws in toks.values() if term in ws)
        if dfreq == 0:
            continue
        idf = math.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        for i, ws in toks.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            c = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(ws) / avgdl))))
            exp[i] = exp.get(i, 0.0) + round(c * 1e6) / 1e6
    exp = {i: round(v, 6) for i, v in exp.items()}
    assert set(got) == set(exp)
    for i in got:
        assert abs(got[i] - exp[i]) < 2e-6, (i, got[i], exp[i])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=60)
)
def test_score_quantiles_error_bound_holds(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = {r["q"]: r["approx_value"]
           for r in curation.score_quantiles(df, "v", n_bins=50).collect()}
    vs = sorted(values)
    width = (vs[-1] - vs[0]) / 50.0
    for q in (0.25, 0.5, 0.75):
        target = vs[math.ceil(q * len(vs)) - 1]
        assert target - width - 1e-9 <= out[q] <= target + 1e-9, (q, out, vs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_strategy)
def test_fineweb_signals_match_python(spark, docs):
    rows = _corpus(docs)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_analysis.fineweb_filters(df).collect()}
    for i, t in rows:
        ws = [w for w in t.split() if w]
        assert got[i]["n_words"] == len(ws)
        if ws:
            mwl = round(sum(len(w) for w in ws) / len(ws), 6)
            assert abs(got[i]["mean_word_len"] - mwl) < 1e-9
        grams = [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
        if grams:
            dup = round((len(grams) - len(set(grams))) / len(grams), 6)
            assert abs(got[i]["dup_2gram_frac"] - dup) < 1e-9
        # keep verdict consistent with the reasons list
        assert got[i]["keep"] == (got[i]["reasons"] == "")
