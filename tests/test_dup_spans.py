"""Duplicate n-gram span dedup (exact-substring family) + SemDeDup:
hand-built corpora with known duplicated spans, pinning merge/scrub
semantics the sf parity runs can't isolate (overlap merge, within-doc
repeats, full coverage, empty/null text, the chain-capped cell path)."""

import pytest
from pyspark.sql import functions as F

from docstrange_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (1, "a b c d e f"),          # shares "a b c" with doc 2
        (2, "x y a b c z"),
        (3, "u v w"),                # single unique gram
        (4, "p p p p p"),            # within-doc repeated gram
        (5, ""),                     # empty
        (6, None),                   # null text
        (7, "m n o q m n o"),        # two disjoint copies of "m n o"
        (8, "s t u v s t u v"),      # overlapping dup spans cover all
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_dup_ngram_stats_hand_corpus(span_docs):
    got = _by_id(dedup.dup_ngram_stats(span_docs, n=3))
    assert got[1] == dict(doc_id=1, n_tokens=6, n_grams=4, n_dup_grams=1,
                          dup_tokens=3, dup_fraction=0.5)
    assert got[2]["dup_tokens"] == 3 and got[2]["dup_fraction"] == 0.5
    assert got[3] == dict(doc_id=3, n_tokens=3, n_grams=1, n_dup_grams=0,
                          dup_tokens=0, dup_fraction=0.0)
    # within-doc repeats count toward min_count, and the three
    # overlapping marked spans merge to the whole 5-token doc
    assert got[4] == dict(doc_id=4, n_tokens=5, n_grams=3, n_dup_grams=3,
                          dup_tokens=5, dup_fraction=1.0)
    assert got[5] == dict(doc_id=5, n_tokens=0, n_grams=0, n_dup_grams=0,
                          dup_tokens=0, dup_fraction=0.0)
    assert got[6]["n_tokens"] == 0 and got[6]["dup_fraction"] == 0.0
    # disjoint copies: starts {0, 4}, coverage 6 of 7
    assert got[7]["dup_tokens"] == 6
    assert got[7]["dup_fraction"] == round(6 / 7, 6)
    # overlapping dup spans ([0,3)+[1,4), [4,7)+[5,8)) merge to full
    assert got[8]["dup_tokens"] == 8 and got[8]["dup_fraction"] == 1.0


def test_dup_span_scrub_hand_corpus(span_docs):
    got = _by_id(dedup.dup_span_scrub(span_docs, n=3))
    assert got[1]["clean_text"] == "d e f"
    assert got[2]["clean_text"] == "x y z"
    assert got[3]["clean_text"] == "u v w"
    assert got[4] == dict(doc_id=4, clean_text="", n_tokens=5,
                          kept_tokens=0, removed_tokens=5)
    assert got[5]["clean_text"] == "" and got[5]["removed_tokens"] == 0
    assert got[7]["clean_text"] == "q"
    assert got[8]["clean_text"] == ""
    # conservation: kept + removed == n_tokens everywhere
    assert all(
        r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"]
        for r in got.values()
    )


def test_dup_ngram_min_count_threshold(spark):
    # min_count=3: a gram appearing twice no longer marks anything
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    got = _by_id(dedup.dup_ngram_stats(docs, n=3, min_count=3))
    assert got[1]["n_dup_grams"] == 0 and got[2]["n_dup_grams"] == 0


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_semantic_dedup_keeps_smallest_id(spark):
    v = [0.5, -1.0, 2.0, 0.25]
    other = [-2.0, 0.1, -0.5, 1.0]
    emb = _emb_df(spark, [(10, v), (11, v), (12, other)])
    got = {r["vec_id"]: r for r in
           similarity.semantic_dedup(emb, tau=0.99, n_cells=4).collect()}
    assert got[10]["keep"] is True
    assert got[11]["keep"] is False        # identical to a lower id
    assert got[12]["keep"] is True
    assert got[10]["cell"] == got[11]["cell"]  # identical vecs, same cell


def test_semantic_dedup_chain_capped_cell(spark):
    # four identical vectors with max_cell_size=2: the oversized cell
    # switches to lag-chain pairing; adjacent pairs still carry the
    # duplicate relation, so every id but the smallest is dropped
    v = [1.0, 0.0, -1.0, 0.5]
    emb = _emb_df(spark, [(i, v) for i in range(4)])
    got = similarity.semantic_dedup(emb, tau=0.99, n_cells=4,
                                    max_cell_size=2)
    kept = sorted(r["vec_id"] for r in got.collect() if r["keep"])
    assert kept == [0]


def test_bpe_pair_counts_hand_corpus(spark):
    from docstrange_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [(1, "banana band"), (2, "ana")], ["doc_id", "text"]
    )
    rows = text_analysis.bpe_pair_counts(docs, top_k=10).collect()
    got = [(r.left_sym, r.right_sym, r.pair_count, r.rank) for r in rows]
    # pieces: "banana", " band", "ana"; weighted char bigrams:
    # (a,n)=4, (n,a)=3, (b,a)=2, then (' ',b)=1 < (n,d)=1 binary order
    assert got == [
        ("a", "n", 4, 1),
        ("n", "a", 3, 2),
        ("b", "a", 2, 3),
        (" ", "b", 1, 4),
        ("n", "d", 1, 5),
    ]
