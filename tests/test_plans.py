"""Plan-shape budgets for the engine's core pipelines — regressions in
shuffle count / pushdown / Python-stage count fail here."""

import pytest
from pyspark.sql import functions as F

from docstrange_spark import datagen, plans
from docstrange_spark.operators import dedup, extract, navigation, similarity


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_extract_has_one_shuffle_one_python_stage(spark):
    df = extract.extract(datagen.fixture_spans(spark), formats=("json",))
    assert plans.count_python_stages(df) == 1
    assert plans.count_exchanges(df) == 1


def test_exact_dedup_single_shuffle_pruned(docs):
    df = dedup.exact_groups(docs)
    plans.assert_max_shuffles(df, 1)  # partial agg map-side, one exchange
    plans.assert_scan_pruned(df, ["lang", "source", "n_chars"])


def test_minhash_single_shuffle(docs):
    df = dedup.minhash_signatures(docs)
    plans.assert_max_shuffles(df, 1)
    assert plans.count_python_stages(df) == 0  # pure codegen


def test_simhash_single_shuffle_no_python(docs):
    df = dedup.simhash16(docs)
    plans.assert_max_shuffles(df, 1)
    assert plans.count_python_stages(df) == 0


def test_knn_broadcasts_queries(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.knn_bruteforce(emb, [0, 1], top_k=5)
    plan = plans.executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plans.count_python_stages(df) == 0  # zip_with dot product is JVM-side


def test_sections_relational_stays_jvm(spark):
    md = spark.createDataFrame(
        [("d1", "# T\n\nbody\n\n## S\n\nmore")], "doc_id string, markdown string"
    )
    df = navigation.sections_relational(md)
    assert plans.count_python_stages(df) == 0
