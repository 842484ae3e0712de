"""Replicates the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB on row count, column names, and
order-insensitive values (sf0.001 here for speed; the driver runs
sf0.01)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = normalize(q(spark, SF_DIR).toPandas())
    exp = normalize(duck.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    if not got.equals(exp):
        diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
        sample = []
        for c in diff_cols[:2]:
            neq = got[c] != exp[c]
            sample.append(
                (c, got.loc[neq, c].head(3).tolist(), exp.loc[neq, c].head(3).tolist())
            )
        raise AssertionError(f"{name}: value mismatch in {diff_cols}; sample {sample}")


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"doc_id", "profile", "n_blocks", "markdown_hash"}


def test_driver_priority_names_resolve_and_window_holds():
    """Every _DRIVER_PRIORITY name must be a real query (typo guard),
    and the ~50-row driver window must contain the queries that need
    round-5 driver evidence: the never-checked set, the stale-since-r2
    set, and the advice-touched set."""
    qs = entry_mod.queries()
    missing = [n for n in entry_mod._DRIVER_PRIORITY if n not in qs]
    assert not missing, f"_DRIVER_PRIORITY names not in queries(): {missing}"
    window = list(qs)[:50]
    must = {
        "build_corpus", "bm25_search", "inverted_index", "term_search",
        "phrase_search", "proximity_search", "text_knn", "ann_recall",
        "classifier_eval", "materialize_batches", "lsh_eval",
        "renditions", "chunks", "hierarchy", "sessions",
        "lineitem_pricing", "top_customers", "events_by_user",
        "quality_classifier", "corpus_diff", "source_mix",
        "extract_media_md",
    }
    out = sorted(must - set(window))
    assert not out, f"queries that need driver evidence fell out: {out}"
