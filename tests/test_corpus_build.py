"""build_corpus: the materialized, resumable end-to-end corpus job.
Composite-level resume semantics: a kill mid-chain resumes from the
last committed stage and the final output is identical to an
uninterrupted run."""

import json
import os

import pytest

from docstrange_spark.operators import corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_path():
    return f"{SF}/documents.parquet"


def _rows(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_build_corpus_matches_plan_and_is_idempotent(spark, tmp_path, docs_path):
    out = str(tmp_path / "one_shot")
    summary = corpus.build_corpus(spark, docs_path, out)
    assert summary["stages"] == {s: "ran" for s in corpus.STAGES}
    got = _rows(spark, summary["final"])
    want = sorted(
        map(tuple, corpus.corpus_plan(spark.read.parquet(docs_path)).collect())
    )
    assert got == want and len(got) > 20
    # rerun: every stage skipped, output unchanged
    again = corpus.build_corpus(spark, docs_path, out)
    assert again["stages"] == {s: "skipped" for s in corpus.STAGES}
    assert _rows(spark, again["final"]) == got
    # lineage: one manifest record per stage per actual execution
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert [r["stage"] for r in recs] == list(corpus.STAGES)
    assert all(r["snapshot_id"] == summary["snapshot_id"] for r in recs)


def test_build_corpus_resumes_after_kill(spark, tmp_path, docs_path):
    """Kill after the dedup stage commits; the rerun must skip
    extract/signals/dedup, run only select/pack, and produce output
    identical to an uninterrupted run."""
    out = str(tmp_path / "killed")
    partial = corpus.build_corpus(spark, docs_path, out, stop_after="dedup")
    assert partial["stages"] == {"extract": "ran", "signals": "ran", "dedup": "ran"}
    assert partial["final"] is None  # no pack output yet
    assert not os.path.exists(os.path.join(out, "pack"))
    # a torn stage marker (kill mid-commit) must read as NOT committed,
    # not crash the resume
    with open(os.path.join(out, "_STAGE_signals.json"), "w") as f:
        f.write('{"snapshot_id": "trunc')
    resumed_after_torn = corpus.build_corpus(
        spark, docs_path, out, stop_after="signals"
    )
    assert resumed_after_torn["stages"] == {
        "extract": "skipped", "signals": "ran",
    }
    resumed = corpus.build_corpus(spark, docs_path, out)
    assert resumed["stages"] == {
        "extract": "skipped",
        "signals": "skipped",
        "dedup": "skipped",
        "select": "ran",
        "pack": "ran",
    }
    fresh = str(tmp_path / "fresh")
    corpus.build_corpus(spark, docs_path, fresh)
    assert _rows(spark, resumed["final"]) == _rows(
        spark, os.path.join(fresh, "pack")
    )


def test_build_corpus_config_change_invalidates(spark, tmp_path, docs_path):
    """A changed config fingerprint must never silently reuse stale
    stage output — every stage reruns."""
    out = str(tmp_path / "cfg")
    corpus.build_corpus(spark, docs_path, out, stop_after="signals")
    redo = corpus.build_corpus(spark, docs_path, out, budget=256)
    assert redo["stages"]["extract"] == "ran"  # fingerprint mismatch
    assert redo["stages"]["pack"] == "ran"
    # the packed output reflects the new budget: more batches per shard
    import pyspark.sql.functions as F

    packed = spark.read.parquet(redo["final"])
    assert packed.where(F.col("batch_id") > 0).count() > 0


def test_build_corpus_rejects_unknown_stage(spark, tmp_path, docs_path):
    with pytest.raises(ValueError):
        corpus.build_corpus(spark, docs_path, str(tmp_path / "x"), stop_after="nope")


def test_optional_clean_stage(spark, tmp_path, docs_path):
    """scrub_pii on a PII-free corpus is the identity on the final
    output; paragraph-dropping removes the repeated '## Part N'
    boilerplate headers, so token counts can only shrink; the
    materialized job gains a committed 'clean' stage that resumes."""
    from docstrange_spark.operators import corpus

    docs = spark.read.parquet(docs_path)
    base = sorted(map(tuple, corpus.corpus_plan(docs).collect()))
    scrubbed = sorted(map(tuple, corpus.corpus_plan(docs, scrub_pii=True).collect()))
    assert scrubbed == base  # synthetic corpus carries no PII

    cleaned = {
        r["doc_id"]: r["n_tokens"]
        for r in corpus.corpus_plan(
            docs, drop_paragraph_occurrences=1
        ).collect()
    }
    base_toks = {t[0]: t[7] for t in base}  # doc_id -> n_tokens
    assert all(
        cleaned[d] <= base_toks[d] for d in cleaned if d in base_toks
    )

    out = str(tmp_path / "with_clean")
    s = corpus.build_corpus(spark, docs_path, out, scrub_pii=True)
    assert s["stages"]["clean"] == "ran" and s["stages"]["pack"] == "ran"
    again = corpus.build_corpus(spark, docs_path, out, scrub_pii=True)
    assert again["stages"]["clean"] == "skipped"
    # stop_after="clean" only valid when the stage is enabled
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.build_corpus(spark, docs_path, str(tmp_path / "x"),
                            stop_after="clean")


def test_update_corpus_equals_fresh_build(spark, tmp_path):
    """The incremental-refresh invariant: patching the extract stage
    with the snapshot delta and re-running the chain produces EXACTLY
    the corpus a from-scratch build over the new snapshot produces —
    while re-extracting only the delta."""
    from pyspark.sql import functions as F

    from docstrange_spark.operators import corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.where(F.col("doc_id") % 41 != 0)
    new = docs.where(F.col("doc_id") % 29 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(old_p)
    new.write.parquet(new_p)

    inc_dir, fresh_dir = str(tmp_path / "inc"), str(tmp_path / "fresh")
    corpus.build_corpus(spark, old_p, inc_dir)
    s = corpus.update_corpus(spark, old_p, new_p, inc_dir)
    assert s["stages"]["extract"] == "skipped"  # the patched stage held
    assert s["stages"]["dedup"] == "ran"        # cross-doc stages refreshed
    patch = s["extract_patch"]
    assert patch["n_added"] > 0 and patch["n_removed"] > 0 and patch["n_changed"] > 0

    corpus.build_corpus(spark, new_p, fresh_dir)
    for stage in ("extract", "select", "pack"):
        a = sorted(map(tuple, spark.read.parquet(f"{inc_dir}/{stage}").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{fresh_dir}/{stage}").collect()))
        assert a == b, stage


def test_update_corpus_requires_prior_build(spark, tmp_path):
    from docstrange_spark.operators import corpus

    docs = "/root/testdata/sf0.001/documents.parquet"
    with pytest.raises(ValueError):
        corpus.update_corpus(spark, docs, docs, str(tmp_path / "none"))
