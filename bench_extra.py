#!/usr/bin/env python
"""Round-6 optimization harness (guide §1: measure first).

NOT part of the frozen bench contract — bench.py is the driver's timed
surface and stays untouched. This file exists to
  * time each bench query in isolation (same action bench uses, plus a
    noop-sink variant where that differs),
  * capture .explain("formatted") for every query into plans/r06/,
  * time sub-stages of the expensive queries so optimization targets
    the operator that actually costs, not the one that looks guilty.

Usage:
  python bench_extra.py --plans before   # dump plans/r06/<q>_before.txt
  python bench_extra.py --time --runs 3  # per-query isolated timings
  python bench_extra.py --stages         # sub-stage timings (lsh, search, ...)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TMP = "/tmp/spark_graft_bench"
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from docstrange_spark.session import get_spark

    return get_spark(
        app_name="bench_extra", cores=CPUS, shuffle_partitions=max(2 * CPUS, 16)
    )


def build_inputs(spark):
    """Mirror bench.py's inputs: spans parquet, extracted markdown
    parquet, materialized section table."""
    import bench as _bench
    from docstrange_spark.operators import extract, navigation

    spans_path = _bench.ensure_spans(spark, _bench.sf_of(SF_DIR))
    out_path = os.path.join(TMP, f"out_sf{_bench.sf_of(SF_DIR)}_c{CPUS}")
    if not os.path.exists(os.path.join(out_path, "_SUCCESS")):
        extract.extract(
            spark.read.parquet(spans_path), formats=("json",), include_spans=False
        ).write.mode("overwrite").parquet(out_path)
    secs_path = os.path.join(TMP, "bench_sections")
    md = spark.read.parquet(out_path).select("doc_id", "markdown")
    navigation.sections_relational(md).write.mode("overwrite").parquet(secs_path)
    return spans_path, out_path, secs_path


def bench_jobs(spark, spans_path, out_path, secs_path):
    """The same 14 jobs bench.py times, with the same actions, plus a
    df-builder for plan capture (None where the job is imperative)."""
    from pyspark.sql import functions as F

    from docstrange_spark.operators import (
        corpus,
        curation,
        dedup,
        extract,
        navigation,
        retrieval,
        similarity,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    md = spark.read.parquet(out_path).select("doc_id", "markdown")
    secs = spark.read.parquet(secs_path)

    def extract_job():
        df = spark.read.parquet(spans_path)
        out = extract.extract(df, formats=("json",), include_spans=False)
        out.write.mode("overwrite").parquet(os.path.join(TMP, "extra_out"))

    builders = {
        "extract_pipeline": lambda: extract.extract(
            spark.read.parquet(spans_path), formats=("json",), include_spans=False
        ),
        "sections": lambda: navigation.sections_relational(md).agg(
            F.count("*"), F.sum("token_count")
        ),
        "search": lambda: navigation.search_relational(md, "query"),
        "search_materialized": lambda: navigation.search_over_sections(secs, "query"),
        "dedup_minhash_lsh": lambda: dedup.lsh_candidate_pairs(docs),
        "dedup_minhash_lsh_k128": lambda: dedup.lsh_candidate_pairs(
            docs, k=dedup.WEBSCALE_K, bands=dedup.WEBSCALE_BANDS, scheme="affine"
        ),
        "simhash": lambda: dedup.simhash16(docs).agg(F.count("*")),
        "knn_bruteforce": lambda: similarity.knn_bruteforce(emb, [0, 1, 2, 3, 4], 10),
        "knn_lsh": lambda: similarity.knn_lsh(emb, [0, 1, 2, 3, 4], 10),
        "build_corpus": lambda: corpus.corpus_plan(docs),
        "bm25_search": lambda: retrieval.bm25_search(docs, ["spark", "window"], top_k=20),
        "dsir_weights": lambda: curation.dsir_weights(
            docs.withColumn("is_target", F.col("lang") == F.lit("en")), n_buckets=1024
        ),
        "dup_span_dedup": lambda: dedup.dup_ngram_stats(docs, n=8).agg(
            F.sum("dup_tokens")
        ),
        "semantic_dedup": lambda: similarity.semantic_dedup(emb, tau=0.9).where(
            ~F.col("keep")
        ),
    }
    # action bench.py uses for each (count vs collect); extract writes parquet
    actions = {
        "extract_pipeline": extract_job,
        "sections": lambda: builders["sections"]().collect(),
        "search": lambda: builders["search"]().count(),
        "search_materialized": lambda: builders["search_materialized"]().count(),
        "dedup_minhash_lsh": lambda: builders["dedup_minhash_lsh"]().count(),
        "dedup_minhash_lsh_k128": lambda: builders["dedup_minhash_lsh_k128"]().count(),
        "simhash": lambda: builders["simhash"]().collect(),
        "knn_bruteforce": lambda: builders["knn_bruteforce"]().count(),
        "knn_lsh": lambda: builders["knn_lsh"]().count(),
        "build_corpus": lambda: builders["build_corpus"]().count(),
        "bm25_search": lambda: builders["bm25_search"]().count(),
        "dsir_weights": lambda: builders["dsir_weights"]().count(),
        "dup_span_dedup": lambda: builders["dup_span_dedup"]().collect(),
        "semantic_dedup": lambda: builders["semantic_dedup"]().count(),
    }
    return builders, actions


def capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", choices=["before", "after"], default=None)
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    spark = get_session()
    spans_path, out_path, secs_path = build_inputs(spark)
    builders, actions = bench_jobs(spark, spans_path, out_path, secs_path)
    only = set(args.only.split(",")) if args.only else None

    if args.plans:
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name, b in builders.items():
            if only and name not in only:
                continue
            path = os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt")
            try:
                txt = capture_plan(b())
            except Exception as e:  # corpus_plan localCheckpoints eagerly
                txt = f"<explain failed: {e}>"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")

    if args.time:
        # warmup: spin up python workers once (same as bench.py)
        from docstrange_spark.operators import extract as _ex

        _ex.extract(
            spark.read.parquet(spans_path).limit(4096), formats=("json",)
        ).write.mode("overwrite").parquet(os.path.join(TMP, "warmup"))
        results = {}
        for name, job in actions.items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"extra:{name}")
            samples = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                job()
                samples.append(round(time.perf_counter() - t0, 3))
            results[name] = {
                "median": statistics.median(samples),
                "min": min(samples),
                "samples": samples,
            }
            print(name, results[name], flush=True)
        print(json.dumps({k: v["median"] for k, v in results.items()}))

    if args.stages:
        from pyspark.sql import functions as F

        from docstrange_spark.operators import dedup, navigation

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        md = spark.read.parquet(out_path).select("doc_id", "markdown")

        def t(name, fn, runs=args.runs):
            spark.sparkContext.setJobDescription(f"stage:{name}")
            ss = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn()
                ss.append(round(time.perf_counter() - t0, 3))
            print(f"{name}: median={statistics.median(ss)} samples={ss}", flush=True)

        # --- lsh k=8 decomposition
        t("lsh8.shingles", lambda: noop(dedup.shingles(docs)))
        t("lsh8.signatures", lambda: noop(dedup.minhash_signatures(docs)))
        t("lsh8.bands", lambda: noop(dedup.lsh_bands(dedup.minhash_signatures(docs))))
        t("lsh8.pairs_full", lambda: noop(dedup.lsh_candidate_pairs(docs)))
        # --- lsh k=128 decomposition
        t(
            "lsh128.signatures",
            lambda: noop(
                dedup.minhash_signatures(
                    docs, k=dedup.WEBSCALE_K, scheme="affine"
                )
            ),
        )
        t(
            "lsh128.bands",
            lambda: noop(
                dedup.lsh_bands(
                    dedup.minhash_signatures(docs, k=dedup.WEBSCALE_K, scheme="affine"),
                    bands=dedup.WEBSCALE_BANDS,
                    k=dedup.WEBSCALE_K,
                )
            ),
        )
        t(
            "lsh128.pairs_full",
            lambda: noop(
                dedup.lsh_candidate_pairs(
                    docs, k=dedup.WEBSCALE_K, bands=dedup.WEBSCALE_BANDS,
                    scheme="affine",
                )
            ),
        )
        # --- search decomposition
        t("search.lines_only", lambda: noop(navigation.explode_lines(md)))
        t(
            "search.sections_only",
            lambda: noop(navigation.sections_relational(md)),
        )
        t("search.full", lambda: navigation.search_relational(md, "query").count())

    spark.stop()


if __name__ == "__main__":
    main()
