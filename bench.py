#!/usr/bin/env python
"""Bench harness (BASELINE.md protocol).

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf", "docs_per_sec", ...}.

--scaling: additionally runs the extraction pipeline at local[8] and
local[32] on the same input (the sandbox proxy for N vs 4N executors,
per the north rule) and reports throughput at both plus scaling
efficiency; results also land in BENCH/BASELINE.md.

The benched corpus is the deterministic sf-scaled span table (seed 42,
~600k docs x sf) with mega-documents injected every 2000 docs (the skew
clause); it is materialized once to parquet under /tmp so timed runs
measure read -> salt-repartition -> extract -> renditions -> write, not
generation.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

SF_DIR_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS_DEFAULT = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TMP = "/tmp/spark_graft_bench"
MEGA_EVERY = 2000


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def n_docs_of(sf: float) -> int:
    return max(int(600_000 * sf), 100)


def ensure_spans(spark, sf: float) -> str:
    """Materialize the deterministic span corpus once per sf."""
    from docstrange_spark import datagen

    path = os.path.join(TMP, f"spans_sf{sf}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        n = n_docs_of(sf)
        datagen.scale_spans(spark, n, mega_every=MEGA_EVERY).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def run_extract(spark, spans_path: str, out_path: str) -> float:
    """read -> salt-repartition -> extract -> json rendition -> write."""
    from pyspark.sql import functions as F

    from docstrange_spark.operators import extract, renditions

    def job():
        df = spark.read.parquet(spans_path)
        ex = extract.extract(df)
        out = renditions.with_renditions(ex, formats=("json",)).select(
            "doc_id", "markdown", "n_blocks", "profile", "json"
        )
        out.write.mode("overwrite").parquet(out_path)
        return None

    sec, _ = timed(job)
    return sec


def run_aux_queries(spark, sf_dir: str, out_path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from docstrange_spark.operators import dedup, navigation, similarity

    times: dict[str, float] = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    md = spark.read.parquet(out_path).select("doc_id", "markdown")

    times["sections"], _ = timed(
        lambda: navigation.sections_relational(md)
        .agg(F.count("*"), F.sum("token_count"))
        .collect()
    )
    times["search"], _ = timed(
        lambda: navigation.search_relational(md, "query").count()
    )
    times["dedup_minhash_lsh"], _ = timed(
        lambda: dedup.lsh_candidate_pairs(docs).count()
    )
    times["simhash"], _ = timed(
        lambda: dedup.simhash16(docs).agg(F.count("*")).collect()
    )
    times["knn_bruteforce"], _ = timed(
        lambda: similarity.knn_bruteforce(emb, [0, 1, 2, 3, 4], 10).count()
    )
    return times


def bench_at(cores: int, sf_dir: str, runs: int = 1, aux: bool = True):
    from docstrange_spark.session import get_spark

    sf = sf_of(sf_dir)
    spark = get_spark(app_name=f"bench_c{cores}", cores=cores,
                      shuffle_partitions=max(2 * cores, 16))
    try:
        spans_path = ensure_spans(spark, sf)
        out_path = os.path.join(TMP, f"out_sf{sf}_c{cores}")
        # warm-up (JVM/Arrow/py-worker spin-up) on a slice
        spark.read.parquet(spans_path).limit(64).count()

        extract_secs = [run_extract(spark, spans_path, out_path) for _ in range(runs)]
        extract_sec = sorted(extract_secs)[len(extract_secs) // 2]
        queries = {"extract_pipeline": round(extract_sec, 3)}
        if aux:
            for k, v in run_aux_queries(spark, sf_dir, out_path).items():
                queries[k] = round(v, 3)
        n = n_docs_of(sf)
        return {
            "cores": cores,
            "sf": sf,
            "n_docs": n,
            "queries": queries,
            "extract_sec": round(extract_sec, 3),
            "docs_per_sec": round(n / extract_sec, 1),
        }
    finally:
        spark.stop()


def write_baseline_md(r8, r32, main):
    os.makedirs("BENCH", exist_ok=True)
    eff = r8["docs_per_sec"] and round(
        r32["docs_per_sec"] / (4 * r8["docs_per_sec"]), 3
    )
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured baseline (this repo's engine)\n\n"
            f"Corpus: deterministic span table seed 42, sf={r8['sf']} "
            f"({r8['n_docs']} docs, mega-doc every {MEGA_EVERY}).\n"
            "Pipeline timed: read parquet -> salted repartition "
            "(xxhash64(doc_id)) + mega-doc routing -> mapInPandas extract "
            "kernel -> JSON rendition -> parquet write.\n\n"
            "| config | extract sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {r8['extract_sec']} | {r8['docs_per_sec']} |\n"
            f"| local[32] (4N) | {r32['extract_sec']} | {r32['docs_per_sec']} |\n\n"
            f"**Scaling efficiency** thr_4N / (4 x thr_N) = **{eff}** "
            "(north-rule target >= 0.8; local[8] vs local[32] is the sandbox "
            "proxy for N vs 4N executors).\n\n"
            "## Full headline-query timings (local[%d])\n\n" % main["cores"]
            + "| query | sec |\n|---|---|\n"
            + "".join(
                f"| {k} | {v} |\n" for k, v in main["queries"].items()
            )
        )
    return eff


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR_DEFAULT)
    ap.add_argument("--cpus", type=int, default=CPUS_DEFAULT)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--scaling", action="store_true",
                    help="also run local[8] vs local[32] scaling protocol")
    ap.add_argument("--no-aux", action="store_true")
    args = ap.parse_args()

    main_res = bench_at(args.cpus, args.sf_dir, runs=args.runs, aux=not args.no_aux)
    result = {
        "metric": "docs/sec extraction throughput",
        "value": round(sum(main_res["queries"].values()), 3),
        "unit": "sec",
        "queries": main_res["queries"],
        "sf": main_res["sf"],
        "n_docs": main_res["n_docs"],
        "docs_per_sec": main_res["docs_per_sec"],
        "cores": main_res["cores"],
    }
    if args.scaling:
        r8 = bench_at(8, args.sf_dir, runs=args.runs, aux=False)
        r32 = (
            main_res
            if args.cpus == 32
            else bench_at(32, args.sf_dir, runs=args.runs, aux=False)
        )
        eff = write_baseline_md(r8, r32, main_res)
        result["scaling"] = {
            "docs_per_sec_local8": r8["docs_per_sec"],
            "docs_per_sec_local32": r32["docs_per_sec"],
            "efficiency": eff,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
