"""CLI — the Spark-native analog of the reference's ``docstrange`` command
(``/root/reference/docstrange/cli.py:165-556``): input corpus in, chosen
rendition out. Where the reference loops over files sequentially
(``cli.py:429-441``), this dispatches one Spark job over the corpus.

Usage::

    python -m docstrange_spark.cli INPUT --output-format markdown \
        --out OUT_DIR [--combine] [--resume] [--cpus 32]

INPUT: a span-table parquet dir / Iceberg identifier, or a documents-
style parquet (doc_id, text) which is spanized first (--spanize).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="docstrange_spark")
    ap.add_argument("input", help="span table (parquet dir or iceberg id)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument(
        "--output-format",
        default="markdown",
        choices=["markdown", "text", "html", "json", "csv", "all"],
    )
    ap.add_argument("--spanize", action="store_true",
                    help="input is (doc_id, text) — bridge it to spans first")
    ap.add_argument("--combine", action="store_true",
                    help="single combined document (reference multi-file mode)")
    ap.add_argument("--resume", action="store_true",
                    help="manifest-checkpointed processing, skip committed buckets")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from docstrange_spark.session import get_spark
    from docstrange_spark.operators import extract as ex
    from docstrange_spark.operators import renditions, spanize
    from docstrange_spark.sources import manifest, span_table

    spark = get_spark(app_name="docstrange_spark_cli", cores=args.cpus)
    fmts: tuple[str, ...] = (
        ("json", "html", "csv")
        if args.output_format == "all"
        else (args.output_format,)
        if args.output_format in ("json", "html", "csv")
        else ()
    )

    if args.spanize:
        # documents-style input: (doc_id, text, ...) — bridge to spans
        src = spanize.spanize(spark.read.parquet(args.input))
    else:
        src = span_table.read_spans(spark, args.input)

    if args.resume:
        snap = span_table.snapshot_id(spark, args.input)
        summary = manifest.process_resumable(
            src,
            args.out,
            lambda df: ex.extract(df, formats=fmts),
            snapshot_id=snap,
        )
        print(summary)
        return 0

    out = ex.extract(src, formats=fmts)
    if args.combine:
        if args.output_format == "all":
            print("--combine needs a single output format", file=sys.stderr)
            return 2
        combined = renditions.combine_documents(out, args.output_format)
        if args.output_format == "csv" and combined.first()["count"] == 0:
            # reference parity: csv combine with no tables anywhere is an
            # error (cli.py:533-535)
            print("Error: No tables found in any of the input files",
                  file=sys.stderr)
            return 1
        combined.write.mode("overwrite").parquet(args.out)
    else:
        out.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
