#!/usr/bin/env python
"""spark-submit entry point for the extraction+chunking job.

Usage (cluster):

    make package
    spark-submit --py-files dist/deepdoc_api_spark.zip run_job.py \\
        --input  /lake/corpus/spans_parquet \\
        --output /lake/corpus/chunks_run1 \\
        --run-id run1 --chunker hybrid --buckets 4096

Usage (sandbox smoke, generated corpus):

    python run_job.py --generate-from /root/testdata/sf0.001 \\
        --output /tmp/chunks_demo --run-id demo

The job is resumable: re-running with the same ``--output`` skips
completed buckets (per-partition checkpoint anti-join — the Redis job
state analogue of the reference, made durable; see
deepdoc_api_spark/job/checkpoint.py). ``--status`` prints the progress
table (the ``GET /job/{id}`` analogue, reference app/main.py:695-760)
and exits.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group()
    src.add_argument("--input", help="span table path (parquet dir)")
    src.add_argument(
        "--generate-from",
        help="testdata sf dir — derive the deterministic span corpus",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--chunker", default="hybrid",
                    choices=["hybrid", "hierarchical", "toc", "mineru", "fallback"])
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--token-budget", type=int, default=512)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--status", action="store_true",
                    help="print progress table for --output and exit")
    ap.add_argument(
        "--rebuild", action="store_true",
        help="discard checkpoint state recorded for a DIFFERENT input "
        "snapshot or bucket count (the default refuses, since stale "
        "progress would mix old chunks into the output)",
    )
    args = ap.parse_args()
    if not args.status and not (args.input or args.generate_from):
        ap.error("one of --input / --generate-from is required (unless --status)")

    from pyspark.sql import SparkSession

    from deepdoc_api_spark.job.checkpoint import progress_df, run_checkpointed
    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.job.session import (
        KERNEL_SPLIT_BYTES,
        get_spark,
        ship_package,
    )

    # under spark-submit a session/conf already exists; standalone we
    # build a tuned one
    active = SparkSession.getActiveSession()
    spark = active if active is not None else get_spark(
        app_name="deepdoc-chunk-job", kernel_split_bytes=KERNEL_SPLIT_BYTES
    )
    ship_package(spark)

    if args.status:
        pdf = progress_df(spark, args.output).orderBy("partition_id").toPandas()
        print(pdf.to_string(index=False))
        done = int((pdf["status"] == "completed").sum())
        print(f"\nbuckets completed: {done}")
        return

    if args.input:
        spans = spark.read.parquet(args.input)
        snapshot = args.input
    else:
        spans = spans_from_documents(
            spark, args.generate_from, replicate=args.replicate
        )
        snapshot = f"generated:{args.generate_from}@r{args.replicate}"

    summary = run_checkpointed(
        spark,
        spans,
        args.output,
        run_id=args.run_id,
        chunker_type=args.chunker,
        token_budget=args.token_budget,
        num_buckets=args.buckets,
        input_snapshot=snapshot,
        on_mismatch="rebuild" if args.rebuild else "refuse",
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
