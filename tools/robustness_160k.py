#!/usr/bin/env python
"""At-scale kernel-drift tripwire (round-6 VERDICT #2).

Runs the CHECKPOINTED production job (run_checkpointed — bucketed
output, progress lineage, resume guard) over the 160,000-document
corpus (sf0.1 × replicate 32, ~11.6 M spans) once per chunker type and
compares the total chunk count against the pinned value. The counts
are byte-stable across rounds 3-7 for hybrid; the other four were
first pinned in rounds 6-7. ANY drift means a kernel change altered
output on SOME code path — the hybrid-only gate used through round 6
could not see a regression confined to toc/mineru/hierarchical/
fallback.

Usage:  python tools/robustness_160k.py [--chunkers hybrid,toc,...]
Prints one JSON line per chunker and exits nonzero on drift.
(~1 min per chunker at local[32]; not part of the default pytest run.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = 32
BUCKETS = 256

#: pinned 160k-doc chunk counts per chunker (sf0.1 × 32, token budget
#: 512). hybrid: identical r3-r7. toc: first measured r6, re-confirmed
#: r7. hierarchical/mineru/fallback: first pinned r7.
EXPECTED = {
    "hybrid": 7_428_682,
    "toc": 1_699_700,
    "hierarchical": 12_418_755,  # first pinned r7 (double-run confirmed)
    "mineru": 6_592_708,
    "fallback": 1_694_334,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunkers", default=",".join(EXPECTED))
    args = ap.parse_args()

    from deepdoc_api_spark.job.checkpoint import run_checkpointed
    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.job.session import (
        KERNEL_SPLIT_BYTES,
        get_spark,
        ship_package,
    )

    chunkers = args.chunkers.split(",")
    # reject unknown names UP FRONT (round-7 review): the kernel routes
    # an unknown chunker_type to hybrid, and an unpinned name would
    # otherwise "pass" vacuously — a typo'd run must fail loudly, not
    # report a drift-check that never ran
    unknown = [ct for ct in chunkers if ct not in EXPECTED]
    if unknown:
        print(f"unknown chunker(s): {unknown}; known: {sorted(EXPECTED)}",
              file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="ddspark-robustness-160k", kernel_split_bytes=KERNEL_SPLIT_BYTES
    )
    ship_package(spark)
    # materialize the replicated corpus ONCE and read it back per
    # chunker (round-7 review): run_checkpointed re-executes its input
    # lineage, so handing it the raw generator DataFrame regenerated
    # the ~11.6M-span corpus five times per invocation
    corpus_dir = tempfile.mkdtemp(prefix="ddspark-robust-corpus-")
    spans_path = os.path.join(corpus_dir, "spans.parquet")
    spans_from_documents(
        spark, SF_DIR, replicate=REPLICATE
    ).write.mode("overwrite").parquet(spans_path)
    spans = spark.read.parquet(spans_path)

    import time

    failed = []
    for ct in chunkers:
        out = tempfile.mkdtemp(prefix=f"ddspark-robust-{ct}-")
        try:
            t0 = time.monotonic()
            summary = run_checkpointed(
                spark,
                spans,
                out,
                run_id=f"robust-{ct}",
                chunker_type=ct,
                num_buckets=BUCKETS,
                input_snapshot=f"generated:{SF_DIR}@r{REPLICATE}",
            )
            got = int(summary["chunks"])
            want = EXPECTED.get(ct)
            ok = want is None or got == want
            print(json.dumps({
                "chunker": ct, "chunks": got, "expected": want,
                "ok": ok, "wall_s": round(time.monotonic() - t0, 1),
            }), flush=True)
            if not ok:
                failed.append(ct)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    if failed:
        print(f"DRIFT in: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
