#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling``: runs the flagship pipeline at two parallelism levels
(local[8] vs local[32] by default) in fresh subprocesses on the same
input and reports throughput at both plus the scaling efficiency
``throughput(4N) / (4 × throughput(N))`` — the in-sandbox evidence for
the north rule's two-cluster-size criterion (a real N→4N executor
fleet is substituted by N→4N local cores; the job is CPU-bound in the
kernel, so core scaling is the binding resource either way). Results
are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "4"))


def _count_kernel(df) -> int:
    """Materialize a Python-kernel pipeline via count(): the mapInPandas
    stage always executes fully (it is opaque to pruning), so count()
    measures the real kernel cost in a single pass."""
    return df.count()


def _noop_write(df) -> None:
    """Materialize a JVM-expression plan via the noop sink — a bare
    count() would let Catalyst prune away the very expressions under
    measurement."""
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(sf_dir: str, cpus: int, replicate: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents
    from deepdoc_api_spark.job.session import get_spark
    from deepdoc_api_spark.ops import dedup, similarity, text_analysis

    spark = get_spark(
        app_name=f"ddspark-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    try:
        timings: dict = {}
        # corpus generation is part of the pipeline cost; cache the spans
        # to time chunking alone as the flagship number
        spans = spans_from_documents(
            spark, sf_dir, num_partitions=cpus * 4, replicate=replicate
        )
        spans = spans.cache()
        t0 = time.monotonic()
        n_docs = spans.count()
        timings["corpus_gen"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        n_chunks = _count_kernel(chunk_documents(spans, "hybrid"))
        flagship_sec = time.monotonic() - t0
        timings["pipeline_hybrid"] = round(flagship_sec, 3)

        for name, ct in (("pipeline_mineru", "mineru"), ("pipeline_toc", "toc")):
            t0 = time.monotonic()
            _count_kernel(chunk_documents(spans, ct))
            timings[name] = round(time.monotonic() - t0, 3)
        spans.unpersist()

        for name, fn in (
            ("dedup_minhash_lsh", dedup.lsh_band_buckets),
            ("dedup_jaccard_pairs", dedup.jaccard_near_dup_pairs),
            ("dedup_simhash", dedup.simhash16),
            ("ann_topk_cosine", similarity.brute_force_topk),
            ("text_quality_lang", None),
        ):
            t0 = time.monotonic()
            if name == "text_quality_lang":
                _noop_write(text_analysis.quality_score(spark, sf_dir))
                _noop_write(text_analysis.lang_id(spark, sf_dir))
            else:
                _noop_write(fn(spark, sf_dir))
            timings[name] = round(time.monotonic() - t0, 3)

        return {
            "metric": "e2e_hybrid_extract_chunk_sec",
            "value": round(flagship_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": _sf_of(sf_dir),
            "n_docs": n_docs,
            "n_chunks": n_chunks,
            "docs_per_sec": round(n_docs / max(flagship_sec, 1e-9), 2),
            "cpus": cpus,
            "replicate": replicate,
        }
    finally:
        spark.stop()


def run_scaling(sf_dir: str, replicate: int, low: int = 8, high: int = 32) -> dict:
    """Same job, same input, two parallelism levels, fresh JVMs."""
    results = {}
    for cpus in (low, high):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["BENCH_REPLICATE"] = str(replicate)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tp_low = results[low]["docs_per_sec"]
    tp_high = results[high]["docs_per_sec"]
    eff = tp_high / ((high / low) * tp_low)
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "low_cpus": low,
        "high_cpus": high,
        "docs_per_sec_low": tp_low,
        "docs_per_sec_high": tp_high,
        "sf": _sf_of(sf_dir),
        "n_docs": results[high]["n_docs"],
        "target": ">=0.8",
    }
    return summary, results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--single", action="store_true", help="internal")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--replicate", type=int, default=REPLICATE)
    args = ap.parse_args()

    if args.scaling:
        summary, results = run_scaling(args.sf_dir, args.replicate)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
            json.dump({"summary": summary, "runs": results}, f, indent=2)
        print(json.dumps(summary))
    else:
        print(json.dumps(run_bench(args.sf_dir, args.cpus, args.replicate)))


if __name__ == "__main__":
    main()
