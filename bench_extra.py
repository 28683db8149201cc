#!/usr/bin/env python
"""Extra, noop-isolated measurements (guide §1.4) — NOT the driver
bench; bench.py stays frozen. Phases of the flagship are isolated so
optimization targets the right layer.

Run: python bench_extra.py [--phase flagship|ops]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def flagship_phases() -> dict:
    import pandas as pd

    from deepdoc_api_spark.job.pipeline import (
        chunk_documents,
        spans_from_documents,
    )
    from deepdoc_api_spark.job.session import KERNEL_SPLIT_BYTES, get_spark

    spark = get_spark(
        app_name="bench-extra-flagship",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
        kernel_split_bytes=KERNEL_SPLIT_BYTES,
    )
    out: dict = {}
    sc = spark.sparkContext
    # worker warmup (same as bench.py)
    spark.range(CPUS * 2).repartition(CPUS * 2).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    corpus_dir = tempfile.mkdtemp(prefix="ddspark-bx-")
    spans_path = os.path.join(corpus_dir, "spans.parquet")
    try:
        sc.setJobDescription("corpus_gen")
        t0 = time.monotonic()
        spans_from_documents(
            spark, SF_DIR, num_partitions=sc.defaultParallelism * 4, replicate=4
        ).write.mode("overwrite").parquet(spans_path)
        out["corpus_gen_write"] = round(time.monotonic() - t0, 3)

        spans = spark.read.parquet(spans_path)

        # phase A: bare scan of the nested spans column (JVM only)
        sc.setJobDescription("scan_noop")
        t0 = time.monotonic()
        _noop(spans)
        out["scan_noop"] = round(time.monotonic() - t0, 3)

        # phase B: scan + arrow->pandas crossing, no kernel (1 row out/batch)
        def passthrough(batches):
            n = 0
            for pdf in batches:
                for _d, s in zip(pdf["doc_id"], pdf["spans"]):
                    n += len(s)
            yield pd.DataFrame({"n": [n]})

        sc.setJobDescription("scan_to_python")
        t0 = time.monotonic()
        _noop(spans.mapInPandas(passthrough, "n long"))
        out["scan_to_python"] = round(time.monotonic() - t0, 3)

        # phase B2: same but touching each span dict (kernel-shaped access)
        def touch(batches):
            n = 0
            for pdf in batches:
                for _d, s in zip(pdf["doc_id"], pdf["spans"]):
                    for sp in s:
                        if sp["text"]:
                            n += 1
            yield pd.DataFrame({"n": [n]})

        sc.setJobDescription("scan_touch_spans")
        t0 = time.monotonic()
        _noop(spans.mapInPandas(touch, "n long"))
        out["scan_touch_spans"] = round(time.monotonic() - t0, 3)

        # phase C: full kernel, but emit only counts (skips chunk-row
        # conversion + Arrow return payload)
        def kernel_count(batches):
            from deepdoc_api_spark.kernels.pipeline import chunk_document

            n = 0
            for pdf in batches:
                for d, s in zip(pdf["doc_id"], pdf["spans"]):
                    n += len(chunk_document(d, s if s is not None else [], "hybrid", 512))
            yield pd.DataFrame({"n": [n]})

        sc.setJobDescription("kernel_count_only")
        t0 = time.monotonic()
        _noop(spans.mapInPandas(kernel_count, "n long"))
        out["kernel_count_only"] = round(time.monotonic() - t0, 3)

        # phase D: the real flagship (count like bench.py)
        for rep in range(2):
            sc.setJobDescription(f"flagship_full_{rep}")
            t0 = time.monotonic()
            n = chunk_documents(spans, "hybrid").count()
            out[f"flagship_full_{rep}"] = round(time.monotonic() - t0, 3)
        out["n_chunks"] = n

        # phase E: flagship via noop (materializes every column)
        sc.setJobDescription("flagship_noop")
        t0 = time.monotonic()
        _noop(chunk_documents(spans, "hybrid"))
        out["flagship_noop"] = round(time.monotonic() - t0, 3)
    finally:
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()
    return out


def ops_phases() -> dict:
    """Per-ops-query breakdown: plan (analysis+optimize via explain)
    vs first execution vs warm execution, in the bench's ops session."""
    from deepdoc_api_spark.job.session import KERNEL_SPLIT_BYTES, get_spark
    from deepdoc_api_spark.ops import dedup, fallback_text, similarity, text_analysis

    spark = get_spark(
        app_name="bench-extra-ops",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS // 2, 16),
        kernel_split_bytes=KERNEL_SPLIT_BYTES,
    )
    spark.range(CPUS * 2).repartition(CPUS * 2).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = (
        ("dedup_minhash_lsh", dedup.lsh_band_buckets),
        ("dedup_jaccard_pairs", dedup.jaccard_near_dup_pairs),
        ("dedup_simhash", dedup.simhash16),
        ("dedup_simhash64_pairs", dedup.simhash_near_dup_pairs),
        ("embedding_near_dup", similarity.embedding_near_dup_pairs),
        ("ann_topk_cosine", similarity.brute_force_topk),
        ("ann_topk_ivf", similarity.ivf_topk),
        ("semantic_dedup", similarity.semantic_dedup),
        ("dedup_containment", dedup.containment_near_dup_pairs),
        ("fallback_window", fallback_text.fallback_window_chunks),
        ("quality_score", text_analysis.quality_score),
        ("lang_id", text_analysis.lang_id),
    )
    out: dict = {}
    for name, fn in qs:
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        df.explain("formatted")
        t_plan = time.monotonic() - t0
        t0 = time.monotonic()
        _noop(df)
        t_exec = time.monotonic() - t0
        t0 = time.monotonic()
        _noop(fn(spark, SF_DIR))
        t_warm = time.monotonic() - t0
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "exec1": round(t_exec, 3),
            "warm": round(t_warm, 3),
        }
        print(name, out[name], flush=True)
    spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="flagship", choices=["flagship", "ops"])
    args = ap.parse_args()
    res = flagship_phases() if args.phase == "flagship" else ops_phases()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
