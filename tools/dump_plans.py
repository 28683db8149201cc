#!/usr/bin/env python
"""Dump .explain('formatted') for the round-8-touched queries.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix>
Run once against the round-start worktree (suffix 'before') and once
against HEAD (suffix 'after'); the judge compares the plan claims in
OPTIMIZATION_r08.md against these files.
"""
import io
import os
import sys
from contextlib import redirect_stdout

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
os.makedirs(out_dir, exist_ok=True)

SF = "/root/testdata/sf0.1"

from deepdoc_api_spark.job.session import KERNEL_SPLIT_BYTES, get_spark  # noqa: E402

spark = get_spark(
    app_name=f"plans-{suffix}",
    master="local[8]",
    shuffle_partitions=16,
    kernel_split_bytes=KERNEL_SPLIT_BYTES,
)


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path, flush=True)


from deepdoc_api_spark.job.pipeline import (  # noqa: E402
    chunk_documents,
    spans_from_documents,
    spans_parquet_cached,
)
from deepdoc_api_spark.ops import dedup, fallback_text, similarity  # noqa: E402

dump("corpus_gen", spans_from_documents(spark, SF, num_partitions=32, replicate=4))
spans = spans_parquet_cached(spark, SF)
dump("pipeline_hybrid", chunk_documents(spans, "hybrid"))
dump("dedup_minhash_lsh", dedup.lsh_band_buckets(spark, SF))
dump("dedup_jaccard_pairs", dedup.jaccard_near_dup_pairs(spark, SF))
dump("dedup_simhash64_pairs", dedup.simhash_near_dup_pairs(spark, SF))
dump("dedup_containment", dedup.containment_near_dup_pairs(spark, SF))
dump("embedding_near_dup", similarity.embedding_near_dup_pairs(spark, SF))
dump("ann_topk_cosine", similarity.brute_force_topk(spark, SF))
dump("ann_topk_ivf", similarity.ivf_topk(spark, SF))
dump("semantic_dedup", similarity.semantic_dedup(spark, SF))
dump("fallback_window", fallback_text.fallback_window_chunks(spark, SF))
spark.stop()
