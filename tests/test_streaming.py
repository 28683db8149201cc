"""Incremental streaming ingestion: AvailableNow drains only the delta
and the union of increments equals one batch run."""

import os

from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents
from deepdoc_api_spark.job.streaming import run_available_now


def test_available_now_incremental(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "spans_in")
    out_dir = str(tmp_path / "chunks_out")
    cp_dir = str(tmp_path / "cp")
    os.makedirs(in_dir, exist_ok=True)

    all_spans = spans_from_documents(spark, sf_dir, num_partitions=4, limit=40)
    all_spans.cache()
    batch1 = all_spans.filter("doc_id < 'doc-00000020'")
    batch2 = all_spans.filter("doc_id >= 'doc-00000020'")

    # first increment
    batch1.write.mode("append").parquet(in_dir)
    run_available_now(spark, in_dir, out_dir, cp_dir)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # second increment: only the new files are processed
    batch2.write.mode("append").parquet(in_dir)
    run_available_now(spark, in_dir, out_dir, cp_dir)
    got = spark.read.parquet(out_dir)
    n2 = got.count()
    assert n2 > n1

    # union of increments == one batch run, no duplicates
    key = ["doc_id", "chunk_index", "kind", "text", "media_ref"]
    streamed = sorted(map(tuple, got.select(*key).collect()))
    batch = sorted(
        map(tuple, chunk_documents(all_spans, "hybrid").select(*key).collect())
    )
    assert streamed == batch

    # third run with nothing new: no growth
    run_available_now(spark, in_dir, out_dir, cp_dir)
    assert spark.read.parquet(out_dir).count() == n2
    all_spans.unpersist()


def test_streaming_dedup_across_increments(spark, sf_dir, tmp_path):
    """A document whose content already arrived in an EARLIER increment
    is suppressed by the stateful seen-fingerprint store."""
    from deepdoc_api_spark.job.streaming import run_streaming_dedup

    in_dir = str(tmp_path / "sd_in")
    out_dir = str(tmp_path / "sd_out")
    cp_dir = str(tmp_path / "sd_cp")
    os.makedirs(in_dir, exist_ok=True)

    spans = spans_from_documents(spark, sf_dir, num_partitions=2, limit=10)
    spans.cache()

    # increment 1: docs 0-9
    spans.write.mode("append").parquet(in_dir)
    run_streaming_dedup(spark, in_dir, out_dir, cp_dir)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == spans.count()

    # increment 2: the SAME contents under new doc ids + 1 novel doc
    import pyspark.sql.functions as F

    dup_again = spans.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("-copy")))
    novel = spans_from_documents(spark, sf_dir, num_partitions=1, limit=11).filter(
        "doc_id = 'doc-00000010'"
    )
    dup_again.unionByName(novel).write.mode("append").parquet(in_dir)
    run_streaming_dedup(spark, in_dir, out_dir, cp_dir)

    out = spark.read.parquet(out_dir)
    assert out.count() == n1 + 1, "duplicates crossed the state store"
    assert out.filter("doc_id like '%-copy'").count() == 0
    assert out.filter("doc_id = 'doc-00000010'").count() == 1
    spans.unpersist()
