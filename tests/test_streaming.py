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


def test_windowed_stats_watermark_and_late_drop(spark, tmp_path):
    """Watermarked event-time windows: a window commits exactly once
    (append mode) after the watermark passes it; rows later than the
    allowed lateness are dropped; the tail window flushes on the next
    increment."""
    import datetime as dt

    from deepdoc_api_spark.job.streaming import run_streaming_windowed_stats

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ts(minute):
        return dt.datetime(2026, 1, 1, 10, minute, 0)

    def spans(n):
        return [{"kind": "text", "text": "x", "media_ref": "", "offset": i}
                for i in range(n)]

    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "ingest_ts timestamp"
    )
    # increment 1: two docs in [10:00,10:10), one in [10:10,10:20)
    inc1 = spark.createDataFrame(
        [("d1", spans(2), ts(1)), ("d2", spans(3), ts(8)), ("d3", spans(1), ts(12))],
        schema,
    )
    inc1.coalesce(1).write.mode("append").parquet(inp)
    run_streaming_windowed_stats(spark, inp, out, ckpt)

    # increment 2: a row at 10:31 pushes the watermark to 10:26 —
    # both earlier windows (ends 10:10, 10:20 <= 10:26) commit exactly
    # once
    inc2 = spark.createDataFrame([("d4", spans(4), ts(31))], schema)
    inc2.coalesce(1).write.mode("append").parquet(inp)
    run_streaming_windowed_stats(spark, inp, out, ckpt)

    rows = {
        r.window_start.minute: (r.docs, r.spans)
        for r in spark.read.parquet(out).collect()
    }
    assert rows[0] == (2, 5) and rows[10] == (1, 1), rows
    # the 10:30 window holds d4 but cannot flush until a later batch
    assert 30 not in rows

    # increment 3: a row at 10:02 arrives AFTER the watermark (10:26)
    # passed its window end (10:10) — dropped, never re-emitting the
    # committed window; 10:46 advances the watermark to 10:41, flushing
    # d4's [10:30, 10:40) window
    inc3 = spark.createDataFrame(
        [("d_late", spans(9), ts(2)), ("d5", spans(6), ts(46))], schema
    )
    inc3.coalesce(1).write.mode("append").parquet(inp)
    run_streaming_windowed_stats(spark, inp, out, ckpt)

    rows3 = {}
    for r in spark.read.parquet(out).collect():
        rows3.setdefault(r.window_start.minute, []).append((r.docs, r.spans))
    assert rows3[0] == [(2, 5)], f"late row leaked or window re-emitted: {rows3}"
    assert rows3[30] == [(1, 4)]
    assert 40 not in rows3  # tail window stays open, as documented
