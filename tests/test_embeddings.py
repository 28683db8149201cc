"""Embedding attachment (P8/P9): policy + distributed plumbing."""

from deepdoc_api_spark.ops.embeddings import (
    DeterministicFakeEmbedder,
    _embed_partition_batches,
    attach_embeddings,
)


def test_fake_embedder_deterministic_unit_vectors():
    c = DeterministicFakeEmbedder(dim=8)
    a = c.embed_batch(["hello world"])[0]
    b = DeterministicFakeEmbedder(dim=8).embed_batch(["hello world"])[0]
    assert a == b
    assert len(a) == 8
    norm = sum(x * x for x in a) ** 0.5
    assert abs(norm - 1.0) < 1e-3


def test_retry_recovers_from_transient_failures():
    # every 2nd batch fails once, then succeeds on retry
    c = DeterministicFakeEmbedder(fail_every=2, fail_times=1)
    out = _embed_partition_batches([f"t{i}" for i in range(10)], c, batch_size=2)
    assert all(v is not None for v in out)


def test_exhausted_retries_leave_none():
    c = DeterministicFakeEmbedder(poison_marker="POISON")
    out = _embed_partition_batches(["ok text", "has POISON inside"], c, batch_size=1)
    assert out[0] is not None
    assert out[1] is None  # failed batch -> None, chunk survives


def test_attach_embeddings_distributed(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents

    spans = spans_from_documents(spark, sf_dir, num_partitions=4, limit=30)
    chunks = chunk_documents(spans, "hybrid")
    emb = attach_embeddings(chunks)
    rows = emb.select("kind", "text", "embeddings").collect()
    assert len(rows) == chunks.count()
    for r in rows:
        if r.kind == "media":
            assert r.embeddings is None  # empty text -> no embedding
        else:
            assert r.embeddings is not None and len(r.embeddings) == 16

    # determinism: same text -> same vector across the corpus
    seen = {}
    for r in rows:
        if r.embeddings is not None:
            key = r.text
            if key in seen:
                assert seen[key] == list(r.embeddings)
            seen[key] = list(r.embeddings)


def test_fsutil_parquet_probing(tmp_path):
    """fsutil backs the driver-side footer probes (round-6 VERDICT #6):
    file and directory layouts agree, and a partless dir raises rather
    than returning an empty probe."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from deepdoc_api_spark.fsutil import parquet_num_rows, parquet_part_files

    t = pa.table({"x": list(range(7))})
    f = str(tmp_path / "one.parquet")
    pq.write_table(t, f)
    d = tmp_path / "dir.parquet"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    pq.write_table(t, str(d / "part-1.parquet"))

    assert parquet_part_files(f) == [f]
    assert len(parquet_part_files(str(d))) == 2
    assert parquet_num_rows(f) == 7
    assert parquet_num_rows(str(d)) == 14
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        parquet_part_files(str(empty))
