"""Round-3 VERDICT #8: the media-decode and embedding-client stubs must
be swappable for real implementations with ZERO plan changes — the fake
is injected at the narrowest seam (one function body), so building the
pipeline with the raising/real seam yields an identical schema and an
identical optimized plan shape. Nothing here executes the raising path
(that raises NotImplementedError inside tasks by design)."""

import re

from deepdoc_api_spark.ops.embeddings import EmbeddingClient, attach_embeddings
from deepdoc_api_spark.ops.multimodal import extract_media_features, media_catalog


def _plan_shape(df):
    """Optimized plan with per-run ids scrubbed (expr ids #123, object
    addresses 0x7f..) so two structurally identical plans compare equal."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+", "#x", s)
    s = re.sub(r"0x[0-9a-f]+", "0xX", s)
    return s


def test_media_decode_seam_plan_identical(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import spans_from_documents

    media = media_catalog(spans_from_documents(spark, sf_dir))
    fake = extract_media_features(media, fake_decode=True)
    real = extract_media_features(media, fake_decode=False)
    assert fake.schema == real.schema
    assert _plan_shape(fake) == _plan_shape(real)
    # the fake path actually runs; the real path's only gap is the
    # in-UDF decode body
    assert fake.limit(5).count() >= 0


def test_embedding_client_seam_plan_identical(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents

    chunks = chunk_documents(spans_from_documents(spark, sf_dir), "fallback")
    fake = attach_embeddings(chunks)  # DeterministicFakeEmbedder default
    real = attach_embeddings(chunks, client_factory=EmbeddingClient)
    assert fake.schema == real.schema
    assert _plan_shape(fake) == _plan_shape(real)
