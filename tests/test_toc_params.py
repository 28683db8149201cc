"""toc_params parameterization (reference app/processing.py:751-771):
custom section_pattern and approved_sections through the full pipeline."""

from deepdoc_api_spark.job.pipeline import chunk_documents
from deepdoc_api_spark.kernels.pipeline import chunk_document


def span(kind, text, offset):
    return {"kind": kind, "text": text, "media_ref": "", "offset": offset}


SPANS = [
    span("title", "1 Alpha", 10),
    span("text", "alpha body", 20),
    span("title", "2 Beta", 30),
    span("text", "beta body", 40),
    span("title", "A. Annex", 50),
    span("text", "annex body", 60),
]


def test_approved_sections_by_cleaned_name():
    out = chunk_document(
        "d", SPANS, "toc", toc_params={"approved_sections": ["Beta"]}
    )
    assert len(out) == 1
    assert out[0]["text"].startswith("2 Beta\n")
    assert out[0]["extractor_used"] == "primary"


def test_approved_sections_by_full_name():
    out = chunk_document(
        "d", SPANS, "toc", toc_params={"approved_sections": ["1 Alpha"]}
    )
    assert [c["headings"][0] for c in out] == ["1 Alpha"]


def test_custom_section_pattern():
    spans2 = [
        span("title", "Section 1 Alpha", 10),
        span("text", "alpha body", 20),
        span("title", "Section 2 Beta", 30),
        span("text", "beta body", 40),
    ]
    out = chunk_document(
        "d", spans2, "toc", toc_params={"section_pattern": r"^(Section \d+)"}
    )
    assert [c["headings"][0] for c in out] == ["Section 1 Alpha", "Section 2 Beta"]


def test_pattern_crash_falls_back_like_reference():
    # a pattern whose numbering is non-numeric crashes the reference's
    # continuation repair (int('') at toc_chunker.py:103); the engine's
    # cascade degrades to the K5 fallback instead of failing the doc
    out = chunk_document(
        "d", SPANS, "toc", toc_params={"section_pattern": r"^([A-Z]\.)"}
    )
    assert out and all(c["extractor_used"] == "fallback" for c in out)


def test_empty_approved_falls_back_to_all():
    # mirrors toc_chunker.py:163-165: falsy approved -> get_sections
    base = chunk_document("d", SPANS, "toc")
    out = chunk_document("d", SPANS, "toc", toc_params={"approved_sections": []})
    assert [c["text"] for c in out] == [c["text"] for c in base]


def test_toc_params_through_spark(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import spans_from_documents

    spans = spans_from_documents(spark, sf_dir, num_partitions=4, limit=20)
    all_chunks = chunk_documents(spans, "toc").count()
    filtered = chunk_documents(
        spans, "toc", toc_params={"approved_sections": ["__no_such_section__"]}
    )
    rows = filtered.collect()
    # no section matches -> approved empty -> all sections (reference
    # falsy-fallback) — identical to the unfiltered run
    assert len(rows) == all_chunks
