"""Unit tests for chunking kernels K1/K2/K4/K5 and assembly K6."""

from deepdoc_api_spark.kernels.chunkers import (
    assemble_chunks,
    contextualize,
    fallback_chunks,
    hierarchical_chunks,
    hybrid_chunks,
    mineru_chunks,
)
from deepdoc_api_spark.kernels.pipeline import chunk_document
from deepdoc_api_spark.kernels.tokenizer import count_tokens, tokenize, truncate_tokens


def rec(kind, content, page=1, media_ref=""):
    return {
        "kind": kind,
        "content": content,
        "media_ref": media_ref,
        "page": page,
        "offset": page * 1000,
    }


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_words_and_punct():
    assert tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert count_tokens("") == 0
    assert count_tokens("a b c") == 3


def test_truncate_tokens():
    assert truncate_tokens("one two three four", 2) == "one two"
    assert truncate_tokens("short", 10) == "short"
    assert truncate_tokens("x", 0) == ""


# ---------------------------------------------------------------------------
# K2 hierarchical
# ---------------------------------------------------------------------------


def test_hierarchical_one_chunk_per_element_with_context():
    records = [
        rec("title", "1 Intro"),
        rec("text", "first paragraph"),
        rec("title", "1.1 Detail"),
        rec("text", "second paragraph"),
    ]
    chunks = hierarchical_chunks(records)
    assert [c["text"] for c in chunks] == [
        "1 Intro\nfirst paragraph",
        "1 Intro\n1.1 Detail\nsecond paragraph",
    ]
    assert chunks[1]["headings"] == ["1 Intro", "1.1 Detail"]


def test_heading_stack_trims_by_dotted_depth():
    records = [
        rec("title", "1 A"),
        rec("title", "1.1 B"),
        rec("title", "2 C"),  # depth 1 -> trims stack to []
        rec("text", "body"),
    ]
    chunks = hierarchical_chunks(records)
    assert chunks[0]["headings"] == ["2 C"]


def test_list_items_merge_into_one_element():
    records = [rec("list", "a"), rec("list", "b"), rec("text", "t" * 30)]
    chunks = hierarchical_chunks(records)
    assert chunks[0]["text"] == "a\nb"
    assert chunks[0]["kind"] == "list"
    assert len(chunks) == 2


def test_media_is_its_own_chunk():
    records = [rec("text", "a"), rec("media", "", media_ref="m://1"), rec("text", "b")]
    chunks = hierarchical_chunks(records)
    assert [c["kind"] for c in chunks] == ["text", "media", "text"]
    assert chunks[1]["media_ref"] == "m://1"


# ---------------------------------------------------------------------------
# K1 hybrid
# ---------------------------------------------------------------------------


def test_hybrid_merges_same_heading_peers():
    records = [
        rec("title", "H"),
        rec("text", "one two three"),
        rec("text", "four five six"),
    ]
    chunks = hybrid_chunks(records, budget=512)
    assert len(chunks) == 1
    assert chunks[0]["text"] == "H\none two three\nfour five six"


def test_hybrid_does_not_merge_across_headings():
    records = [
        rec("title", "A"),
        rec("text", "x"),
        rec("title", "B"),
        rec("text", "y"),
    ]
    chunks = hybrid_chunks(records, budget=512)
    assert [c["text"] for c in chunks] == ["A\nx", "B\ny"]


def test_hybrid_splits_oversized_and_respects_budget():
    words = " ".join(f"w{i}" for i in range(100))
    records = [rec("title", "H"), rec("text", words)]
    budget = 40
    chunks = hybrid_chunks(records, budget=budget)
    assert len(chunks) > 1
    for c in chunks:
        assert count_tokens(c["text"]) <= budget
    # all words preserved in order
    rejoined = " ".join(
        " ".join(c["text"].split("\n")[1:]) for c in chunks
    )
    assert rejoined.split() == words.split()


def test_hybrid_merge_stops_at_budget():
    # two elements that individually fit but together exceed the budget
    a = " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30))
    records = [rec("text", a), rec("text", b)]
    chunks = hybrid_chunks(records, budget=40)
    assert len(chunks) == 2


def test_hybrid_media_breaks_merge():
    records = [
        rec("text", "one"),
        rec("media", "", media_ref="m://x"),
        rec("text", "two"),
    ]
    chunks = hybrid_chunks(records, budget=512)
    assert [c["kind"] for c in chunks] == ["text", "media", "text"]


# ---------------------------------------------------------------------------
# K4 mineru
# ---------------------------------------------------------------------------


def test_mineru_chunk_text_prefix_and_pages():
    records = [
        rec("title", "T"),
        rec("text", "a", page=3),
        rec("text", "b", page=5),
    ]
    chunks = mineru_chunks(records, "doc-1")
    assert len(chunks) == 1
    # merged record page label "3 - 5" -> pages [3,4,5]
    assert chunks[0]["pages"] == [3, 4, 5]
    assert chunks[0]["text"] == "doc-1 >> T\na\nb"
    assert chunks[0]["hierarchy"] == ["T"]


def test_mineru_drops_empty_keeps_media():
    records = [rec("text", ""), rec("media", "", media_ref="m://1")]
    chunks = mineru_chunks(records, "d")
    # empty text record: content "\n" + "" strips to "" -> dropped
    assert [c["kind"] for c in chunks] == ["media"]


# ---------------------------------------------------------------------------
# K5 fallback — exact reference semantics (app/processing.py:2177-2203)
# ---------------------------------------------------------------------------


def test_fallback_boundaries_and_overlap():
    content = "word " * 400  # 2000 chars
    chunks = fallback_chunks(content)
    assert len(chunks) >= 2
    assert chunks[0]["chunk_overlap"] == 0
    assert all(c["chunk_overlap"] == 100 for c in chunks[1:])
    # word-boundary break: no chunk ends mid-word (content is all spaces)
    for c in chunks:
        assert not c["text"].endswith("wor")


def test_fallback_word_boundary_rule():
    # break at last space only if past the midpoint
    content = "a" * 990 + " " + "b" * 600
    chunks = fallback_chunks(content)
    # window [0,1000): last space at 990 > 500 -> end=991
    assert chunks[0]["text"] == "a" * 990
    # next start = 991-100 = 891 -> chunk from 891: "a"*99 + " " + "b"*600
    assert chunks[1]["text"].startswith("a" * 99 + " " + "b")


def test_fallback_no_space_window():
    content = "x" * 2500
    chunks = fallback_chunks(content)
    # reference quirk (app/processing.py:2198-2201): after the window
    # reaching EOF, start steps back by the overlap and emits one extra
    # overlap-sized tail chunk before start catches up to n
    assert [len(c["text"]) for c in chunks] == [1000, 1000, 700, 100]
    assert chunks[1]["text"] == "x" * 1000


def test_fallback_empty():
    assert fallback_chunks("") == []
    assert fallback_chunks("   ") == []


def test_fallback_short():
    chunks = fallback_chunks("hello world")
    assert len(chunks) == 1
    assert chunks[0]["text"] == "hello world"
    assert chunks[0]["chunk_overlap"] == 0


# ---------------------------------------------------------------------------
# K6 assembly
# ---------------------------------------------------------------------------


def test_assembly_drops_empty_dense_index_pages_fallback():
    chunks = [
        {"text": "  a  ", "pages": [3, 1, 3], "kind": "text", "media_ref": ""},
        {"text": "   ", "pages": [], "kind": "text", "media_ref": ""},
        {"text": "", "pages": [], "kind": "media", "media_ref": "m://1"},
        {"text": "b", "pages": None, "kind": "text", "media_ref": ""},
    ]
    out = assemble_chunks("doc-x", chunks, "hybrid")
    assert [c["chunk_index"] for c in out] == [0, 1, 2]
    assert out[0]["text"] == "a"
    assert out[0]["pages"] == [1, 3]
    assert out[0]["chunk_size"] == 1
    assert out[1]["kind"] == "media"  # empty text kept for media
    assert out[1]["pages"] == [1]  # fallback [1]
    assert out[2]["pages"] == [1]
    # deterministic ids
    out2 = assemble_chunks("doc-x", chunks, "hybrid")
    assert [c["chunk_id"] for c in out] == [c["chunk_id"] for c in out2]


# ---------------------------------------------------------------------------
# fused kernel + fallback cascade
# ---------------------------------------------------------------------------


def span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_chunk_document_end_to_end_hybrid():
    spans = [
        span("title", "1 Intro", 10),
        span("text", "alpha beta gamma", 20),
        span("media", "", 30, "media://d/1.png"),
        span("html", "<p>This html paragraph is long enough to keep.</p>", 40),
    ]
    out = chunk_document("doc-1", spans, "hybrid")
    assert out
    kinds = [c["kind"] for c in out]
    assert "media" in kinds
    assert all(c["chunker_type"] == "hybrid" for c in out)
    assert all(c["extractor_used"] == "primary" for c in out)
    assert [c["chunk_index"] for c in out] == list(range(len(out)))


def test_chunk_document_unknown_chunker_falls_to_hybrid():
    spans = [span("text", "hello world wide", 10)]
    out = chunk_document("d", spans, "bogus")
    assert out and out[0]["chunker_type"] == "hybrid"


def test_chunk_document_toc_empty_falls_back():
    # no section headers -> toc yields nothing -> K5 fallback over raw text
    spans = [span("text", "plain body text only", 10)]
    out = chunk_document("d", spans, "toc")
    assert out
    assert all(c["extractor_used"] == "fallback" for c in out)
    assert out[0]["text"] == "plain body text only"


def test_chunk_document_never_raises():
    out = chunk_document("d", [span(None, None, None)], "hybrid")
    assert isinstance(out, list)


def test_chunk_document_deterministic():
    spans = [
        span("html", "<p>Deterministic paragraph with enough text.</p>", 10),
        span("text", "tail words here", 20),
    ]
    assert chunk_document("d", spans, "hybrid") == chunk_document(
        "d", spans, "hybrid"
    )


# ---------------------------------------------------------------------------
# heading-snapshot immutability (round-6 ADVICE, made structural in r7)
# ---------------------------------------------------------------------------


def test_heading_snapshots_shared_and_structurally_immutable():
    import pytest

    from deepdoc_api_spark.kernels.chunkers import hierarchical_elements

    els = hierarchical_elements(
        [
            rec("title", "1. Alpha"),
            rec("text", "first body"),
            rec("list", "item one"),
            rec("title", "1.1 Beta"),
            rec("text", "second body"),
            rec("text", "third body"),
        ]
    )
    # elements under an unchanged stack alias ONE snapshot object (the
    # round-6 allocation win the id()-keyed ctx_tok cache relies on)
    assert els[0]["headings"] is els[1]["headings"]
    assert els[2]["headings"] is els[3]["headings"]
    assert els[0]["headings"] == ["1. Alpha"]
    assert els[2]["headings"] == ["1. Alpha", "1.1 Beta"]
    # ...and the snapshot still compares value-equal to a plain list in
    # BOTH directions (merge guards use ==)
    assert ["1. Alpha"] == els[0]["headings"]
    # any in-place mutation raises instead of silently corrupting every
    # sibling element of the heading run + the ctx_tok cache
    for mutate in (
        lambda h: h.append("x"),
        lambda h: h.extend(["x"]),
        lambda h: h.insert(0, "x"),
        lambda h: h.pop(),
        lambda h: h.remove("1. Alpha"),
        lambda h: h.clear(),
        lambda h: h.sort(),
        lambda h: h.reverse(),
        lambda h: h.__setitem__(0, "x"),
        lambda h: h.__delitem__(0),
        lambda h: h.__iadd__(["x"]),
    ):
        with pytest.raises(TypeError):
            mutate(els[0]["headings"])
    assert els[0]["headings"] == ["1. Alpha"]  # unharmed
