"""Property-based invariants (SURVEY §5 item 3) over randomized span
corpora — pure-kernel, hypothesis-driven, fixed seed derivation."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepdoc_api_spark.kernels.pipeline import chunk_document
from deepdoc_api_spark.kernels.tokenizer import DEFAULT_TOKEN_BUDGET, count_tokens

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@st.composite
def span_lists(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    spans = []
    offset = 0
    for i in range(n):
        offset += draw(st.integers(min_value=1, max_value=600))
        kind = draw(
            st.sampled_from(
                ["text", "title", "list", "table", "media", "html", "unknown"]
            )
        )
        if kind == "media":
            text = ""
            ref = f"media://x/{i}"
        elif kind == "html":
            body = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=5, max_size=30)))
            text = f"<p>{body}</p>"
            ref = ""
        elif kind == "title":
            text = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=4))).title()
            if draw(st.booleans()):
                text = f"{draw(st.integers(1, 9))}.{draw(st.integers(1, 9))} " + text
            ref = ""
        else:
            text = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=50)))
            ref = ""
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": offset})
    return spans


@settings(max_examples=120, deadline=None)
@given(spans=span_lists(), chunker=st.sampled_from(["hybrid", "hierarchical", "toc", "mineru", "fallback"]))
def test_universal_invariants(spans, chunker):
    out = chunk_document("doc-p", spans, chunker)
    # dense ordered chunk_index
    assert [c["chunk_index"] for c in out] == list(range(len(out)))
    for c in out:
        # pages sorted, deduped, 1-based, non-empty
        assert c["pages"] == sorted(set(c["pages"]))
        assert all(p >= 1 for p in c["pages"])
        assert c["pages"]
        # chunk_size = len(text); text stripped; empties only for media
        assert c["chunk_size"] == len(c["text"])
        assert c["text"] == c["text"].strip()
        if c["kind"] != "media":
            assert c["text"]
        # deterministic ids unique within doc
    ids = [c["chunk_id"] for c in out]
    assert len(ids) == len(set(ids))


@settings(max_examples=100, deadline=None)
@given(spans=span_lists())
def test_idempotent_and_deterministic(spans):
    a = chunk_document("doc-p", spans, "hybrid")
    b = chunk_document("doc-p", spans, "hybrid")
    assert a == b


@settings(max_examples=100, deadline=None)
@given(spans=span_lists())
def test_media_refs_preserved_in_order_hybrid(spans):
    out = chunk_document("doc-p", spans, "hybrid")
    if any(c["extractor_used"] != "primary" for c in out):
        return  # fallback path: raw text join, media not guaranteed
    want = [s["media_ref"] for s in spans if s["kind"] == "media"]
    have = [c["media_ref"] for c in out if c["kind"] == "media" and c["media_ref"].startswith("media://")]
    it = iter(have)
    assert all(ref in it for ref in want)


@settings(max_examples=100, deadline=None)
@given(spans=span_lists())
def test_token_budget_respected(spans):
    # generator words are short and headings small, so the budget holds
    out = chunk_document("doc-p", spans, "hybrid")
    if any(c["extractor_used"] != "primary" for c in out):
        return
    for c in out:
        assert count_tokens(c["text"]) <= DEFAULT_TOKEN_BUDGET


@settings(max_examples=60, deadline=None)
@given(spans=span_lists())
def test_word_sequence_preserved_for_pdf_text_spans(spans):
    """hybrid: the word sequence of consecutive pdf text/list spans
    survives extraction+chunking (merges/splits move whitespace only)."""
    out = chunk_document("doc-p", spans, "hybrid")
    if any(c["extractor_used"] != "primary" for c in out):
        return
    in_words = []
    for s in spans:
        if s["kind"] in ("text", "list") and s["text"]:
            in_words.extend(s["text"].split())
    out_words = []
    for c in out:
        if c["kind"] in ("text", "list"):
            body_lines = c["text"].split("\n")
            # drop heading-context lines: they equal the headings meta
            ctx = c["headings"] or []
            out_words.extend(" ".join(body_lines[len(ctx):]).split())
    # every input word appears (multiset-subset, order preserved)
    it = iter(out_words)
    assert all(w in it for w in in_words)


@settings(max_examples=80, deadline=None)
@given(text=st.text(alphabet="ab c.\n", min_size=0, max_size=3000))
def test_fallback_window_covers_content(text):
    from deepdoc_api_spark.kernels.chunkers import fallback_chunks

    chunks = fallback_chunks(text)
    # overlap only between adjacent chunks; first has 0
    if chunks:
        assert chunks[0]["chunk_overlap"] == 0
        assert all(c["chunk_overlap"] == 100 for c in chunks[1:])
    # concatenation of chunks covers all non-space content in order
    joined = "".join(c["text"] for c in chunks)
    for ch in set(text) - {" ", "\n"}:
        assert joined.count(ch) >= text.count(ch) - 0  # no loss of non-ws chars


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_count_tokens_subn_equals_findall(text):
    """Round-6 perf rewrite pin: ``count_tokens`` switched from
    ``len(findall)`` to ``subn`` counting (same pattern, one residue
    allocation instead of per-token strings). The two MUST agree on
    arbitrary unicode — a divergence would silently move every split
    boundary in the budget-shaped chunkers."""
    import re

    from deepdoc_api_spark.kernels import tokenizer

    assert tokenizer.count_tokens(text) == len(
        tokenizer._TOKEN_RE.findall(text or "")
    )
