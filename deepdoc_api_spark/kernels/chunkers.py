"""Chunking kernels — K1 hybrid, K2 hierarchical, K4 mineru, K5 fallback,
K6 chunk assembly.

The reference delegates K1/K2 to docling's HybridChunker /
HierarchicalChunker (``/root/reference/app/processing.py:740-791``) and
uses ``chunker.contextualize(chunk)`` — heading context prepended to
the chunk body — as the final text, ``.strip()``-ed
(``app/processing.py:805-812``). docling is unavailable and
non-hermetic, so the rebuild *specifies* deterministic equivalents with
the same observable shape (structure-first chunks, heading context,
token-aware merge/split under a budget) using the engine tokenizer.
The pytest suite defines span-sequence equality against THIS spec.

K5 (fixed-size fallback window chunker) replicates
``app/processing.py:2153-2203`` exactly. K4 (mineru record→chunk
assembly) replicates ``app/processing.py:985-1023``. K6 replicates
``app/processing.py:1543-1589``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .layout import format_records, parse_page_label
from .toc import DEFAULT_SECTION_PATTERN, _title_level
from .tokenizer import DEFAULT_TOKEN_BUDGET, count_tokens

# ---------------------------------------------------------------------------
# K2 — hierarchical elements (one element per block, heading context)
# ---------------------------------------------------------------------------


class _FrozenHeadings(list):
    """Structurally immutable heading snapshot (round-6 ADVICE).

    Elements alias ONE shared snapshot per heading run (the round-6
    allocation win that also collapses hybrid_chunks' id()-keyed
    ctx_tok cache). The invariant "no consumer mutates
    element['headings']" was previously enforced only by a comment —
    this subclass makes it structural: value-equal to a plain list
    (so ``==`` comparisons, Arrow conversion, and the golden oracle
    are untouched), but every in-place mutator raises."""

    def _frozen(self, *a, **k):
        raise TypeError(
            "element['headings'] is a shared immutable snapshot; "
            "copy it before modifying"
        )

    append = extend = insert = remove = _frozen
    pop = clear = sort = reverse = _frozen
    __setitem__ = __delitem__ = __iadd__ = __imul__ = _frozen

    def __reduce__(self):
        # pickle/copy/deepcopy rebuild list subclasses through
        # append/extend, which the mutator block above turns into
        # TypeErrors far from the cause (round-7 review). A serialized
        # or copied snapshot is detached from the sharing invariant
        # anyway, so round-trip as a PLAIN list.
        return (list, (list(self),))


def hierarchical_elements(
    records: List[Dict], pattern: str = DEFAULT_SECTION_PATTERN
) -> List[Dict]:
    """Structure pass shared by K1/K2.

    ``title`` records update a heading stack (trimmed to the header's
    level — dotted depth, else 1 — then pushed, docling-style).
    Non-title records become elements carrying the heading snapshot.
    Consecutive ``list`` records merge into one element (docling's
    ``merge_list_items=True`` default behavior). ``media`` records pass
    through as their own elements.

    **Caption attachment (G7, docling fidelity).** In docling's IR a
    caption is a TextItem referenced from a Table/Picture's
    ``captions`` list; the HierarchicalChunker does not emit caption
    items as their own chunks — they ride on the parent item's
    ``DocMeta.captions`` and ``contextualize()`` serializes
    headings + captions + body (docling-core
    ``chunking/hierarchical_chunker.py``; docs: "Concepts > Chunking").
    In this flat record stream the reference link is adjacency: a
    ``caption`` record attaches FORWARD to an immediately-following
    ``table``/``media`` record (MinerU caption-above-table order), else
    BACKWARD to an immediately-preceding table/media element under the
    same heading stack (figure caption below the image), else degrades
    to a plain ``text`` element. The current span corpus never emits
    ``caption`` spans (S4 passes title/text/list/table/media), so this
    path is golden-spec'd (tests/test_k1_golden.py G7) for a future
    docling differential rather than exercised by the driver queries.

    Element: ``{"kind","text","media_ref","pages","headings",
    "captions","_cap_tok"}``.
    """
    # The heading snapshot is the stack object ITSELF, shared by every
    # element under an unchanged stack (round 6): the title branch
    # always REBINDS (a fresh _FrozenHeadings per title), so handed-out
    # snapshots are immutable — structurally since round 7 (any
    # in-place mutation raises). Sharing halves the list allocations
    # here AND collapses hybrid_chunks' id()-keyed ctx_tok cache to one
    # entry per heading run instead of one per element.
    stack: List[str] = _FrozenHeadings()
    elements: List[Dict] = []
    pending_captions: List[Dict] = []

    def _attach_back(cap: Dict) -> bool:
        if (
            elements
            and elements[-1]["kind"] in ("table", "media")
            and elements[-1]["headings"] == stack
        ):
            elements[-1]["captions"].append(cap["content"])
            elements[-1]["_cap_tok"] += count_tokens(cap["content"])
            if cap["page"] not in elements[-1]["pages"]:
                elements[-1]["pages"].append(cap["page"])
            return True
        return False

    def _flush_pending() -> None:
        # pending captions whose next record turned out not to be a
        # table/media: fall back (docling: an unreferenced caption item
        # is just text)
        for cap in pending_captions:
            if not _attach_back(cap):
                elements.append(
                    {
                        "kind": "text",
                        "text": cap["content"],
                        "media_ref": cap["media_ref"],
                        "pages": [cap["page"]],
                        "headings": stack,
                        "captions": [],
                        "_cap_tok": 0,
                        "bbox": cap.get("bbox"),
                        "_tok": count_tokens(cap["content"]),
                    }
                )
        pending_captions.clear()

    for rec in records:
        kind = rec["kind"]
        if kind == "caption":
            pending_captions.append(rec)
            continue
        if kind == "title":
            _flush_pending()
            level = _title_level(rec["content"], pattern)
            new_stack = stack[: level - 1]  # slice of a subclass: plain list
            new_stack.append(rec["content"])
            stack = _FrozenHeadings(new_stack)
            continue
        if (
            kind == "list"
            and elements
            and not pending_captions
            and elements[-1]["kind"] == "list"
            and elements[-1]["headings"] == stack
        ):
            prev = elements[-1]
            prev["text"] += "\n" + rec["content"]
            # token counts are additive across whitespace joins (tokens
            # never span a "\n"), so incremental bookkeeping is exact
            prev["_tok"] += count_tokens(rec["content"])
            if rec["page"] not in prev["pages"]:
                prev["pages"].append(rec["page"])
            continue
        captions: List[str] = []
        cap_tok = 0
        cap_pages: List[int] = []
        if pending_captions:
            if kind in ("table", "media"):
                captions = [c["content"] for c in pending_captions]
                cap_tok = sum(count_tokens(c["content"]) for c in pending_captions)
                # caption pages join the element's provenance exactly as
                # the backward-attach path records them (G7 symmetry)
                cap_pages = [c["page"] for c in pending_captions]
                pending_captions.clear()
            else:
                _flush_pending()
        pages = [rec["page"]]
        for p in cap_pages:
            if p not in pages:
                pages.append(p)
        elements.append(
            {
                "kind": kind,
                "text": rec["content"],
                "media_ref": rec["media_ref"],
                "pages": pages,
                "headings": stack,
                "captions": captions,
                "_cap_tok": cap_tok,
                # O9: element keeps the FIRST record's bbox; merges below
                # never overwrite it (reference: first provenance item,
                # app/processing.py:1158-1166)
                "bbox": rec.get("bbox"),
                "_tok": count_tokens(rec["content"]) if kind != "media" else 0,
            }
        )
    _flush_pending()
    return elements


def contextualize(
    headings: List[str], text: str, captions: List[str] = ()
) -> str:
    """docling-style contextualization: headings, then attached captions,
    then body, newline-joined (docling-core ``BaseChunker.contextualize``
    serializes ``meta.headings + meta.captions + chunk.text``)."""
    parts = [h for h in headings if h]
    parts.extend(captions)
    parts.append(text)
    return "\n".join(parts)


def hierarchical_chunks(
    records: List[Dict], pattern: str = DEFAULT_SECTION_PATTERN
) -> List[Dict]:
    """K2 — one contextualized chunk per element, no token budgeting."""
    chunks: List[Dict] = []
    for el in hierarchical_elements(records, pattern):
        if el["kind"] == "media":
            # captioned media (G7): the caption is the picture's only
            # serializable content — headings + captions; uncaptioned
            # media keeps the empty-text zero-cost contract (G6)
            cap = el["captions"]
            text = "\n".join([h for h in el["headings"] if h] + cap) if cap else ""
            chunks.append(
                {
                    "text": text,
                    "headings": el["headings"],
                    "hierarchy": None,
                    "pages": el["pages"],
                    "kind": "media",
                    "media_ref": el["media_ref"],
                    "bbox": el.get("bbox"),
                }
            )
            continue
        chunks.append(
            {
                "text": contextualize(el["headings"], el["text"], el["captions"]),
                "headings": el["headings"],
                "hierarchy": None,
                "pages": el["pages"],
                "kind": el["kind"],
                "media_ref": el["media_ref"],
                "bbox": el.get("bbox"),
            }
        )
    return chunks


# ---------------------------------------------------------------------------
# K1 — hybrid: token-aware split + peer merge under a budget
# ---------------------------------------------------------------------------


def _split_oversized(el: Dict, budget: int, ctx_tokens: int) -> List[Dict]:
    """Split an element whose contextualized text exceeds the budget.

    Body is repacked greedily on whitespace word boundaries so that
    each piece's contextualized token count fits the budget. Word
    joining uses single spaces (spec'd: only oversized elements are
    re-whitespaced).

    OWNERSHIP: the fits-budget fast path returns the ORIGINAL element
    dict (no defensive copy — measured kernel-CPU win, round 3), and
    the caller's merge loop then mutates text/_tok/pages in place. So
    every element passed in is CONSUMED: callers must hand over freshly
    built dicts (hierarchical_elements does) and must not reuse them
    after the call — a retry/cascade path that replays the same element
    list would see merged state. Enforced by the ownership contract in
    :func:`hybrid_chunks`'s docstring rather than a copy here.
    """
    avail = max(budget - ctx_tokens, 32)
    if el["_tok"] <= avail:
        return [el]
    pieces: List[Dict] = []
    current: List[str] = []
    current_tokens = 0

    def piece() -> Dict:
        # mutable fields get OWN copies: the downstream merge loop appends
        # to a piece's "pages" in place, and a shared list would leak pages
        # into every sibling piece of the split
        return {
            **el,
            "text": " ".join(current),
            "_tok": current_tokens,
            "pages": list(el["pages"]),
        }

    for word in el["text"].split():
        wt = count_tokens(word)
        if current and current_tokens + wt > avail:
            pieces.append(piece())
            current = [word]
            current_tokens = wt
        else:
            current.append(word)
            current_tokens += wt
    if current:
        pieces.append(piece())
    return pieces


def hybrid_chunks(
    records: List[Dict],
    budget: int = DEFAULT_TOKEN_BUDGET,
    pattern: str = DEFAULT_SECTION_PATTERN,
) -> List[Dict]:
    """K1 — hierarchical elements → split oversized → merge same-heading
    peers while the merged contextualized text fits the budget.

    BUDGET INVARIANT (precise form): each chunk's BODY token count fits
    ``budget - context``, floored at 32 — context (headings + attached
    captions) is repeated on every split piece and is itself never
    split, exactly docling's behavior (meta rides whole on each piece).
    Consequently a chunk whose context ALONE exceeds the budget is
    over-budget by construction: a text element under pathological
    heading stacks, a table with a giant caption, or a captioned media
    element (pure-context chunk, body empty). Pinned by
    tests/test_k1_golden.py G9.

    OWNERSHIP: the merge loop mutates element dicts in place (no
    defensive copies — round-3 kernel-CPU win). Safe because
    ``hierarchical_elements`` builds fresh dicts per call; any future
    caller feeding externally owned elements must copy first (see
    :func:`_split_oversized`'s fits-budget fast path, which returns the
    original dict)."""
    elements = hierarchical_elements(records, pattern)

    # heading-context token counts, cached per distinct stack object
    # (token counts are additive across "\n" joins, so the context cost
    # is the sum of heading counts — no re-tokenization of joined text)
    ctx_cache: Dict[int, int] = {}

    def ctx_tok(headings: List[str]) -> int:
        key = id(headings)
        v = ctx_cache.get(key)
        if v is None:
            v = sum(count_tokens(h) for h in headings)
            ctx_cache[key] = v
        return v

    split_elements: List[Dict] = []
    for el in elements:
        if el["kind"] == "media":
            split_elements.append(el)
        else:
            # captions are context like headings: charged to the budget
            # and repeated on every split piece (docling serializes
            # headings + captions + body)
            split_elements.extend(
                _split_oversized(
                    el, budget, ctx_tok(el["headings"]) + el["_cap_tok"]
                )
            )

    merged: List[Dict] = []
    for el in split_elements:
        if (
            merged
            and el["kind"] != "media"
            and merged[-1]["kind"] == el["kind"]
            and merged[-1]["headings"] == el["headings"]
            and merged[-1]["captions"] == el["captions"]
        ):
            prev = merged[-1]
            if (
                ctx_tok(el["headings"]) + el["_cap_tok"]
                + prev["_tok"] + el["_tok"]
            ) <= budget:
                prev["text"] = prev["text"] + "\n" + el["text"]
                prev["_tok"] += el["_tok"]
                for p in el["pages"]:
                    if p not in prev["pages"]:
                        prev["pages"].append(p)
                continue
        # no defensive copy: elements/split pieces are owned by this call
        # and never re-read after the merge loop mutates them
        merged.append(el)

    chunks: List[Dict] = []
    for el in merged:
        if el["kind"] == "media":
            cap = el["captions"]
            text = "\n".join([h for h in el["headings"] if h] + cap) if cap else ""
            chunks.append(
                {
                    "text": text,
                    "headings": el["headings"],
                    "hierarchy": None,
                    "pages": el["pages"],
                    "kind": "media",
                    "media_ref": el["media_ref"],
                    "bbox": el.get("bbox"),
                }
            )
        else:
            chunks.append(
                {
                    "text": contextualize(el["headings"], el["text"], el["captions"]),
                    "headings": el["headings"],
                    "hierarchy": None,
                    "pages": el["pages"],
                    "kind": el["kind"],
                    "media_ref": el["media_ref"],
                    "bbox": el.get("bbox"),
                }
            )
    return chunks


# ---------------------------------------------------------------------------
# K4 — mineru path: layout fold output → chunks
# ---------------------------------------------------------------------------


def mineru_chunks(records: List[Dict], doc_name: str) -> List[Dict]:
    """K4 — each formatted layout record becomes one chunk.

    Mirrors ``app/processing.py:985-1023``: empty content skipped, page
    labels (possibly ``"a - b"`` ranges) expanded to int lists, text =
    ``doc_name + " >> " + content``. ``doc_name`` plays the reference's
    ``original_filename`` role (the span table has no filenames; the
    doc_id is the stable identity). Media records (spec extension) pass
    through with empty text.
    """
    formatted = format_records(records)
    chunks: List[Dict] = []
    for item in formatted:
        if item["type"] == "media":
            chunks.append(
                {
                    "text": "",
                    "headings": None,
                    "hierarchy": item.get("hierarchy"),
                    "pages": parse_page_label(item["page"]),
                    "kind": "media",
                    "media_ref": item.get("media_ref", ""),
                    "bbox": item.get("bbox"),
                }
            )
            continue
        content = item.get("content", "").strip()
        if not content:
            continue
        chunks.append(
            {
                "text": doc_name + " >> " + content,
                "headings": None,
                "hierarchy": item.get("hierarchy"),
                "pages": parse_page_label(item["page"]),
                "kind": item["type"],
                "media_ref": item.get("media_ref", ""),
                "bbox": item.get("bbox"),
            }
        )
    return chunks


# ---------------------------------------------------------------------------
# K5 — fixed-size fallback window chunker (exact: app/processing.py:2153-2203)
# ---------------------------------------------------------------------------

FALLBACK_CHUNK_SIZE = 1000
FALLBACK_OVERLAP = 100


def fallback_chunks(
    content: str,
    chunk_size: int = FALLBACK_CHUNK_SIZE,
    overlap: int = FALLBACK_OVERLAP,
) -> List[Dict]:
    """K5 — character windows with word-boundary break past the midpoint
    and overlap stepping, exactly as ``app/processing.py:2177-2203``."""
    chunks: List[Dict] = []
    start = 0
    n = len(content or "")

    while start < n:
        end = min(start + chunk_size, n)

        if end < n:
            break_pos = content.rfind(" ", start, end)
            if break_pos != -1 and break_pos > start + chunk_size // 2:
                end = break_pos + 1

        chunk_text = content[start:end].strip()
        if chunk_text:
            chunks.append(
                {
                    "text": chunk_text,
                    "headings": None,
                    "hierarchy": None,
                    "pages": [1],
                    "kind": "text",
                    "media_ref": "",
                    "chunk_overlap": overlap if start > 0 else 0,
                }
            )

        new_start = end - overlap
        start = end if new_start <= start else new_start
        if start <= 0:
            start = end

    return chunks


# ---------------------------------------------------------------------------
# K6 — chunk record assembly
# ---------------------------------------------------------------------------


def assemble_chunks(
    doc_id: str,
    chunks: List[Dict],
    chunker_type: str,
    extractor_used: str = "primary",
) -> List[Dict]:
    """K6 — final output records.

    Mirrors ``app/processing.py:1543-1589``: text stripped, empty-text
    chunks dropped (media chunks exempt — spec extension), pages
    sorted/dedup'd with ``[1]`` fallback, ``chunk_size = len(text)``,
    ``chunk_overlap`` 0 unless the chunker set one. Divergence: ids are
    the deterministic composite ``doc_id:chunker:index`` instead of
    ``uuid4`` (``app/processing.py:1560`` is non-reproducible by
    design; ids are outside the equality tuple — and a readable
    composite beats an opaque hash at zero hashing cost).
    """
    out: List[Dict] = []
    idx = 0
    for ch in chunks:
        text = (ch.get("text") or "").strip()
        kind = ch.get("kind") or "text"
        if not text and kind != "media":
            continue
        pages = ch.get("pages") or []
        if len(pages) == 1:  # fast path: the overwhelmingly common case
            pages = [int(pages[0])]
        else:
            pages = sorted({int(p) for p in pages}) or [1]
        chunk_id = f"{doc_id}:{chunker_type}:{idx}"
        out.append(
            {
                "chunk_id": chunk_id,
                "doc_id": doc_id,
                "chunk_index": idx,
                "kind": kind,
                "text": text,
                "media_ref": ch.get("media_ref") or "",
                "pages": pages,
                "hierarchy": ch.get("hierarchy"),
                "headings": ch.get("headings"),
                "chunker_type": chunker_type,
                "chunk_size": len(text),
                "chunk_overlap": int(ch.get("chunk_overlap") or 0),
                "bbox": ch.get("bbox"),
                "extractor_used": extractor_used,
            }
        )
        idx += 1
    return out
