"""PDF-layout span operators (reading order, suppression, hierarchy, merge).

Re-implements — from observed behavior, not copied code — the semantics
of the reference's MinerU layout post-processor
(``/root/reference/app/mineru_adapter/layout_processor.py``):

* O2 reading-order recovery: blocks sorted by (y0, x0) per page
  (``layout_processor.py:70-86``). In the span-table input model the
  corpus is already offset-ordered, and ``offset`` encodes reading
  order, so O2 reduces to a stable sort by (page, offset) — the
  generator folds (y0, x0) into offset.
* O3 span extraction by block type (``layout_processor.py:88-129``):
  ``title``/``text`` → one record per span; ``list`` → records;
  ``table`` → HTML content + image_path; other kinds dropped.
* O4 repeated-header suppression: contents of title/text spans counted
  per document; any content occurring more than ``MAX_OCCURRENCES`` (3)
  times is blacklisted from the title hierarchy
  (``layout_processor.py:131-134``).
* O5 title-hierarchy tracking incl. the main-title special case
  (``layout_processor.py:141-153``).
* O6 adjacent same-type merge (plus text→list merge) with
  ``"start - end"`` page-range labels (``layout_processor.py:154-167``).

The fold in :func:`format_records` reproduces the reference's control
flow *exactly*, including its quirks (e.g. a suppressed title whose
predecessor was also a title merges into the most recent formatted
record regardless of that record's type — observable behavior of
``layout_processor.py:154-167`` given that accepted titles never enter
the formatted list). The only spec'd extensions are for ``media``
records, which do not exist in the reference: they never merge, pass
through in order with empty text, and reset adjacency.

Page convention of the span-table corpus: ``page = offset // PAGE_SIZE + 1``
(1-based, PAGE_SIZE=1000), mirroring the reference's
``page_idx + 1`` 1-basing (``layout_processor.py:68``).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

from .bbox import span_bbox
from .html_extract import extract_html_blocks

PAGE_SIZE = 1000
MAX_OCCURRENCES = 3  # layout_processor.py:133

#: PDF-layout block kinds understood by the extraction stage. Any other
#: non-html, non-media kind is dropped (layout_processor.py:88-129 only
#: handles title/text/list/table).
PDF_KINDS = ("title", "text", "list", "table")


def page_of_offset(offset: int) -> int:
    """1-based page number encoded by a span offset."""
    return (offset or 0) // PAGE_SIZE + 1


def span_to_records(
    kind: str, text: str, media_ref: Optional[str], offset: int
) -> List[Dict]:
    """Normalize one input span into zero or more block records.

    Per-span independent (no document state) — this is the shardable
    half of extraction; giant documents run it on span shards in
    parallel (see job.pipeline).

    Returns records ``{"kind","content","media_ref","page","offset"}``.
    ``html`` spans fan out into their extracted blocks; PDF-layout spans
    map 1:1; ``media`` spans pass through; unknown kinds are dropped.
    """
    page = page_of_offset(offset)
    media_ref = media_ref or ""
    # O9: per-span canonical bbox provenance (synthesized from offset,
    # normalized through the reference's 4-convention probing — bbox.py)
    bbox = span_bbox(offset)
    out: List[Dict] = []
    if kind == "html":
        for blk in extract_html_blocks(text or ""):
            out.append(
                {
                    "kind": blk["kind"],
                    "content": blk["text"],
                    "media_ref": blk["media_ref"],
                    "page": page,
                    "offset": offset,
                    "bbox": bbox,
                }
            )
    elif kind == "media":
        out.append(
            {
                "kind": "media",
                "content": "",
                "media_ref": media_ref,
                "page": page,
                "offset": offset,
                "bbox": bbox,
            }
        )
    elif kind in PDF_KINDS:
        out.append(
            {
                "kind": kind,
                "content": text or "",
                "media_ref": media_ref,
                "page": page,
                "offset": offset,
                "bbox": bbox,
            }
        )
    # other kinds: dropped (layout_processor.py handles only the four
    # block types; everything else is ignored)
    return out


def extract_records(spans: List[Dict]) -> List[Dict]:
    """Normalize a whole document's span sequence into block records.

    ``spans``: list of ``{"kind","text","media_ref","offset"}`` in
    document order (offset-increasing). Output preserves order.
    """
    records: List[Dict] = []
    for s in spans:
        records.extend(
            span_to_records(
                s.get("kind") or "",
                s.get("text") or "",
                s.get("media_ref"),
                s.get("offset") or 0,
            )
        )
    return records


def format_records(records: List[Dict]) -> List[Dict]:
    """The layout formatting fold: suppression + hierarchy + merge.

    Input: normalized block records from :func:`extract_records`.
    Output: formatted records ``{"page": str, "content": str, "type":
    str, "hierarchy": list[str], "media_ref": str}`` matching the
    observable output of ``LayoutProcessor.process_layout``
    (``layout_processor.py:131-176``) on an equivalent block stream,
    extended with media pass-through.
    """
    # O4: count title/text contents (both kinds feed the blacklist —
    # layout_processor.py:100-102 appends inside the title/text branch)
    counter: Counter = Counter()
    for rec in records:
        if rec["kind"] in ("title", "text"):
            counter[rec["content"]] += 1
    ignored = {c for c, n in counter.items() if n > MAX_OCCURRENCES}

    formatted: List[Dict] = []
    last_type = ""
    main_title = False
    hierarchy: List[str] = []

    for rec in records:
        rtype = rec["kind"]
        content = rec["content"]
        page = str(rec["page"])

        if rtype == "title" and content not in ignored:
            # O5 — layout_processor.py:142-153, replicated exactly
            if hierarchy and last_type != "title":
                if main_title and len(hierarchy) > 1:
                    hierarchy = hierarchy[:-1]
                    if len(hierarchy) > 2:
                        hierarchy = hierarchy[-1:]
                    main_title = False
                else:
                    hierarchy.pop()
            else:
                main_title = True
            hierarchy.append(content)
        elif rtype == "media":
            # spec extension: media never merges, keeps empty content,
            # records the hierarchy snapshot, resets adjacency
            formatted.append(
                {
                    "page": page,
                    "content": "",
                    "type": "media",
                    "hierarchy": list(hierarchy),
                    "media_ref": rec["media_ref"],
                    "bbox": rec.get("bbox"),
                }
            )
        elif (rtype == last_type and rtype != "media" and formatted) or (
            last_type == "text" and rtype == "list"
        ):
            # O6 — layout_processor.py:154-167. The merged record keeps
            # the FIRST contributor's bbox (reference chunks take the
            # first provenance item, app/processing.py:1158-1166)
            last = formatted.pop()
            last["content"] += "\n" + content
            last_page = last["page"]
            if last_page != page:
                if " - " in last_page:
                    last_page = last_page.split(" - ")[0]
                last["page"] = last_page + " - " + page
            formatted.append(last)
        else:
            formatted.append(
                {
                    "page": page,
                    "content": " >> ".join(hierarchy) + "\n" + content,
                    "type": rtype,
                    "hierarchy": list(hierarchy),
                    "media_ref": rec["media_ref"],
                    "bbox": rec.get("bbox"),
                }
            )

        last_type = rtype

    return formatted


def sort_reading_order(records: List[Dict]) -> List[Dict]:
    """O2 — reading-order recovery: stable sort by (page, y0, x0).

    Mirrors ``layout_processor.py:70-86`` (blocks sorted by bbox
    top-then-left within each page; ties keep input order — Python's
    sort is stable, like the reference's ``sorted``). The span-table
    corpus arrives offset-ordered so the pipeline normally skips this,
    but layout sources that emit blocks in detection order (not reading
    order) run it between extraction and the fold."""
    def key(rec: Dict):
        bbox = rec.get("bbox") or {}
        return (
            rec.get("page") or 0,
            bbox.get("top") if bbox.get("top") is not None else 0.0,
            bbox.get("left") if bbox.get("left") is not None else 0.0,
        )

    return sorted(records, key=key)


def parse_page_label(page_str: str) -> List[int]:
    """Expand a page label (``"3"`` or ``"3 - 5"``) into page ints.

    Mirrors ``app/processing.py:993-1002`` (``int`` tolerates the
    surrounding spaces of the ``" - "`` separator; failures fall back to
    ``[1]``).
    """
    try:
        s = str(page_str)
        if "-" in s:
            start_s, end_s = s.split("-")
            start, end = int(start_s), int(end_s)
            return list(range(start, end + 1))
        return [int(s)]
    except (ValueError, TypeError):
        return [1]
