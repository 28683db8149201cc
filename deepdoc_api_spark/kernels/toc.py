"""TOC (section-header-driven) chunker — K3.

Provenance: ``process_sections`` and parts of ``get_sections`` are
ADAPTED FROM the reference implementation
(``/root/reference/app/toc_chunker.py:30-73,75-158``, TrueSelph/
deepdoc_api, Apache-2.0) — deliberately close to the original control
flow, variable names included, because the contract here is exact
observable equality with that code, down to its remove-while-iterating
quirk (pinned by a 60-seed differential suite executing the reference
itself). The surrounding record-sequence adaptation, parameterization,
and dispatch are new.

Re-implements the observable semantics of the reference's custom
``TOCChunker`` (``/root/reference/app/toc_chunker.py``) over the
engine's normalized block-record sequence instead of a DoclingDocument:

* section headers = ``title`` records; dotted numbering detected by
  ``^(\\d+(?:\\.\\d+)*)`` (``toc_chunker.py:24``);
* hierarchy stack trimmed to dotted depth (``toc_chunker.py:112-114``);
* continuation-header repair: an un-numbered header followed by a
  numbered one inherits the expected previous number
  (``toc_chunker.py:95-110``);
* duplicate-section removal at >= ``max_repeats`` occurrences of the
  cleaned (number-stripped) name, reproducing the reference's
  remove-during-iteration behavior exactly (``toc_chunker.py:140-154``
  mutates the list it iterates, skipping the element after each
  removal — observable, so preserved);
* same-number merge with word-dedup (``process_sections``,
  ``toc_chunker.py:30-73``);
* content gather: records after the header until the next header of
  same-or-higher level; deeper headers contribute their text as content
  (``toc_chunker.py:182-201`` — any item with ``.text`` is gathered);
* chunk text = ``"\\n".join(hierarchy + [name]) + "\\n" + content`` with
  content parts joined by ``"\\n\\n"`` and stripped; empty sections
  skipped (``toc_chunker.py:203-208``).

Divergence (spec'd): the reference uses docling's ``item.level`` for
the gather cutoff; in the span-table model header level is defined as
the dotted-numbering depth (``"3.4.1"`` → 3) and 1 for un-numbered
headers. Media records carry no text and are skipped by the gather,
mirroring the reference's ``hasattr(item, "text")`` probe.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

DEFAULT_SECTION_PATTERN = r"^(\d+(?:\.\d+)*)"


def _match_numbering(m: "re.Match") -> str:
    """The section-number text of a header match.

    Group 1 when the pattern captures one (the default pattern does);
    otherwise the whole match — a user-supplied ``section_pattern``
    without a capturing group must not raise (an IndexError here would
    silently demote every document to the K5 fallback via the cascade).
    """
    if m.re.groups:
        g = m.group(1)
        if g is not None:
            return g
    return m.group(0)


def _title_level(name: str, pattern: str) -> int:
    m = re.match(pattern, name)
    if m:
        return len(_match_numbering(m).split("."))
    return 1


def process_sections(sections_list: List[Dict], pattern: str) -> List[Dict]:
    """Merge consecutive sections sharing a section number.

    Mirrors ``TOCChunker.process_sections`` (``toc_chunker.py:30-73``):
    same number → pop previous, word-dedup the new name against it,
    concatenate.
    """
    last_match = None
    sections: List[Dict] = []

    for item in sections_list:
        name = item["name"].strip()
        if not name:
            continue

        match = re.match(pattern, name)
        if match:
            current_match = match.group()
            if last_match == current_match and sections:
                last_section = sections.pop()
                remaining_text = name
                for word in last_section["name"].split():
                    if word in remaining_text:
                        remaining_text = remaining_text.replace(word, "").strip()
                combined_name = last_section["name"] + " " + remaining_text
                combined_section = {**last_section, "name": combined_name}
                sections.append(combined_section)
            else:
                sections.append(item)
                last_match = current_match
        else:
            sections.append(item)

    return sections


def get_sections(
    records: List[Dict],
    pattern: str = DEFAULT_SECTION_PATTERN,
    max_repeats: int = 2,
) -> List[Dict]:
    """Extract section descriptors from the record sequence.

    Mirrors ``TOCChunker.get_sections`` (``toc_chunker.py:75-158``).
    Each descriptor: ``{"name", "hierarchy", "page_no", "level",
    "idx"}`` where ``idx`` is the record index of the header (the
    identity the reference keeps via ``section_item``).
    """
    hierarchy_stack: List[str] = []
    results: List[Dict] = []
    last_match = None

    for i, rec in enumerate(records):
        if rec["kind"] != "title":
            continue
        sec = rec["content"]
        page_no = rec["page"]
        match = re.match(pattern, sec)

        if match:
            numbering = _match_numbering(match)
            parts = numbering.split(".")
            depth = len(parts)

            # continuation repair — toc_chunker.py:95-110
            if results and not results[-1]["hierarchy"] and not last_match:
                results[-1]["hierarchy"] = hierarchy_stack[:-1]
                current_parts = numbering.split(".")
                current_parts.pop()
                last_expected_rank = int(parts[-1]) - 1
                if last_expected_rank != 0:
                    current_parts.append(str(last_expected_rank))
                last_name = ".".join(current_parts)
                if last_name:
                    results[-1]["name"] = last_name + " " + results[-1]["name"]

            hierarchy_stack = hierarchy_stack[: depth - 1]
            hierarchy_stack.append(sec)

            results.append(
                {
                    "name": sec,
                    "hierarchy": hierarchy_stack[:-1],
                    "page_no": page_no,
                    "level": depth,
                    "idx": i,
                }
            )
        else:
            results.append(
                {
                    "name": sec,
                    "hierarchy": [],
                    "page_no": page_no,
                    "level": 1,
                    "idx": i,
                }
            )

        last_match = match

    # duplicate-section removal — toc_chunker.py:140-154. The reference
    # removes from `results` while iterating it; that skip-on-remove
    # behavior is observable and reproduced here on purpose — but NOT
    # its cost: the reference recomputes the cleaned name for every
    # item × every repeated name (1.6M re.sub calls on a 20k-span doc,
    # the dominant TOC straggler term). Cleaned names are computed once
    # (items are never mutated, only removed), and the iterate-and-
    # remove quirk is emulated exactly: removing at position i makes
    # the reference's iterator skip the element that slides into i
    # (descriptors are unique — `idx` differs — so list.remove(item)
    # removed precisely the current element).
    cleaned: Dict[int, str] = {
        id(item): re.sub(pattern, "", item["name"]).strip() for item in results
    }
    section_counts = Counter(cleaned[id(item)] for item in results)
    for section_name, count in section_counts.items():
        if count >= max_repeats:
            i = 0
            while i < len(results):
                if cleaned[id(results[i])] == section_name:
                    del results[i]
                    i += 1  # reference iterator skips the slid-in element
                else:
                    i += 1

    return process_sections(results, pattern)


def toc_chunks(
    records: List[Dict],
    pattern: str = DEFAULT_SECTION_PATTERN,
    approved_sections: List[Dict] | None = None,
    max_repeats: int = 2,
) -> List[Dict]:
    """Chunk the record sequence by approved sections.

    Mirrors ``TOCChunker.chunk`` (``toc_chunker.py:160-218``). Returns
    chunk dicts ``{"text", "headings", "hierarchy", "pages", "kind",
    "media_ref"}``.
    """
    sections = approved_sections
    if not sections:
        sections = get_sections(records, pattern, max_repeats)
    if not isinstance(sections, list):
        sections = []

    # One-pass indexes replacing the reference's per-section rescan of
    # the whole record list (O(sections × records) — a quadratic
    # straggler on giant documents; a 20k-span doc with ~2.4k sections
    # costs ~5×10^7 record visits). Semantics are IDENTICAL to the
    # rescan (pinned by the 60-seed reference differential):
    # * gather = non-media records strictly after the header until the
    #   first title of same-or-higher level (deeper titles contribute
    #   their content);
    # * break search touches only TITLE records (early-exit), content
    #   extraction is a bisected slice of the non-media content list.
    import bisect

    title_pos: List[int] = []
    title_lvl: List[int] = []
    content_pos: List[int] = []
    content_vals: List[str] = []
    for i, rec in enumerate(records):
        if rec["kind"] == "title":
            title_pos.append(i)
            title_lvl.append(_title_level(rec["content"], pattern))
            content_pos.append(i)
            content_vals.append(rec["content"])
        elif rec["kind"] != "media":  # no .text on picture items
            content_pos.append(i)
            content_vals.append(rec["content"])

    n_records = len(records)

    chunks: List[Dict] = []
    for section in sections:
        section_name = section["name"]
        current_level = section["level"]
        page_no = section["page_no"]
        start_idx = section["idx"]
        hierarchy = section["hierarchy"]

        end_idx = n_records
        t = bisect.bisect_right(title_pos, start_idx)
        while t < len(title_pos):
            if title_lvl[t] <= current_level:
                end_idx = title_pos[t]
                break
            t += 1

        lo = bisect.bisect_right(content_pos, start_idx)
        hi = bisect.bisect_left(content_pos, end_idx, lo)
        section_content = content_vals[lo:hi]

        text_content = "\n\n".join(section_content).strip()
        if not text_content:
            continue
        text_content = (
            "\n".join(list(hierarchy) + [section_name]) + "\n" + text_content
        )

        chunks.append(
            {
                "text": text_content,
                "headings": [section_name],
                "hierarchy": list(hierarchy),
                "pages": [page_no] if page_no else [],
                "kind": "text",
                "media_ref": "",
                # O9: section chunks take the header record's bbox
                "bbox": (
                    records[start_idx].get("bbox")
                    if 0 <= start_idx < len(records)
                    else None
                ),
            }
        )

    return chunks
