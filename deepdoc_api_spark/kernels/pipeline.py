"""The fused per-document kernel: spans in → chunks out.

This function is the single unit of work the Spark layer vectorizes:
one document's packed span array → its final chunk records. It fuses
extraction (O1-O6), chunker dispatch (K1-K5) and assembly (K6) so the
whole document pipeline costs exactly one JVM↔Python Arrow crossing.

Reliability semantics mirror the reference's fallback cascade
(``/root/reference/app/processing.py:586-609`` triggers
``FallbackDocumentProcessor`` on any primary failure;
``app/processing.py:1991-2003`` emits a terminal error chunk if the
fallback also fails) and per-document error isolation
(``app/main.py:408-414`` — one document's failure never fails the
batch). A per-document time budget stands in for the reference's
multiprocess timeout harness (``app/processing.py:1328-1489``): Spark
already isolates Python workers per task, so a cooperative deadline
check is all that remains of P1.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from .chunkers import (
    assemble_chunks,
    fallback_chunks,
    hierarchical_chunks,
    hybrid_chunks,
    mineru_chunks,
)
from .layout import extract_records
from .toc import toc_chunks
from .tokenizer import DEFAULT_TOKEN_BUDGET

#: chunker_type routing per app/processing.py:740-791 (unknown → hybrid)
CHUNKER_TYPES = ("hybrid", "hierarchical", "toc", "mineru", "fallback")


class DocTimeout(RuntimeError):
    """Cooperative per-document deadline exceeded (P1 analogue)."""


def records_to_chunks(
    doc_id: str,
    records: List[Dict],
    chunker_type: str = "hybrid",
    token_budget: int = DEFAULT_TOKEN_BUDGET,
    toc_params: Optional[Dict] = None,
) -> List[Dict]:
    """Post-extraction half of the kernel (used by the sharded giant-doc
    path, where extraction ran per span shard).

    ``toc_params`` mirrors the reference's chunker configuration
    (``app/processing.py:751-771``): ``section_pattern`` overrides the
    dotted-number regex; ``approved_sections`` restricts chunking to
    sections whose number-stripped name is in the list (the reference
    passes full section dicts from a prior ``get_sections`` call; in a
    distributed run the driver broadcasts names, and the kernel
    re-derives the matching descriptors per document).
    """
    ct = (chunker_type or "hybrid").lower()
    if ct == "hierarchical":
        chunks = hierarchical_chunks(records)
    elif ct == "toc":
        tp = toc_params or {}
        pattern = tp.get("section_pattern") or None
        approved_names = tp.get("approved_sections")
        from .toc import DEFAULT_SECTION_PATTERN, get_sections

        pattern = pattern or DEFAULT_SECTION_PATTERN
        approved = None
        if approved_names:
            import re as _re

            sections = get_sections(records, pattern)
            approved = [
                s
                for s in sections
                if _re.sub(pattern, "", s["name"]).strip() in set(approved_names)
                or s["name"] in set(approved_names)
            ]
        chunks = toc_chunks(records, pattern=pattern, approved_sections=approved)
    elif ct == "mineru":
        chunks = mineru_chunks(records, doc_id)
    elif ct == "fallback":
        content = "\n".join(r["content"] for r in records if r["content"])
        chunks = fallback_chunks(content)
    else:
        # hybrid, or unknown → hybrid (app/processing.py:776-784)
        ct = "hybrid" if ct not in CHUNKER_TYPES else ct
        chunks = hybrid_chunks(records, budget=token_budget)
    return assemble_chunks(doc_id, chunks, ct)


def _fallback_raw(doc_id: str, raw_texts: List[str], chunker_type: str) -> List[Dict]:
    """P7 — basic extraction + K5 over the raw span text.

    The reference's fallback reads the raw file bytes (tags and all,
    ``app/processing.py:1959-1962``) and window-chunks them; the span
    analogue joins raw span texts (html left unparsed) with ``"\\n"``.
    """
    content = "\n".join(t for t in raw_texts if t)
    chunks = fallback_chunks(content)
    return assemble_chunks(doc_id, chunks, chunker_type, extractor_used="fallback")


def chunks_from_prepared(
    doc_id: str,
    records: List[Dict],
    raw_texts: List[str],
    chunker_type: str = "hybrid",
    token_budget: int = DEFAULT_TOKEN_BUDGET,
    toc_params: Optional[Dict] = None,
) -> List[Dict]:
    """Cascade over already-extracted records (shared by the fused
    small-doc kernel and the sharded giant-doc reassembly path, so both
    produce byte-identical output for the same document)."""
    try:
        chunks = records_to_chunks(
            doc_id, records, chunker_type, token_budget, toc_params
        )
        if not chunks:
            raise RuntimeError("primary extraction returned no chunks")
        return chunks
    except Exception:
        try:
            return _fallback_raw(doc_id, raw_texts, chunker_type)
        except Exception as e:  # terminal error record
            return assemble_chunks(
                doc_id,
                [
                    {
                        "text": f"Error processing document: {str(e)}",
                        "headings": None,
                        "hierarchy": None,
                        "pages": [1],
                        "kind": "text",
                        "media_ref": "",
                    }
                ],
                chunker_type,
                extractor_used="error",
            )


def chunk_document(
    doc_id: str,
    spans: List[Dict],
    chunker_type: str = "hybrid",
    token_budget: int = DEFAULT_TOKEN_BUDGET,
    deadline_s: Optional[float] = None,
    toc_params: Optional[Dict] = None,
) -> List[Dict]:
    """Process one document end-to-end with the reliability cascade.

    Returns assembled chunk records; never raises (terminal errors
    become a single error chunk, ``app/processing.py:1991-2003``).
    """
    start = time.monotonic()
    raw_texts = [(s.get("text") or "") for s in spans]
    try:
        records = extract_records(spans)
        if deadline_s is not None and time.monotonic() - start > deadline_s:
            raise DocTimeout(f"document {doc_id} exceeded {deadline_s}s")
    except Exception:
        records = []  # forces the fallback branch below
    # "Docling worker returned no chunks" → fallback
    # (app/processing.py:563-564); cascade shared with the sharded path
    return chunks_from_prepared(
        doc_id, records, raw_texts, chunker_type, token_budget, toc_params
    )
