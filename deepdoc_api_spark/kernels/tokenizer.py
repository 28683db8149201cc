"""Deterministic regex tokenizer.

The reference delegates token counting to docling's default HF tokenizer
(``app/jivas_embeddings.py:39-48`` truncates by tokenizer tokens; the
HybridChunker's token budget comes from its embedding tokenizer). An HF
tokenizer is non-hermetic (network weights) and unavailable here, so the
rebuild specifies its own deterministic tokenizer — a word/punctuation
regex — used identically on both the oracle and executor sides. This is
a documented divergence from the reference; the span-sequence equality
contract is defined against *this* tokenizer.
"""

from __future__ import annotations

import re
from typing import List

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

#: Default token budget for the hybrid chunker. Mirrors the 512-token
#: budget of docling's default HybridChunker embedding tokenizer
#: (BAAI/bge-small-en-v1.5, max_length=512).
DEFAULT_TOKEN_BUDGET = 512


def tokenize(text: str) -> List[str]:
    """Split ``text`` into word / single-punctuation tokens."""
    return _TOKEN_RE.findall(text or "")


def count_tokens(text: str) -> int:
    """Number of tokens in ``text`` under the engine's tokenizer.

    ``subn`` instead of ``len(findall)``: the match count is identical
    (same pattern, same scan) but the only allocation is one small
    whitespace-residue string instead of one string per token — the
    kernel calls this ~200×/doc and the 32-core ceiling is allocator
    bandwidth (BENCH/BASELINE.md control), so garbage per call matters
    more than single-core speed here."""
    return _TOKEN_RE.subn("", text or "")[1]


def truncate_tokens(text: str, max_tokens: int) -> str:
    """Truncate ``text`` to at most ``max_tokens`` tokens.

    Mirrors the reference's tokenizer-based truncation for embedding
    inputs (``app/jivas_embeddings.py:39-48``) under our tokenizer: the
    truncated string ends at the end of the ``max_tokens``-th token.
    """
    if max_tokens <= 0:
        return ""
    matches = list(_TOKEN_RE.finditer(text or ""))
    if len(matches) <= max_tokens:
        return text or ""
    end = matches[max_tokens - 1].end()
    return (text or "")[:end]
