"""Python-side hashing kernels for the text-dedup sketch family —
value-identical twins of the JVM md5 expression chains in ops/dedup.py.

Why (round 8, guide §4.1/4.2): the shingle → digest → minhash/simhash
expressions are higher-order lambdas (``transform``/``aggregate``) that
Spark evaluates per element with the interpreted evaluator, and their
generated projections pay a multi-second Janino/JIT warm-up on every
fresh session — the dominant cost of the dedup ops at bench scale.
These kernels run the identical arithmetic in a ``mapInArrow`` stage:
``hashlib.md5`` over the same UTF-8 bytes, windows taken from the raw
digest bytes (byte ``4k..4k+4`` big-endian == ``conv(substr(hex,
8k+1, 8), 16, 10)``), integer minima/sums unchanged (integer ops are
order-free, so per-batch accumulation is exact, not approximate).

Inputs are the JVM-produced ``(doc_id, w)`` words relations — the
``lower``/``trim``/``split`` semantics stay in Spark SQL, so no
cross-engine string-class parity is at stake here; the only contracts
are md5 (bitwise standard) and ``concat_ws(' ', a, b, c)`` ≡
``' '.join((a, b, c))`` over non-null strings. Differential pins:
tests/test_texthash_bitexact.py compares every kernel against the old
JVM expressions on adversarial inputs.
"""

from __future__ import annotations

from hashlib import md5 as _md5
from typing import Iterable, List, Optional

N_HASHES = 8


def shingles(ws: List[str]) -> List[str]:
    """Word 3-grams — ``concat_ws(' ', w[i], w[i+1], w[i+2])`` for
    i in 1..len-2 (the guarded ``_SHINGLES_EXPR``); [] below 3 words."""
    if len(ws) < 3:
        return []
    return [
        ws[i] + " " + ws[i + 1] + " " + ws[i + 2]
        for i in range(len(ws) - 2)
    ]


def digest_windows(g: str) -> List[int]:
    """The 8 independent 32-bit hash windows of one shingle: two md5
    digests (``md5('0:'||g) || md5('1:'||g)``), split into 4
    non-overlapping big-endian 32-bit words each — byte slice
    ``[4k:4k+4]`` of digest k//4 equals hex chars ``[8k+1, 8k+8]``."""
    gb = g.encode("utf-8")
    d0 = _md5(b"0:" + gb).digest()
    d1 = _md5(b"1:" + gb).digest()
    return [
        int.from_bytes(d0[0:4], "big"),
        int.from_bytes(d0[4:8], "big"),
        int.from_bytes(d0[8:12], "big"),
        int.from_bytes(d0[12:16], "big"),
        int.from_bytes(d1[0:4], "big"),
        int.from_bytes(d1[4:8], "big"),
        int.from_bytes(d1[8:12], "big"),
        int.from_bytes(d1[12:16], "big"),
    ]


def minhash_of(gs: Iterable[str]) -> Optional[List[int]]:
    """8 minhash minima over a shingle stream; None when empty (the JVM
    ``array_min`` over an empty transform yields null)."""
    mins: Optional[List[int]] = None
    for g in gs:
        ws8 = digest_windows(g)
        if mins is None:
            mins = ws8
        else:
            mins = [a if a < b else b for a, b in zip(ws8, mins)]
    return mins


def containment_sketch(ws: List[str]):
    """(hs, mh): first-occurrence-distinct window-0 hashes over the
    DISTINCT shingles, plus the 8 minhash minima over the same distinct
    digests — the fused pre-checkpoint sketch of the containment op."""
    gs = list(dict.fromkeys(shingles(ws)))
    hs: List[int] = []
    seen = set()
    mins: Optional[List[int]] = None
    for g in gs:
        ws8 = digest_windows(g)
        h0 = ws8[0]
        if h0 not in seen:
            seen.add(h0)
            hs.append(h0)
        if mins is None:
            mins = ws8
        else:
            mins = [a if a < b else b for a, b in zip(ws8, mins)]
    return hs, mins


def simhash64_words(dw: Optional[List[str]]) -> List[int]:
    """The 4 × 16-bit simhash words of a distinct-word list — bit i of
    word k is the sign of the ``((h >> i%32) & 1)*2 - 1`` sum over
    ``md5('0:'||w)`` windows (ha = hex 1-8, hb = hex 9-16). A null
    word list mirrors the JVM null fold (every bit sum null → word 0);
    an EMPTY list is different: the fold yields 0 per bit, 0 >= 0 sets
    every bit → word 65535 — unreachable from split() output but
    mirrored exactly anyway."""
    if dw is None:
        return [0, 0, 0, 0]
    if not dw:
        return [65535, 65535, 65535, 65535]
    import numpy as np

    ha = np.empty(len(dw), dtype=np.int64)
    hb = np.empty(len(dw), dtype=np.int64)
    for i, w in enumerate(dw):
        d = _md5(b"0:" + w.encode("utf-8")).digest()
        ha[i] = int.from_bytes(d[0:4], "big")
        hb[i] = int.from_bytes(d[4:8], "big")
    shifts = np.arange(32, dtype=np.int64)
    sums_a = (((ha[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
    sums_b = (((hb[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
    sums = np.concatenate([sums_a, sums_b])  # bit 0..63
    out = []
    for k in range(4):
        word = 0
        for j in range(16):
            if sums[16 * k + j] >= 0:
                word |= 1 << j
        out.append(word)
    return out


def simhash16_of(dw: Optional[List[str]]) -> int:
    """16-bit simhash over distinct words, ``_hash_expr(0, w)`` family
    (``md5('0:'||w)`` window 0). Null word list → 0 (JVM null fold);
    empty list → 65535 (zero sums, 0 >= 0 sets every bit)."""
    if dw is None:
        return 0
    if not dw:
        return 65535
    import numpy as np

    hs = np.empty(len(dw), dtype=np.int64)
    for i, w in enumerate(dw):
        hs[i] = int.from_bytes(
            _md5(b"0:" + w.encode("utf-8")).digest()[0:4], "big"
        )
    shifts = np.arange(16, dtype=np.int64)
    sums = (((hs[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
    out = 0
    for i in range(16):
        if sums[i] >= 0:
            out |= 1 << i
    return out
