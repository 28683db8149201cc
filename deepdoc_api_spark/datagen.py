"""Deterministic synthetic interleaved-span corpus generator.

The engine's input contract (BASELINE.json ``input_hint``) is a table

    (doc_id: string,
     spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>)

The sandbox provides no such corpus, so this module synthesizes one —
seed-stable, derived purely from the driver-provided ``documents``
table (``/root/testdata/sf*/documents.parquet``) whose ``text`` column
is the vocabulary substrate. Generation is a pure function of
``(doc_id, text)``: the same row always yields the same spans, on the
driver (oracle) and on executors (distributed), at any scale.

Structural features generated (each exercises a reference rule — see
FIXTURES.md):

* html spans with nav/footer/ad boilerplate, links, inline ``<img>``
  (boilerplate-strip kernel, media pass-through);
* pdf-layout spans ``title|text|list|table`` (layout fold), including a
  per-document repeated header injected >3 times in ~25% of docs
  (suppression, ``layout_processor.py:131-134``) and 2 times otherwise;
* dotted section titles ``"2.3 ..."`` plus un-numbered continuation
  headers (TOC repair, ``toc_chunker.py:95-110``);
* ``media`` spans with empty text and a ``media_ref`` URI;
* unknown span kinds (dropped by extraction);
* multi-page documents via the ``offset // 1000 + 1`` page convention;
* a long-tail size distribution (log-normal, median ~30 spans) with a
  deterministic 0.1% of giant documents (``doc_id % 1000 == 7`` →
  ``GIANT_SPANS`` spans) for skew/shard testing.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

PAGE_STEP_MAX = 40
GIANT_MOD = 1000
GIANT_REMAINDER = 7
GIANT_SPANS = 20_000
SEED_NS = "ddspark-corpus-v1"

_MEDIA_EXTS = ("png", "jpg", "gif", "mp4", "wav")
_BOILER_CLASSES = ("nav", "footer", "sidebar", "ads banner")


def doc_id_str(doc_id: int) -> str:
    return f"doc-{doc_id:08d}"


def is_giant(doc_id: int) -> bool:
    return doc_id % GIANT_MOD == GIANT_REMAINDER


def _words_fn(rng: random.Random, vocab: List[str]):
    def w(n: int) -> str:
        return " ".join(rng.choice(vocab) for _ in range(n))

    return w


def _make_title(rng: random.Random, w, counters: List[int]) -> str:
    r = rng.random()
    if r < 0.70:
        depth = rng.randint(1, 3)
        counters[depth - 1] += 1
        for d in range(depth, 3):
            counters[d] = 0
        num = ".".join(str(c) for c in counters[:depth])
        return f"{num} {w(rng.randint(2, 4)).title()}"
    if r < 0.90:
        return w(rng.randint(2, 4)).title()
    # continuation-style bare header (un-numbered, often followed by a
    # numbered one → TOC repair path)
    return w(2).title()


def _make_html(rng: random.Random, w, doc_id: int, span_i: int) -> str:
    parts: List[str] = []
    if rng.random() < 0.6:
        links = "".join(
            f'<li><a href="/{w(1)}">{w(1)}</a></li>' for _ in range(rng.randint(2, 5))
        )
        parts.append(f"<nav><ul>{links}</ul></nav>")
    if rng.random() < 0.3:
        parts.append(f'<div class="{rng.choice(_BOILER_CLASSES)}">{w(6)}</div>')
    if rng.random() < 0.5:
        lvl = rng.randint(1, 3)
        parts.append(f"<h{lvl}>{w(rng.randint(2, 4)).title()}</h{lvl}>")
    for _ in range(rng.randint(1, 3)):
        body = w(rng.randint(12, 30))
        if rng.random() < 0.25:
            body += f' see <a href="/{w(1)}">{w(2)}</a> for details'
        parts.append(f"<p>{body}</p>")
    if rng.random() < 0.2:
        parts.append(
            f'<img src="media://{doc_id}/inline-{span_i}.png" alt="{w(1)}">'
        )
    if rng.random() < 0.25:
        items = "".join(f"<li>{w(rng.randint(2, 6))}</li>" for _ in range(3))
        parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.15:
        rows = "".join(
            f"<tr><td>{w(2)}</td><td>{w(2)}</td></tr>" for _ in range(2)
        )
        parts.append(f"<table>{rows}</table>")
    if rng.random() < 0.4:
        parts.append(f"<footer>© {w(4)}</footer>")
    return "".join(parts)


def _make_table_html(rng: random.Random, w) -> str:
    rows = "".join(
        f"<tr><td>{w(rng.randint(1, 3))}</td><td>{w(rng.randint(1, 3))}</td></tr>"
        for _ in range(rng.randint(1, 3))
    )
    return f"<table>{rows}</table>"


def gen_doc_spans(doc_id: int, text: str) -> List[Dict]:
    """Generate the span sequence for one document. Pure & deterministic."""
    rng = random.Random(f"{SEED_NS}:{doc_id}")
    # `or` AFTER the split (round-5 edge fix): whitespace-only text is
    # truthy but splits to [], and vocab[0] below then raised — the
    # fallback vocabulary must cover blank text of any shape
    vocab = (text or "").split() or "alpha beta gamma delta epsilon".split()
    w = _words_fn(rng, vocab)

    if is_giant(doc_id):
        n_spans = GIANT_SPANS
    else:
        n_spans = max(5, min(800, int(rng.lognormvariate(3.4, 1.0))))

    # repeated-header plan: >3 occurrences in ~25% of docs (suppression
    # fires), exactly 2 otherwise (stays below threshold)
    header_rep = f"CONFIDENTIAL {vocab[0].upper()}"
    rep_count = 5 if rng.random() < 0.25 else 2
    rep_positions = set(
        rng.sample(range(n_spans), min(rep_count, n_spans))
    )

    counters = [0, 0, 0]
    spans: List[Dict] = []
    offset = 0
    for i in range(n_spans):
        offset += rng.randint(1, PAGE_STEP_MAX)
        if i in rep_positions:
            spans.append(
                {"kind": "title", "text": header_rep, "media_ref": "", "offset": offset}
            )
            continue
        r = rng.random()
        if r < 0.22:
            kind, txt, ref = "html", _make_html(rng, w, doc_id, i), ""
        elif r < 0.56:
            txt = w(rng.randint(8, 40))
            if rng.random() < 0.05:
                txt += " — naïve 测试 ému"
            kind, ref = "text", ""
        elif r < 0.68:
            kind, txt, ref = "title", _make_title(rng, w, counters), ""
        elif r < 0.80:
            kind, txt, ref = "list", w(rng.randint(3, 10)), ""
        elif r < 0.87:
            kind, txt = "table", _make_table_html(rng, w)
            ref = (
                f"img://{doc_id}/table-{i}.png" if rng.random() < 0.5 else ""
            )
        elif r < 0.92:
            kind, txt = "media", ""
            ref = f"media://{doc_id}/{i}.{rng.choice(_MEDIA_EXTS)}"
        elif r < 0.95:
            kind, txt, ref = "unknown", w(4), ""
        else:
            kind, txt, ref = "text", w(rng.randint(8, 24)), ""
        spans.append({"kind": kind, "text": txt, "media_ref": ref, "offset": offset})
    return spans


def gen_corpus(rows: List[Tuple[int, str]]) -> List[Tuple[str, List[Dict]]]:
    """Driver-side (oracle) corpus generation for a list of
    ``(doc_id, text)`` rows."""
    return [(doc_id_str(d), gen_doc_spans(d, t)) for d, t in rows]
