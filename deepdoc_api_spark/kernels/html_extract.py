"""HTML main-content extraction via text-density / link-density DOM heuristics.

The reference converts HTML to PDF (pdfkit/WeasyPrint,
``app/processing.py:185-246``) and lets docling re-extract it — a lossy
round-trip. The rebuild extracts main content directly from the HTML
span using Readability/trafilatura-style scoring (as mandated by the
project north star): parse with the stdlib ``html.parser``, identify
block elements, and drop boilerplate by

  * ancestor tag (``nav``/``footer``/``aside``),
  * class/id tokens (nav, menu, footer, sidebar, ad, banner, …),
  * link density (fraction of block text inside ``<a>``) > LINK_DENSITY_MAX,
  * text density: body-text blocks shorter than MIN_TEXT_CHARS are
    treated as furniture (headings, list items and table cells are
    exempt — structure carries information at any length).

Inline ``<img>`` elements become media records (``kind='media'``,
``media_ref=src``) preserved in document order — the north-rule
invariant that media references survive extraction inline.

Everything is deterministic and stdlib-only. Output records are dicts
``{"kind": str, "text": str, "media_ref": str}`` in document order,
with ``kind`` in ``{"title", "text", "list", "table", "media"}`` — the
same block-kind vocabulary as the PDF-layout path
(``/root/reference/app/mineru_adapter/layout_processor.py:92-129``), so
downstream operators are agnostic to whether a block came from HTML or
PDF layout.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List

# --- tuning constants (part of the engine spec; changing them changes the
# --- equality contract, so they are module-level and versioned) -------------
LINK_DENSITY_MAX = 0.33
MIN_TEXT_CHARS = 25

_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "head", "iframe"}
_BOILERPLATE_TAGS = {"nav", "footer", "aside"}
_BOILERPLATE_ATTR_RE = re.compile(
    r"(?:^|[\s_-])(nav|navbar|menu|footer|sidebar|side-bar|comment|comments|ad|ads"
    r"|advert|advertisement|banner|breadcrumb|breadcrumbs|share|social|cookie"
    r"|promo|related|widget)(?:$|[\s_-])",
    re.IGNORECASE,
)

# Leaf block tags that accumulate their own text record.
_LEAF_KIND = {
    "h1": "title",
    "h2": "title",
    "h3": "title",
    "h4": "title",
    "h5": "title",
    "h6": "title",
    "p": "text",
    "li": "list",
    "pre": "text",
    "blockquote": "text",
}
# Container tags whose *direct* loose text gets flushed as a text block.
_CONTAINER_TAGS = {"div", "section", "article", "main", "body", "html", "ul", "ol"}

_WS_RE = re.compile(r"\s+")
_VOID_TAGS = {
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


class _Block:
    __slots__ = ("kind", "parts", "link_chars", "boiler")

    def __init__(self, kind: str, boiler: bool) -> None:
        self.kind = kind
        self.parts: List[str] = []
        self.link_chars = 0
        self.boiler = boiler

    def text(self) -> str:
        return _norm("".join(self.parts))


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.records: List[Dict[str, str]] = []
        # open-tag stack: (tag, counted_drop, counted_boiler)
        self._stack: List[tuple] = []
        self._boiler_depth = 0
        self._drop_depth = 0
        self._a_depth = 0
        self._block: _Block | None = None  # current open leaf block
        self._block_tag: str | None = None
        self._floating: _Block | None = None  # loose container text
        # table capture
        self._table_depth = 0
        self._table_rows: List[List[str]] = []
        self._table_cell: List[str] | None = None
        self._table_boiler = False
        self._table_link_chars = 0
        self._table_chars = 0

    # -- helpers -------------------------------------------------------
    def _is_boiler(self, tag: str, attrs) -> bool:
        if tag in _BOILERPLATE_TAGS:
            return True
        for name, value in attrs:
            if name in ("class", "id") and value and _BOILERPLATE_ATTR_RE.search(value):
                return True
        return False

    def _in_boiler(self) -> bool:
        return self._boiler_depth > 0

    def _emit(self, block: _Block) -> None:
        text = block.text()
        if not text or block.boiler:
            return
        density = block.link_chars / max(len("".join(block.parts).strip()), 1)
        if density > LINK_DENSITY_MAX:
            return
        if block.kind == "text" and len(text) < MIN_TEXT_CHARS:
            return
        self.records.append({"kind": block.kind, "text": text, "media_ref": ""})

    def _flush_floating(self) -> None:
        if self._floating is not None:
            self._emit(self._floating)
            self._floating = None

    def _close_block(self) -> None:
        if self._block is not None:
            self._emit(self._block)
            self._block = None
            self._block_tag = None

    def _emit_table(self) -> None:
        if self._table_boiler:
            return
        rows = [" | ".join(c for c in row if c) for row in self._table_rows]
        text = _norm("\n".join(r for r in rows if r))
        if not text:
            return
        density = self._table_link_chars / max(self._table_chars, 1)
        if density > LINK_DENSITY_MAX:
            return
        self.records.append({"kind": "table", "text": text, "media_ref": ""})

    # -- parser events -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            if tag == "img" and self._drop_depth == 0 and not self._in_boiler():
                src = dict(attrs).get("src") or ""
                if src:
                    self._flush_floating()
                    self._close_block()
                    self.records.append(
                        {"kind": "media", "text": "", "media_ref": src}
                    )
            elif tag == "br" and (self._block or self._floating or self._table_cell is not None):
                self.handle_data(" ")
            return

        is_drop = tag in _DROP_TAGS
        is_boiler = not is_drop and self._is_boiler(tag, attrs)
        self._stack.append((tag, is_drop, is_boiler))
        if is_drop:
            self._drop_depth += 1
            return
        if is_boiler:
            self._boiler_depth += 1

        if self._drop_depth:
            return

        if tag == "table":
            self._flush_floating()
            self._close_block()
            self._table_depth += 1
            if self._table_depth == 1:
                self._table_rows = []
                self._table_cell = None
                self._table_boiler = self._in_boiler()
                self._table_link_chars = 0
                self._table_chars = 0
            return
        if self._table_depth:
            if tag == "tr":
                self._table_rows.append([])
                self._table_cell = None
            elif tag in ("td", "th"):
                if not self._table_rows:
                    self._table_rows.append([])
                self._table_cell = []
            return

        if tag == "a":
            self._a_depth += 1
            return
        if tag in _LEAF_KIND:
            self._flush_floating()
            self._close_block()
            self._block = _Block(_LEAF_KIND[tag], self._in_boiler())
            self._block_tag = tag
        elif tag in _CONTAINER_TAGS:
            # a new container boundary flushes loose text
            self._flush_floating()
            self._close_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        # unwind stack to the matching open tag (lenient HTML)
        if any(entry[0] == tag for entry in self._stack):
            while self._stack:
                popped_tag, was_drop, was_boiler = self._stack.pop()
                if was_drop:
                    self._drop_depth = max(0, self._drop_depth - 1)
                if was_boiler:
                    self._boiler_depth = max(0, self._boiler_depth - 1)
                if popped_tag == tag:
                    break

        if tag == "a" and self._a_depth:
            self._a_depth -= 1
            return
        if tag == "table" and self._table_depth:
            self._table_depth -= 1
            if self._table_depth == 0:
                if self._table_cell is not None and self._table_rows:
                    self._table_rows[-1].append(_norm("".join(self._table_cell)))
                    self._table_cell = None
                self._emit_table()
            return
        if self._table_depth:
            if tag in ("td", "th") and self._table_cell is not None:
                if not self._table_rows:
                    self._table_rows.append([])
                self._table_rows[-1].append(_norm("".join(self._table_cell)))
                self._table_cell = None
            return
        if tag == self._block_tag:
            self._close_block()
        elif tag in _CONTAINER_TAGS or tag in _BOILERPLATE_TAGS:
            self._flush_floating()
            self._close_block()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if self._table_depth:
            if self._table_cell is not None:
                self._table_cell.append(data)
                self._table_chars += len(data.strip())
                if self._a_depth:
                    self._table_link_chars += len(data.strip())
            return
        if self._block is not None:
            self._block.parts.append(data)
            if self._a_depth:
                self._block.link_chars += len(data.strip())
            return
        if data.strip():
            if self._floating is None:
                self._floating = _Block("text", self._in_boiler())
            self._floating.parts.append(data)
            if self._a_depth:
                self._floating.link_chars += len(data.strip())

    def close(self) -> None:  # flush trailing state
        super().close()
        self._close_block()
        self._flush_floating()
        if self._table_depth:
            self._table_depth = 0
            if self._table_cell is not None and self._table_rows:
                self._table_rows[-1].append(_norm("".join(self._table_cell)))
                self._table_cell = None
            self._emit_table()


def extract_html_blocks(html: str) -> List[Dict[str, str]]:
    """Extract main-content block records from an HTML fragment.

    Returns an ordered list of ``{"kind", "text", "media_ref"}`` dicts;
    boilerplate (nav/footer/ads/high-link-density furniture) removed,
    inline images preserved as media records.
    """
    if not html:
        return []
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed beyond the lenient parser: degrade to tag-stripped text
        text = _norm(re.sub(r"<[^>]*>", " ", html))
        return [{"kind": "text", "text": text, "media_ref": ""}] if text else []
    return p.records
