"""MinerU middle-JSON source (S8): layout JSON → the engine span table.

The reference consumes MinerU's layout output as a nested dict
(``/root/reference/app/mineru_adapter/layout_processor.py:49-129``):
``pdf_info`` pages carrying ``para_blocks``/``preproc_blocks``/
``discarded_blocks``, each block a ``type``/``bbox``/``lines`` tree
whose leaf spans hold the content. This module implements the same
ingestion as a DECLARATIVE Spark plan over ``spark.read.json`` — the
whole page fold (concat the three block lists, sort by the bbox
top-left corner, fan blocks out to one row per leaf span) runs in
JVM-side higher-order functions; no Python touches a row.

Semantics reproduced from the reference:

* blocks combined across all three lists, sorted by ``(bbox[1],
  bbox[0])`` with a MISSING bbox treated as ``[0, 0, 0, 0]``
  (``layout_processor.py:77-86``); ties keep input order (the
  comparator returns 0 and both engines' sorts are stable, like the
  reference's ``list.sort``);
* ``title``/``text`` blocks emit one span per leaf span with its
  ``content`` (``:92-102``); ``list`` blocks flatten their nested
  ``blocks``→``lines``→``spans`` (``:104-115``); ``table`` blocks keep
  only leaf spans with ``span.type == 'table'``, carrying ``html`` as
  the text and ``image_path`` as the media ref (``:117-129``);
* every other block type is dropped — EXCEPT ``image`` blocks, which
  the reference discards but this engine maps to ``media`` pass-through
  spans (the north-rule inline-media extension, same as the HTML
  scanner's ``<img>`` handling): ``media_ref`` = the first leaf span's
  ``image_path``.

Offsets encode the recovered reading order in the span-table
convention (``kernels/layout.py``): ``offset = page_idx * PAGE_SIZE +
ordinal``, so ``page_of_offset`` returns the reference's 1-based
``page_idx + 1``. Documents with more than ``PAGE_SIZE`` (1000)
extracted spans on ONE page would bleed into the next page label —
MinerU pages are bounded far below that in practice; the reader caps
the ordinal at ``PAGE_SIZE - 1`` so the page label never corrupts
(the tail of such a pathological page keeps reading order through the
offset's secondary sort, and the cap is visible in the data).

Scale shape: one ``posexplode`` per nesting level over ALREADY-parsed
JSON columns, one final ``groupBy(doc_id)`` with a sorted collect —
the standard ingest shuffle. A 10^12-doc lake would partition the
JSON by doc ranges; everything here is per-document local until the
final assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.layout import PAGE_SIZE

_LINE = "array<struct<spans:array<struct<content:string,type:string,html:string,image_path:string>>>>"
_BLOCK = (
    "array<struct<type:string,bbox:array<double>,"
    f"lines:{_LINE},"
    f"blocks:array<struct<lines:{_LINE}>>>>"
)
MINERU_JSON_SCHEMA = (
    "doc_id string, "
    "pdf_info array<struct<"
    "page_idx:int,"
    f"para_blocks:{_BLOCK},"
    f"preproc_blocks:{_BLOCK},"
    f"discarded_blocks:{_BLOCK}"
    ">>"
)

#: (y0, x0) comparator with the reference's [0,0,0,0] missing-bbox
#: default; returning 0 on ties keeps input order (stable sorts on
#: both sides)
_BBOX_CMP = (
    "(l, r) -> case"
    " when coalesce(element_at(l.bbox, 2), 0.0d)"
    "      < coalesce(element_at(r.bbox, 2), 0.0d) then -1"
    " when coalesce(element_at(l.bbox, 2), 0.0d)"
    "      > coalesce(element_at(r.bbox, 2), 0.0d) then 1"
    " when coalesce(element_at(l.bbox, 1), 0.0d)"
    "      < coalesce(element_at(r.bbox, 1), 0.0d) then -1"
    " when coalesce(element_at(l.bbox, 1), 0.0d)"
    "      > coalesce(element_at(r.bbox, 1), 0.0d) then 1"
    " else 0 end"
)

#: per-block dispatch → array<struct<kind,text,media_ref>> of leaf spans
_BLOCK_SPANS = """
case
  when b.type in ('title', 'text') then
    transform(
      flatten(transform(coalesce(b.lines, array()), l -> coalesce(l.spans, array()))),
      s -> named_struct('kind', b.type,
                        'text', coalesce(s.content, ''),
                        'media_ref', ''))
  when b.type = 'list' then
    transform(
      flatten(transform(
        flatten(transform(coalesce(b.blocks, array()),
                          nb -> coalesce(nb.lines, array()))),
        l -> coalesce(l.spans, array()))),
      s -> named_struct('kind', 'list',
                        'text', coalesce(s.content, ''),
                        'media_ref', ''))
  when b.type = 'table' then
    transform(
      filter(
        flatten(transform(
          flatten(transform(coalesce(b.blocks, array()),
                            nb -> coalesce(nb.lines, array()))),
          l -> coalesce(l.spans, array()))),
        s -> s.type = 'table'),
      s -> named_struct('kind', 'table',
                        'text', coalesce(s.html, ''),
                        'media_ref', coalesce(s.image_path, '')))
  when b.type = 'image' then
    slice(transform(
      flatten(transform(coalesce(b.lines, array()), l -> coalesce(l.spans, array()))),
      s -> named_struct('kind', 'media',
                        'text', '',
                        'media_ref', coalesce(s.image_path, ''))), 1, 1)
  else array()
end
"""


def spans_from_mineru_json(spark: SparkSession, path: str) -> DataFrame:
    """Read MinerU middle-JSON (JSONL, one document per line) into the
    engine's span table ``(doc_id, spans)``."""
    raw = spark.read.schema(MINERU_JSON_SCHEMA).json(path)
    pages = raw.select(
        "doc_id",
        F.expr("posexplode_outer(pdf_info)").alias("p_seq", "page"),
    ).selectExpr(
        "doc_id",
        "coalesce(page.page_idx, p_seq) as page_idx",
        # reference order: para + preproc + discarded, then stable
        # (y0, x0) sort — layout_processor.py:70-86
        f"""array_sort(
              concat(coalesce(page.para_blocks, array()),
                     coalesce(page.preproc_blocks, array()),
                     coalesce(page.discarded_blocks, array())),
              {_BBOX_CMP}) as blocks""",
    )
    page_spans = pages.selectExpr(
        "doc_id",
        "page_idx",
        f"flatten(transform(blocks, b -> {_BLOCK_SPANS})) as pspans",
    ).selectExpr(
        "doc_id",
        "page_idx",
        "posexplode(pspans) as (ordinal, s)",
    )
    rows = page_spans.selectExpr(
        "doc_id",
        "s.kind as kind",
        "s.text as text",
        "s.media_ref as media_ref",
        f"cast(page_idx * {PAGE_SIZE}"
        f" + least(ordinal, {PAGE_SIZE - 1}) as int) as offset",
        f"page_idx * {PAGE_SIZE} + ordinal as ord",
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(ord, kind, text, media_ref, offset))),"
                " r -> named_struct('kind', r.kind, 'text', r.text,"
                " 'media_ref', r.media_ref, 'offset', r.offset))"
            ).alias("spans")
        )
    )
