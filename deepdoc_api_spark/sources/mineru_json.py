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
the ordinal at ``PAGE_SIZE - 1`` in the offset LABEL only, so the page
label never corrupts (all capped spans of such a pathological page
share the page's last offset — the cap is visible in the data).
Reading order itself never relies on the folded label: the final
assembly sorts on the unfolded ``(page_idx, ordinal)`` pair, which is
overflow-proof (round-5 ADVICE: the old folded scalar sort key let an
overflow page's tail interleave with the NEXT page's spans).

Scale shape: one ``posexplode`` per nesting level over ALREADY-parsed
JSON columns, one final ``groupBy(doc_id)`` with a sorted collect —
the standard ingest shuffle. A 10^12-doc lake would partition the
JSON by doc ranges; everything here is per-document local until the
final assembly.
"""

from __future__ import annotations

import os

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
        # unfolded sort key: (page_idx, ordinal) is unique per doc and
        # overflow-proof, unlike the folded page_idx*PAGE_SIZE+ordinal
        # scalar, whose >PAGE_SIZE tails sorted into the next page's
        # range (round-5 ADVICE)
        "page_idx",
        "ordinal",
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(page_idx, ordinal, kind, text, media_ref, offset))),"
                " r -> named_struct('kind', r.kind, 'text', r.text,"
                " 'media_ref', r.media_ref, 'offset', r.offset))"
            ).alias("spans")
        )
    )


# ---------------------------------------------------------------------------
# Driver-surfaced oracle for the reader (round-6, VERDICT #8): a
# deterministic middle-JSON corpus generated from the documents table's
# doc_ids alone, written to a local JSONL, read back through the
# DECLARATIVE reader above, and folded to per-doc scalar checksums.
# The DuckDB oracle re-derives the same checksums by pure arithmetic —
# generation recipe AND reader semantics (three-list concat, stable
# (y0, x0) block sort, per-type leaf-span fan-out, table-span filter,
# image first-span slice, offset fold) are both integer-deterministic
# for this corpus, so the mirror certifies the reader end to end
# without touching Python in the Spark plan.
# ---------------------------------------------------------------------------

#: bump to invalidate cached generated corpora when the recipe changes
_SRC_GEN_VERSION = 1

#: block-type cycle: exercises every dispatch branch of _BLOCK_SPANS
_SRC_TYPES = ("text", "title", "list", "table", "image")


def _src_doc(i: int) -> dict:
    """Deterministic middle-JSON document for integer doc_id ``i``.

    Per page ``p``: ``2 + (i+p) % 4`` blocks; block ``b`` has type
    ``_SRC_TYPES[(i+p+b) % 5]`` and ``y0 = ((b*7+3) % n_blocks) * 10``
    — a permutation of the block slots (gcd(7, n)=1 for n ≤ 5), so the
    reader's (y0, x0) sort applies a real scramble with no ties. Blocks
    are distributed round-robin across para/preproc/discarded to
    exercise the three-list concat (order-neutral: y0s are distinct).
    """
    pages = []
    for p in range(1 + i % 3):
        lists: dict = {"para_blocks": [], "preproc_blocks": [],
                       "discarded_blocks": []}
        n_blocks = 2 + (i + p) % 4
        for b in range(n_blocks):
            t = _SRC_TYPES[(i + p + b) % 5]
            y0 = float(((b * 7 + 3) % n_blocks) * 10)
            blk: dict = {"type": t, "bbox": [5.0, y0, 100.0, y0 + 8.0]}
            if t in ("text", "title"):
                blk["lines"] = [
                    {"spans": [{"content": f"d{i}p{p}b{b}l{line}"}]}
                    for line in range(1 + (i + b) % 2)
                ]
            elif t == "list":
                blk["blocks"] = [
                    {"lines": [{"spans": [
                        {"content": f"d{i}p{p}b{b}i0"},
                        {"content": f"d{i}p{p}b{b}i1"},
                    ]}]}
                ]
            elif t == "table":
                # the non-table caption span must be FILTERED out
                blk["blocks"] = [
                    {"lines": [{"spans": [
                        {"type": "table",
                         "html": f"<tr>d{i}p{p}b{b}</tr>",
                         "image_path": f"t{i}_{p}_{b}.png"},
                        {"type": "text", "content": "cap"},
                    ]}]}
                ]
            else:  # image: slice(…, 1, 1) keeps only the first span
                blk["lines"] = [{"spans": [
                    {"image_path": f"m{i}_{p}_{b}.png"},
                    {"image_path": "dropped.png"},
                ]}]
            key = ("para_blocks", "preproc_blocks",
                   "discarded_blocks")[(i + p + b) % 3]
            lists[key].append(blk)
        pages.append({"page_idx": p, **lists})
    return {"doc_id": str(i), "pdf_info": pages}


def _doc_ids(sf_dir: str) -> list:
    import duckdb

    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    try:
        rows = con.execute(
            f"select doc_id from read_parquet('{path}') order by doc_id"
        ).fetchall()
    except Exception:
        rows = con.execute(
            "select doc_id from read_parquet("
            f"'{path}/*.parquet') order by doc_id"
        ).fetchall()
    return [r[0] for r in rows]


def ensure_mineru_jsonl(sf_dir: str) -> str:
    """Generate (once, cached) the deterministic middle-JSON corpus
    for ``sf_dir``'s doc_ids; returns the JSONL path. Driver-local by
    design — on a real cluster the corpus would live on shared
    storage, but here the JSONL is test input, not engine state.

    Cache identity (round-6 ADVICE): the filename is keyed on a digest
    of the ORDERED doc_id list plus the recipe version — two sf dirs
    that share a basename and doc count but differ in ids can no
    longer alias each other's corpus — and the file lives under a
    dedicated cache dir rather than bare /tmp, so os.replace never
    lands on a foreign sticky-bit file."""
    import hashlib
    import json
    import tempfile

    ids = _doc_ids(sf_dir)
    digest = hashlib.md5(
        (f"v{_SRC_GEN_VERSION}:" + ",".join(str(i) for i in ids)).encode()
    ).hexdigest()[:16]
    # per-user cache root with owner verification (round-7 ADVICE): a
    # fixed name in world-writable /tmp can be pre-created (squatted)
    # by another user — either DoS'ing writes or substituting content a
    # later process would silently consume. uid-suffixed dir, 0o700,
    # ownership checked after creation.
    root = os.path.join(
        tempfile.gettempdir(), f"ddspark-mineru-cache-{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"mineru cache dir {root!r} is owned by uid {st.st_uid}, "
            f"not the current user — refusing to use a squatted cache"
        )
    path = os.path.join(root, f"mineru-src-{digest}.jsonl")
    if os.path.exists(path):
        return path
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        for i in ids:
            f.write(json.dumps(_src_doc(int(i))) + "\n")
    os.replace(tmp, path)  # atomic: concurrent callers converge
    return path


def mineru_source_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 driver row: generated middle-JSON → declarative reader →
    per-doc scalar checksums (count / offset sum / md5-prefix sum over
    the canonical span string)."""
    path = ensure_mineru_jsonl(sf_dir)
    spans = spans_from_mineru_json(spark, path)
    return spans.selectExpr(
        "cast(doc_id as bigint) as doc_id",
        "cast(size(spans) as bigint) as n_spans",
        "aggregate(spans, cast(0 as bigint),"
        " (a, s) -> a + s.offset) as offset_sum",
        "aggregate(transform(spans, s -> cast(conv(substr(md5("
        "concat_ws(char(31), s.kind, s.text, s.media_ref,"
        " cast(s.offset as string))), 1, 8), 16, 10) as bigint)),"
        " cast(0 as bigint), (a, v) -> a + v) as hash_sum",
    )


def mineru_source_checksums_sql() -> str:
    """DuckDB mirror: the generation recipe + reader fold re-derived
    as pure integer arithmetic over the documents table's doc_ids."""
    sep = "chr(31)"
    canon = (
        f"kind || {sep} || text || {sep} || media_ref || {sep} "
        "|| CAST(off AS VARCHAR)"
    )
    return f"""
WITH docs AS (SELECT doc_id AS i FROM documents),
pages AS (
  SELECT i, r.range AS p FROM docs, range(3) r WHERE r.range < 1 + i % 3
),
blocks AS (
  SELECT i, p, rb.range AS b,
         (i + p + rb.range) % 5 AS t,
         (rb.range * 7 + 3) % (2 + (i + p) % 4) AS yrank
  FROM pages, range(5) rb WHERE rb.range < 2 + (i + p) % 4
),
bspans AS (
  SELECT i, p, b, yrank, rs.range AS sidx,
    CASE WHEN t = 0 THEN 'text' WHEN t = 1 THEN 'title'
         WHEN t = 2 THEN 'list' WHEN t = 3 THEN 'table'
         ELSE 'media' END AS kind,
    CASE WHEN t <= 1 THEN 'd'||i||'p'||p||'b'||b||'l'||rs.range
         WHEN t = 2 THEN 'd'||i||'p'||p||'b'||b||'i'||rs.range
         WHEN t = 3 THEN '<tr>d'||i||'p'||p||'b'||b||'</tr>'
         ELSE '' END AS text,
    CASE WHEN t = 3 THEN 't'||i||'_'||p||'_'||b||'.png'
         WHEN t = 4 THEN 'm'||i||'_'||p||'_'||b||'.png'
         ELSE '' END AS media_ref
  FROM blocks, range(2) rs
  WHERE rs.range < CASE WHEN t <= 1 THEN 1 + (i + b) % 2
                        WHEN t = 2 THEN 2 ELSE 1 END
),
ordered AS (
  SELECT i, kind, text, media_ref,
         p * 1000 + row_number()
           OVER (PARTITION BY i, p ORDER BY yrank, sidx) - 1 AS off
  FROM bspans
)
SELECT i AS doc_id,
  COUNT(*)::BIGINT AS n_spans,
  SUM(off)::BIGINT AS offset_sum,
  SUM(('0x' || substr(md5({canon}), 1, 8))::BIGINT)::BIGINT AS hash_sum
FROM ordered GROUP BY i
"""
