"""Unit tests for the layout kernel (O2-O6) against hand-built span
sequences — each case exercises a cited reference rule."""

from deepdoc_api_spark.kernels.layout import (
    extract_records,
    format_records,
    page_of_offset,
    parse_page_label,
    span_to_records,
)


def span(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_page_convention():
    assert page_of_offset(0) == 1
    assert page_of_offset(999) == 1
    assert page_of_offset(1000) == 2
    assert page_of_offset(5500) == 6


def test_unknown_kinds_dropped():
    # layout_processor.py:88-129 only handles title/text/list/table
    recs = extract_records([span("equation", "x=y", 10), span("text", "hello", 20)])
    assert [r["kind"] for r in recs] == ["text"]


def test_media_passthrough_order():
    recs = extract_records(
        [
            span("text", "a", 10),
            span("media", "", 20, "media://1/x.png"),
            span("text", "b", 30),
        ]
    )
    assert [(r["kind"], r["media_ref"]) for r in recs] == [
        ("text", ""),
        ("media", "media://1/x.png"),
        ("text", ""),
    ]


def test_table_keeps_media_ref():
    # layout_processor.py:116-129: table spans carry image_path
    from deepdoc_api_spark.kernels.bbox import span_bbox

    recs = extract_records([span("table", "<table>x</table>", 5, "img://t.png")])
    assert recs == [
        {
            "kind": "table",
            "content": "<table>x</table>",
            "media_ref": "img://t.png",
            "page": 1,
            "offset": 5,
            "bbox": span_bbox(5),
        }
    ]


# ---------------------------------------------------------------------------
# format_records — the fold
# ---------------------------------------------------------------------------


def rec(kind, content, page, media_ref=""):
    return {
        "kind": kind,
        "content": content,
        "media_ref": media_ref,
        "page": page,
        "offset": page * 1000,
    }


def test_hierarchy_prefix_and_snapshot():
    # layout_processor.py:168-172: non-title records get " >> " hierarchy
    # prefix + "\n" + content; empty hierarchy still yields leading "\n"
    out = format_records([rec("text", "intro", 1)])
    assert out == [
        {
            "page": "1",
            "content": "\nintro",
            "type": "text",
            "hierarchy": [],
            "media_ref": "",
            "bbox": None,
        }
    ]

    out = format_records([rec("title", "T1", 1), rec("text", "body", 1)])
    assert out[0]["content"] == "T1\nbody"
    assert out[0]["hierarchy"] == ["T1"]


def test_title_stack_pop_on_sibling():
    # layout_processor.py:142-153: a title following non-title content
    # pops the stack (sibling replacement) unless main-title case
    out = format_records(
        [
            rec("title", "A", 1),
            rec("text", "a-body", 1),
            rec("title", "B", 1),
            rec("text", "b-body", 1),
        ]
    )
    # First title A: hierarchy empty -> main_title=True, push A
    # B after text: main_title and len==1 -> else-branch pop -> push B
    assert out[0]["hierarchy"] == ["A"]
    # main_title=True, len(hierarchy)==1 -> falls to else: pop -> [B]
    assert out[1]["hierarchy"] == ["B"]
    assert out[1]["content"] == "B\nb-body"


def test_title_after_title_nests():
    # consecutive titles push without popping (last_type == "title")
    out = format_records(
        [rec("title", "A", 1), rec("title", "B", 1), rec("text", "x", 1)]
    )
    assert out[0]["hierarchy"] == ["A", "B"]
    assert out[0]["content"] == "A >> B\nx"


def test_main_title_special_case():
    # main_title with depth>1: drop last, then if still >2 keep only the
    # most recent (layout_processor.py:144-148)
    out = format_records(
        [
            rec("title", "Doc Title", 1),
            rec("title", "Ch 1", 1),
            rec("text", "c1", 1),
            rec("title", "Ch 2", 1),
            rec("text", "c2", 1),
        ]
    )
    # After Doc Title, Ch 1 (both titles, stacked): hierarchy [DT, Ch1],
    # main_title=True. Ch 2 after text: main_title & len>1 -> trim last
    # -> [DT]; len<=2 so keep; main_title=False; push Ch 2 -> [DT, Ch2]
    assert out[0]["hierarchy"] == ["Doc Title", "Ch 1"]
    assert out[1]["hierarchy"] == ["Doc Title", "Ch 2"]


def test_repeated_header_suppression():
    # layout_processor.py:131-134: content occurring >3 times (across
    # title AND text records) is blacklisted from the hierarchy
    seq = []
    for p in range(1, 6):
        seq.append(rec("title", "RUNNING HEAD", p))
        seq.append(rec("text", f"body{p}", p))
    out = format_records(seq)
    # suppressed title falls through to the else branch -> becomes a
    # plain record (type title) with hierarchy prefix
    assert all(o["hierarchy"] == [] for o in out)
    titles = [o for o in out if o["type"] == "title"]
    assert titles and all(o["content"] == "\nRUNNING HEAD" for o in titles)


def test_suppressed_title_merges_into_previous_formatted():
    # reference quirk: suppressed title with last_type == "title" merges
    # into the most recent *formatted* record regardless of its type
    # (layout_processor.py:154-167; accepted titles never enter the
    # formatted list, so last_data can be a text record)
    seq = [rec("text", "para", 1)]
    for _ in range(4):
        seq.append(rec("title", "HEAD", 1))
    seq.append(rec("title", "HEAD", 1))  # 5th occurrence
    # HEAD occurs 5 times -> suppressed. First HEAD: last_type="text",
    # type mismatch, no text->list -> else branch (plain record).
    # Subsequent HEADs: type==last_type=="title" -> merge into previous.
    out = format_records(seq)
    assert out[0]["content"] == "\npara"
    assert out[1]["type"] == "title"
    assert out[1]["content"] == "\nHEAD" + "\nHEAD" * 4


def test_adjacent_merge_same_type_and_text_list():
    # layout_processor.py:154-167
    out = format_records(
        [
            rec("text", "a", 1),
            rec("text", "b", 1),
            rec("list", "item1", 1),
            rec("list", "item2", 1),
            rec("table", "<t>1</t>", 1),
            rec("table", "<t>2</t>", 1),
        ]
    )
    # text+text merge, then list merges into text (text->list rule),
    # then list+list merge continues on the same record
    assert out[0]["content"] == "\na\nb\nitem1\nitem2"
    assert out[1]["content"] == "\n<t>1</t>\n<t>2</t>"
    assert len(out) == 2


def test_page_range_label():
    out = format_records(
        [rec("text", "a", 1), rec("text", "b", 2), rec("text", "c", 3)]
    )
    assert out[0]["page"] == "1 - 3"  # collapse keeps first start
    assert parse_page_label(out[0]["page"]) == [1, 2, 3]


def test_parse_page_label_fallbacks():
    assert parse_page_label("3") == [3]
    assert parse_page_label("3 - 5") == [3, 4, 5]
    assert parse_page_label("junk") == [1]
    assert parse_page_label("1 - 2 - 3") == [1]  # >2 parts -> ValueError -> [1]


def test_media_breaks_adjacency_and_keeps_hierarchy():
    out = format_records(
        [
            rec("title", "T", 1),
            rec("text", "a", 1),
            rec("media", "", 1, "media://m.png"),
            rec("text", "b", 1),
        ]
    )
    assert [o["type"] for o in out] == ["text", "media", "text"]
    assert out[1]["media_ref"] == "media://m.png"
    assert out[1]["content"] == ""
    assert out[1]["hierarchy"] == ["T"]
    # text after media does NOT merge with text before media
    assert out[2]["content"] == "T\nb"


def test_merge_keeps_first_media_ref():
    out = format_records(
        [rec("table", "<a>", 1, "img://1"), rec("table", "<b>", 1, "img://2")]
    )
    assert len(out) == 1
    assert out[0]["media_ref"] == "img://1"


def test_span_to_records_html_fanout():
    html = '<p>This paragraph has definitely enough characters.</p><img src="x.png">'
    recs = span_to_records("html", html, "", 2500)
    assert [r["kind"] for r in recs] == ["text", "media"]
    assert all(r["page"] == 3 for r in recs)


def test_sort_reading_order_restores_page_top_left():
    """O2: stable (page, top, left) sort — mirrors the reference's
    per-page y0/x0 block ordering (layout_processor.py:70-86)."""
    from deepdoc_api_spark.kernels.layout import sort_reading_order

    def rec(page, top, left, tag):
        return {
            "kind": "text", "content": tag, "media_ref": "",
            "page": page, "offset": 0,
            "bbox": {"top": float(top), "left": float(left)},
        }

    scrambled = [
        rec(2, 10, 0, "e"),
        rec(1, 50, 5, "c"),
        rec(1, 10, 300, "b"),
        rec(1, 10, 20, "a"),
        rec(1, 50, 5, "d"),  # exact tie with c: stable -> c before d
    ]
    out = [r["content"] for r in sort_reading_order(scrambled)]
    assert out == ["a", "b", "c", "d", "e"]

    # records without a bbox sort by page with (0, 0) geometry
    mixed = [rec(1, 5, 5, "y"), {"kind": "media", "content": "",
             "media_ref": "m", "page": 1, "offset": 0, "bbox": None}]
    out = [r["content"] for r in sort_reading_order(mixed)]
    assert out == ["", "y"]


def test_span_bbox_fused_equals_normalized():
    """Round-5 perf pass: span_bbox is the closed form of
    normalize_bbox(raw_bbox(offset)) — the fused fast path must equal
    the reference-semantics probing path for every convention residue
    and across page/modulus boundaries."""
    from deepdoc_api_spark.kernels.bbox import (
        normalize_bbox,
        raw_bbox,
        span_bbox,
    )

    offsets = list(range(0, 4096))
    offsets += [10**k + r for k in range(4, 10) for r in range(8)]
    for off in offsets:
        assert span_bbox(off) == normalize_bbox(raw_bbox(off)), off
