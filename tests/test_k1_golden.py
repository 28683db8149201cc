"""K1 hybrid-chunker boundary semantics — golden cases.

docling is absent from this environment, so the K1 re-specification's
three boundary decisions (the likely divergence points a future docling
differential would probe) are pinned here explicitly as THE spec:

G1. **Heading context counts against the token budget.** An element
    whose body alone fits but whose contextualized text (headings +
    body) exceeds the budget MUST split — docling's HybridChunker
    tokenizes the contextualized serialization.
G2. **Exactly-at-budget merges are allowed.** The merge predicate is
    ``ctx + prev + el <= budget`` (inclusive), so a merge landing
    exactly on the budget succeeds and the NEXT element starts a new
    chunk.
G3. **A single oversized element splits on word boundaries** into
    pieces whose contextualized token count each fits the budget;
    pieces re-join words with single spaces; every piece repeats the
    heading context.
G4. **Piece capacity is floored at 32 body tokens** (``avail =
    max(budget - ctx, 32)``): a heading stack near or above the budget
    must not drive capacity to zero (infinite/degenerate splits) — the
    split keeps making progress at ≥32 tokens per piece even when
    context alone exhausts the budget.
"""

from deepdoc_api_spark.kernels.chunkers import hybrid_chunks
from deepdoc_api_spark.kernels.tokenizer import count_tokens


def rec(kind, content, page=1, media_ref=""):
    return {
        "kind": kind,
        "content": content,
        "media_ref": media_ref,
        "page": page,
        "offset": page * 1000,
    }


def test_g1_context_counts_against_budget():
    heading = "Heading Words Here"  # 3 tokens
    body = " ".join(f"w{i}" for i in range(40))  # 40 tokens
    assert count_tokens(heading) == 3 and count_tokens(body) == 40

    # budget 42: body alone (40) fits, context+body (43) does not → split
    chunks = hybrid_chunks([rec("title", heading), rec("text", body)], budget=42)
    assert len(chunks) > 1, "context tokens were not charged to the budget"
    for ch in chunks:
        assert count_tokens(ch["text"]) <= 42

    # budget 43: context+body exactly fits → single chunk
    chunks = hybrid_chunks([rec("title", heading), rec("text", body)], budget=43)
    assert len(chunks) == 1
    assert chunks[0]["text"] == heading + "\n" + body


def test_g2_exactly_at_budget_merge_allowed():
    a = " ".join(f"a{i}" for i in range(6))  # 6 tokens
    b = " ".join(f"b{i}" for i in range(6))  # 6 tokens
    c = "c0"  # 1 token
    # budget 12: a+b merges to exactly 12 (allowed, inclusive); c cannot
    # join (13 > 12) and starts the next chunk
    chunks = hybrid_chunks([rec("text", a), rec("text", b), rec("text", c)], budget=12)
    assert [ch["text"] for ch in chunks] == [a + "\n" + b, c]


def test_g3_single_oversized_element_splits_on_words():
    heading = "Top"  # 1 token of context on every piece
    words = [f"word{i}" for i in range(100)]
    chunks = hybrid_chunks(
        [rec("title", heading), rec("text", " ".join(words))], budget=41
    )
    # avail per piece = 41 - 1 = 40 words → 3 pieces of 40/40/20
    assert len(chunks) == 3
    got_words = []
    for ch in chunks:
        head, _, body = ch["text"].partition("\n")
        assert head == heading, "piece lost its heading context"
        piece_words = body.split(" ")
        assert len(piece_words) <= 40
        got_words.extend(piece_words)
    assert got_words == words, "split must preserve word order and content"


def test_g4_capacity_floor_under_heading_pressure():
    # heading consumes the whole budget; pieces still carry 32 tokens
    heading = " ".join(f"h{i}" for i in range(40))  # 40 tokens > budget
    words = [f"word{i}" for i in range(64)]
    chunks = hybrid_chunks(
        [rec("title", heading), rec("text", " ".join(words))], budget=36
    )
    assert len(chunks) == 2  # 64 words at floor-32 capacity → 32/32
    for ch in chunks:
        head, _, body = ch["text"].partition("\n")
        assert head == heading
        assert len(body.split(" ")) == 32


def test_g5_table_elements_merge_only_with_tables():
    """G5 (round-3 expansion, table-caption analogue): a table element
    is contextualized exactly like text — heading context prepended,
    the spec's stand-in for docling's caption+heading serialization of
    TableItems — but the peer merge is kind-homogeneous: text never
    absorbs a table; adjacent same-heading tables DO merge within the
    budget; kind survives onto the chunk."""
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("text", "some text body here"),
            rec("table", "<table>r1</table>"),
            rec("table", "<table>r2</table>"),
        ],
        budget=512,
    )
    assert [(ch["kind"], ch["text"]) for ch in chunks] == [
        ("text", "Head\nsome text body here"),
        ("table", "Head\n<table>r1</table>\n<table>r2</table>"),
    ]
    # over-budget adjacent tables do NOT merge
    big = " ".join(f"t{i}" for i in range(30))  # 30 tokens each
    chunks = hybrid_chunks(
        [rec("title", "Head"), rec("table", big), rec("table", big)], budget=40
    )
    assert [ch["kind"] for ch in chunks] == ["table", "table"]


def test_g6_picture_items_pass_through_and_break_merges():
    """G6 (round-3 expansion, picture-item handling): a media element
    is its own chunk — empty text, zero token cost, media_ref and the
    heading snapshot preserved — and it BREAKS the peer merge of the
    texts around it (the next text's predecessor is the media chunk,
    so same-heading texts separated by a picture stay separate)."""
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("text", "alpha beta"),
            rec("media", "", media_ref="m://1"),
            rec("text", "gamma delta"),
        ],
        budget=512,
    )
    assert [(ch["kind"], ch["text"], ch["media_ref"]) for ch in chunks] == [
        ("text", "Head\nalpha beta", ""),
        ("media", "", "m://1"),
        ("text", "Head\ngamma delta", ""),
    ]
    assert chunks[1]["headings"] == ["Head"]

    # K2: same pass-through contract (one element per block)
    from deepdoc_api_spark.kernels.chunkers import hierarchical_chunks

    k2 = hierarchical_chunks(
        [rec("title", "Head"), rec("media", "", media_ref="m://2"),
         rec("table", "<t>x</t>")]
    )
    assert [(c["kind"], c["text"], c["media_ref"]) for c in k2] == [
        ("media", "", "m://2"),
        ("table", "Head\n<t>x</t>", ""),
    ]


def test_g7_caption_attachment():
    """G7 (round-4 expansion): docling never emits caption items as
    their own chunks — a caption rides on its Table/Picture item's
    ``meta.captions`` and ``contextualize()`` serializes headings +
    captions + body (docling-core chunking/hierarchical_chunker.py;
    docs: Concepts > Chunking). Flat-stream spec: captions attach
    FORWARD to an immediately-following table/media record, else
    BACKWARD to an immediately-preceding table/media element under the
    same headings, else degrade to plain text. Caption tokens charge
    the K1 budget like heading context and repeat on split pieces."""
    # forward attach: caption above the table (MinerU order)
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("caption", "Table 1: stats"),
            rec("table", "<table>r1</table>"),
        ],
        budget=512,
    )
    assert [(c["kind"], c["text"]) for c in chunks] == [
        ("table", "Head\nTable 1: stats\n<table>r1</table>")
    ]

    # backward attach: figure caption below the image; the media chunk
    # serializes headings + caption (its only textual content)
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("media", "", media_ref="m://1"),
            rec("caption", "Figure 1: a duck"),
            rec("text", "after"),
        ],
        budget=512,
    )
    assert [(c["kind"], c["text"], c["media_ref"]) for c in chunks] == [
        ("media", "Head\nFigure 1: a duck", "m://1"),
        ("text", "Head\nafter", ""),
    ]

    # orphan caption (no adjacent table/media) degrades to text and
    # peer-merges like any text element
    chunks = hybrid_chunks(
        [rec("title", "Head"), rec("caption", "dangling"), rec("text", "body")],
        budget=512,
    )
    assert [(c["kind"], c["text"]) for c in chunks] == [
        ("text", "Head\ndangling\nbody")
    ]

    # caption tokens charge the budget like heading context: ctx =
    # Head(1) + caption(3) = 4, body 40; budget 43 -> avail 39 < 40 ->
    # split. Were captions free, avail would be 42 >= 40 -> no split.
    capt = "cap one two"  # 3 tokens
    body = " ".join(f"t{i}" for i in range(40))  # 40 tokens
    chunks = hybrid_chunks(
        [rec("title", "Head"), rec("caption", capt), rec("table", body)],
        budget=43,
    )
    assert len(chunks) == 2, "caption tokens were not charged to the budget"
    for ch in chunks:
        head, cap_line = ch["text"].split("\n")[:2]
        assert (head, cap_line) == ("Head", capt), "piece lost its caption"

    # same-heading tables with DIFFERENT captions do not merge
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("caption", "Table 1"),
            rec("table", "<t>a</t>"),
            rec("caption", "Table 2"),
            rec("table", "<t>b</t>"),
        ],
        budget=512,
    )
    assert [c["text"] for c in chunks] == [
        "Head\nTable 1\n<t>a</t>",
        "Head\nTable 2\n<t>b</t>",
    ]


def test_g7_caption_page_provenance_symmetric():
    """Forward- and backward-attached captions contribute their page to
    the element's provenance identically (round-4 review fix: the
    forward path silently dropped the caption's page)."""
    # forward: caption on page 3, table starts page 4
    chunks = hybrid_chunks(
        [
            rec("caption", "Table 1: stats", page=3),
            rec("table", "<t>x</t>", page=4),
        ],
        budget=512,
    )
    assert len(chunks) == 1
    assert sorted(chunks[0]["pages"]) == [3, 4]

    # backward: image on page 3, caption below on page 4 — same shape
    chunks = hybrid_chunks(
        [
            rec("media", "", page=3, media_ref="m://1"),
            rec("caption", "Fig 1", page=4),
        ],
        budget=512,
    )
    assert len(chunks) == 1
    assert sorted(chunks[0]["pages"]) == [3, 4]


def test_g9_context_is_never_split():
    """G9: context (headings + captions) rides WHOLE on every chunk and
    is never itself split — docling meta semantics. A chunk whose
    context alone exceeds the budget is therefore over-budget by
    construction, consistently across kinds: the BODY fits
    ``max(budget - ctx, 32)``, the context does not count as splittable
    text. Three shapes pinned: captioned media (pure-context chunk),
    giant-caption table (body splits, caption repeats intact), giant
    heading stack over text (G4's floor, restated vs captions)."""
    giant_cap = " ".join(f"c{i}" for i in range(80))  # 80 tokens > budget 40

    # captioned media: single chunk, full caption, no split attempt
    chunks = hybrid_chunks(
        [rec("caption", giant_cap), rec("media", "", media_ref="m://1")],
        budget=40,
    )
    assert [(c["kind"], c["media_ref"]) for c in chunks] == [("media", "m://1")]
    assert chunks[0]["text"] == giant_cap

    # giant-caption table: the BODY splits at the 32-token floor and
    # every piece repeats the intact caption
    body = " ".join(f"w{i}" for i in range(64))  # 64 tokens
    chunks = hybrid_chunks(
        [rec("caption", giant_cap), rec("table", body)], budget=40
    )
    assert len(chunks) == 2, "body under context pressure must still split"
    for ch in chunks:
        assert ch["text"].startswith(giant_cap + "\n"), "caption was split"
        piece_body = ch["text"][len(giant_cap) + 1 :]
        assert count_tokens(piece_body) <= 32


def test_g7_k2_caption_attachment():
    from deepdoc_api_spark.kernels.chunkers import hierarchical_chunks

    k2 = hierarchical_chunks(
        [
            rec("title", "Head"),
            rec("caption", "Table 1: stats"),
            rec("table", "<t>x</t>"),
            rec("media", "", media_ref="m://9"),
            rec("caption", "Fig 1"),
        ]
    )
    assert [(c["kind"], c["text"]) for c in k2] == [
        ("table", "Head\nTable 1: stats\n<t>x</t>"),
        ("media", "Head\nFig 1"),
    ]


def test_g8_nested_list_merge_under_budget():
    """G8 (round-4 expansion): docling's ``merge_list_items=True``
    merges consecutive list items — nested sub-items included — into
    ONE element in document order (docling-core
    chunking/hierarchical_chunker.py); under HybridChunker the merged
    list is then budget-split as a unit, each piece re-carrying the
    heading context, body re-whitespaced per the G3 oversized-split
    rule (indentation does not survive a split; it DOES survive an
    unsplit merge)."""
    items = ["- alpha", "  - alpha.1", "  - alpha.2", "- beta"]
    recs = [rec("title", "Head")] + [rec("list", i) for i in items]

    # fits the budget: one list chunk, nesting whitespace preserved
    chunks = hybrid_chunks(recs, budget=512)
    assert [(c["kind"], c["text"]) for c in chunks] == [
        ("list", "Head\n" + "\n".join(items))
    ]

    # a list item under a DIFFERENT heading starts a new element
    recs2 = recs + [rec("title", "Other"), rec("list", "- gamma")]
    chunks = hybrid_chunks(recs2, budget=512)
    assert [c["text"] for c in chunks] == [
        "Head\n" + "\n".join(items),
        "Other\n- gamma",
    ]

    # merged list exceeding the budget splits as ONE unit on word
    # boundaries: kind stays 'list', heading repeats, pieces fit
    big = [f"- item{i} body{i}" for i in range(20)]  # 60 tokens merged
    chunks = hybrid_chunks(
        [rec("title", "Head")] + [rec("list", i) for i in big], budget=41
    )
    assert len(chunks) == 2  # avail 40/piece -> 40/20
    for ch in chunks:
        assert ch["kind"] == "list"
        head, _, body = ch["text"].partition("\n")
        assert head == "Head"
        assert len(body.split(" ")) <= 40
    rejoined = " ".join(
        ch["text"].partition("\n")[2] for ch in chunks
    )
    assert rejoined == " ".join(" ".join(big).split())


def test_g10_peer_merge_crosses_page_boundaries():
    """G10 (round-5 expansion): docling's HybridChunker merges
    same-metadata peers by comparing ``meta.headings``/``meta.captions``
    only — provenance pages play no part in the predicate, and the
    merged chunk's provenance is the union of its contributors'
    (docling-core ``chunking/hybrid_chunker.py``
    ``_merge_chunks_with_matching_metadata``; ``DocMeta.doc_items``
    accumulates provenance). A page break between two text peers must
    NOT break the merge; the chunk carries both pages. A media item
    between them DOES break it (docling: a PictureItem is its own
    chunk boundary; G6)."""
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("text", "one two three", page=2),
            rec("text", "four five", page=3),
        ],
        budget=512,
    )
    assert [(c["kind"], c["text"], c["pages"]) for c in chunks] == [
        ("text", "Head\none two three\nfour five", [2, 3])
    ]

    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("text", "one two three", page=2),
            rec("media", "", page=2, media_ref="m://x"),
            rec("text", "four five", page=3),
        ],
        budget=512,
    )
    assert [(c["kind"], c["pages"]) for c in chunks] == [
        ("text", [2]),
        ("media", [2]),
        ("text", [3]),
    ]


def test_g11_list_merge_requires_consecutive_items():
    """G11 (round-5 expansion): docling's ``merge_list_items=True``
    merges only CONSECUTIVE list items (docling-core
    ``chunking/hierarchical_chunker.py`` accumulates ``ListItem``s and
    flushes the group when a non-list item arrives) — a text item
    between two list items yields two separate list elements, and the
    later list does NOT reach back across the text."""
    chunks = hybrid_chunks(
        [
            rec("title", "Head"),
            rec("list", "- a"),
            rec("text", "interruption text goes here to pass min"),
            rec("list", "- b"),
        ],
        budget=512,
    )
    assert [(c["kind"], c["text"]) for c in chunks] == [
        ("list", "Head\n- a"),
        ("text", "Head\ninterruption text goes here to pass min"),
        ("list", "Head\n- b"),
    ]


def test_g12_heading_stack_trims_to_level_then_appends():
    """G12 (round-5 expansion): heading levels drive the context stack
    — a new heading first TRIMS the stack to ``level - 1`` entries,
    then appends itself (docling-core HierarchicalChunker keys heading
    context by level: a same-level heading REPLACES its predecessor, a
    deeper one nests, a shallower one pops everything below it). Level
    = dotted-number depth of the leading section number, else 1 (the
    engine's documented level source, kernels/toc.py:_title_level)."""
    seq = [
        rec("title", "1 Intro"),
        rec("text", "alpha beta"),
        rec("title", "1.1 Sub"),
        rec("text", "gamma delta"),
        rec("title", "2 Next"),
        rec("text", "epsilon zeta"),
    ]
    chunks = hybrid_chunks(seq, budget=512)
    assert [(tuple(c["headings"]), c["text"]) for c in chunks] == [
        (("1 Intro",), "1 Intro\nalpha beta"),
        (("1 Intro", "1.1 Sub"), "1 Intro\n1.1 Sub\ngamma delta"),
        (("2 Next",), "2 Next\nepsilon zeta"),
    ]
    # and merges never bridge a heading change (distinct meta — G10's
    # predicate seen from the negative side)
    assert len(chunks) == 3


def test_g13_token_counting_is_uncapped_past_model_max():
    """G13 (round 6): token counting never clamps at the embedding
    model's max length. docling-core's HybridChunker counts via
    ``tokenizer.tokenize(text)`` (tokenization, not encoding), which
    NEVER truncates — truncation is an encode-time option — so a body
    far beyond the 512 max counts at its full length, and the split
    loop divides it into the arithmetically right number of pieces. A
    counter that silently clamped at 512 (an easy bug when wiring an
    HF tokenizer with ``truncation=True``) would emit ONE piece and
    break budget soundness. Engine mirror: ``count_tokens`` is exact
    at any length; pinned against the closed-form piece count."""
    budget = 512
    n_words = 6000  # each word = 1 token under the regex tokenizer
    body = " ".join(f"w{i}" for i in range(n_words))
    assert count_tokens(body) == n_words, "count must not clamp at 512"

    heading = "Intro"
    ctx = count_tokens(heading)
    chunks = hybrid_chunks([rec("title", heading), rec("text", body)],
                           budget=budget)
    avail = budget - ctx
    import math

    assert len(chunks) == math.ceil(n_words / avail)
    # every piece fits: body tokens <= budget - ctx, context repeated
    for c in chunks:
        assert c["headings"] == [heading]
        assert count_tokens(c["text"]) <= budget
    # no words lost or reordered across the split
    rejoined = " ".join(
        c["text"].split("\n", 1)[1] for c in chunks
    )
    assert rejoined == body
