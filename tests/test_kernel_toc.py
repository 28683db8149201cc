"""Unit tests for the TOC chunker (K3) — mirrors toc_chunker.py rules."""

from deepdoc_api_spark.kernels.toc import (
    get_sections,
    process_sections,
    toc_chunks,
)


def rec(kind, content, page=1):
    return {
        "kind": kind,
        "content": content,
        "media_ref": "",
        "page": page,
        "offset": page * 1000,
    }


def test_basic_sections_and_hierarchy():
    records = [
        rec("title", "1 Introduction"),
        rec("text", "intro body"),
        rec("title", "1.1 Scope"),
        rec("text", "scope body"),
        rec("title", "2 Methods", page=2),
        rec("text", "methods body", page=2),
    ]
    secs = get_sections(records)
    assert [s["name"] for s in secs] == ["1 Introduction", "1.1 Scope", "2 Methods"]
    assert secs[0]["hierarchy"] == []
    assert secs[1]["hierarchy"] == ["1 Introduction"]
    assert secs[2]["hierarchy"] == []
    assert secs[2]["page_no"] == 2

    chunks = toc_chunks(records)
    # section 1 gathers until 2 Methods (1.1 is deeper -> contributes text)
    assert chunks[0]["text"] == (
        "1 Introduction\nintro body\n\n1.1 Scope\n\nscope body"
    )
    assert chunks[1]["text"] == "1 Introduction\n1.1 Scope\nscope body"
    assert chunks[2]["text"] == "2 Methods\nmethods body"
    assert chunks[1]["hierarchy"] == ["1 Introduction"]
    assert chunks[1]["headings"] == ["1.1 Scope"]


def test_continuation_header_repair():
    # un-numbered header followed by a numbered sibling inherits the
    # expected previous number (toc_chunker.py:95-110)
    records = [
        rec("title", "3.4.1 First"),
        rec("text", "a"),
        rec("title", "Continued Part"),  # no number, last_match was set...
        rec("text", "b"),
    ]
    # last_match truthy after 3.4.1 -> after the bare header last_match
    # becomes None; add a following numbered header to trigger repair
    records.append(rec("title", "3.4.3 Third"))
    records.append(rec("text", "c"))
    secs = get_sections(records)
    names = [s["name"] for s in secs]
    # bare header repaired to "3.4.2 Continued Part"
    assert "3.4.2 Continued Part" in names
    repaired = next(s for s in secs if s["name"] == "3.4.2 Continued Part")
    # hierarchy_stack held one entry at repair time -> [:-1] is empty
    assert repaired["hierarchy"] == []


def test_repair_rank_zero_drops_rank():
    # expected rank 0 -> no rank appended (toc_chunker.py:103-105)
    records = [
        rec("title", "Bare Header"),
        rec("text", "x"),
        rec("title", "2.1 Numbered"),
        rec("text", "y"),
    ]
    secs = get_sections(records)
    # parts = [2,1], pop -> [2]; rank = 1-1 = 0 -> not appended -> "2"
    assert secs[0]["name"] == "2 Bare Header"


def test_duplicate_section_removal():
    records = []
    for i in range(3):
        records.append(rec("title", f"{i + 1} References"))
        records.append(rec("text", f"body {i}"))
    records.append(rec("title", "4 Unique"))
    records.append(rec("text", "u"))
    secs = get_sections(records)
    names = [s["name"] for s in secs]
    # cleaned name "References" occurs 3x (>=2) -> removed via the
    # reference's mutate-during-iteration loop: removes items 0 and 2,
    # skips item 1 (observable reference behavior, reproduced)
    assert "1 References" not in names
    assert "3 References" not in names
    assert "2 References" in names
    assert "4 Unique" in names


def test_same_number_merge_with_word_dedup():
    sections = [
        {"name": "2.1 Alpha Beta", "hierarchy": [], "page_no": 1, "level": 2, "idx": 0},
        {"name": "2.1 Beta Gamma", "hierarchy": [], "page_no": 1, "level": 2, "idx": 2},
    ]
    merged = process_sections(sections, r"^(\d+(?:\.\d+)*)")
    assert len(merged) == 1
    # overlapping words removed from the second name before concat
    assert merged[0]["name"] == "2.1 Alpha Beta Gamma"


def test_chunk_stops_at_same_or_higher_level():
    records = [
        rec("title", "1 A"),
        rec("text", "a-body"),
        rec("title", "2 B"),
        rec("text", "b-body"),
    ]
    chunks = toc_chunks(records)
    assert chunks[0]["text"] == "1 A\na-body"
    assert chunks[1]["text"] == "2 B\nb-body"


def test_empty_section_skipped():
    records = [
        rec("title", "1 Empty"),
        rec("title", "2 Full"),
        rec("text", "content"),
    ]
    chunks = toc_chunks(records)
    # "1 Empty" gathers only "2 Full"?? no: 2 is same level -> break ->
    # empty content -> skipped
    assert [c["headings"][0] for c in chunks] == ["2 Full"]


def test_media_skipped_in_gather():
    records = [
        rec("title", "1 S"),
        rec("media", ""),
        rec("text", "body"),
    ]
    chunks = toc_chunks(records)
    assert chunks[0]["text"] == "1 S\nbody"


def test_approved_sections_filter():
    records = [
        rec("title", "1 A"),
        rec("text", "a"),
        rec("title", "2 B"),
        rec("text", "b"),
    ]
    secs = get_sections(records)
    only_b = [s for s in secs if s["name"] == "2 B"]
    chunks = toc_chunks(records, approved_sections=only_b)
    assert len(chunks) == 1
    assert chunks[0]["text"] == "2 B\nb"
