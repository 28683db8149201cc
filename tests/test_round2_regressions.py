"""Round-2 regression tests for the ADVICE.md findings.

1. K1 `_split_oversized` pieces shared one `pages` list, so the merge
   loop's in-place append leaked pages into every earlier piece of a
   split element (silent output corruption in the default chunker).
2. HTML table link-density filtering was dead: anchors opened inside a
   table never incremented `_a_depth`, so `_table_link_chars` stayed 0
   and link-dense nav tables were never dropped; meanwhile an in-table
   ``</a>`` decremented an OUTER link's depth, unbalancing counts.
3. A user-supplied `toc_params["section_pattern"]` with no capturing
   group raised IndexError per document, which the fallback cascade
   silently converted into K5 window chunks for the whole document.
"""

import re

import pytest

from deepdoc_api_spark.kernels.chunkers import hybrid_chunks
from deepdoc_api_spark.kernels.html_extract import extract_html_blocks
from deepdoc_api_spark.kernels.pipeline import records_to_chunks
from deepdoc_api_spark.kernels.toc import (
    DEFAULT_SECTION_PATTERN,
    get_sections,
    toc_chunks,
)


def rec(kind, content, page=1, media_ref=""):
    return {
        "kind": kind,
        "content": content,
        "media_ref": media_ref,
        "page": page,
        "offset": page * 1000,
    }


# ---------------------------------------------------------------------------
# 1. split pieces must own their pages
# ---------------------------------------------------------------------------


def test_split_pieces_do_not_share_pages():
    # oversized page-1 element (splits into >= 2 pieces under budget=40)
    # followed by a small page-2 element of the same kind/headings that
    # merges into the LAST piece only
    # 110 words → pieces of 40/40/30 tokens under budget=40, so the
    # 2-token tail merges into the LAST piece (30+2 <= 40)
    long_text = " ".join(f"word{i}" for i in range(110))
    records = [rec("text", long_text, page=1), rec("text", "tiny tail", page=2)]
    chunks = hybrid_chunks(records, budget=40)
    assert len(chunks) >= 3, "expected the long element to split"
    # every chunk except the last must report ONLY page 1
    for ch in chunks[:-1]:
        assert ch["pages"] == [1], (
            f"page leak across split siblings: {ch['pages']!r}"
        )
    assert chunks[-1]["pages"] == [1, 2]


def test_split_pieces_pages_disjoint_objects():
    long_text = " ".join(f"w{i}" for i in range(120))
    chunks = hybrid_chunks([rec("text", long_text, page=3)], budget=40)
    ids = [id(ch["pages"]) for ch in chunks]
    assert len(set(ids)) == len(ids), "pieces share a pages list object"


# ---------------------------------------------------------------------------
# 2. table link-density filtering
# ---------------------------------------------------------------------------


def test_link_dense_table_dropped():
    html = (
        "<table><tr>"
        '<td><a href="/a">alpha beta gamma delta</a></td>'
        '<td><a href="/b">epsilon zeta eta theta</a></td>'
        "</tr></table>"
    )
    assert extract_html_blocks(html) == []


def test_mostly_text_table_kept():
    html = (
        "<table><tr>"
        "<td>alpha beta gamma delta epsilon zeta eta theta</td>"
        '<td>see <a href="/x">x</a></td>'
        "</tr></table>"
    )
    out = extract_html_blocks(html)
    assert [b["kind"] for b in out] == ["table"]


def test_in_table_anchor_close_does_not_unbalance_outer_links():
    # the </a> inside the table previously decremented an outer link's
    # depth, making the long paragraph AFTER it count as link text and
    # survive/fail density checks wrongly
    html = (
        "<table><tr><td><a href='/in'>in</a> plain cell text here</td>"
        "</tr></table>"
        "<p>this paragraph has plenty of ordinary body text that must "
        "not be counted as anchor text by an unbalanced depth</p>"
    )
    out = extract_html_blocks(html)
    kinds = [b["kind"] for b in out]
    assert "text" in kinds, f"paragraph lost: {out!r}"


# ---------------------------------------------------------------------------
# 3. section_pattern without a capturing group
# ---------------------------------------------------------------------------

_NOGROUP = r"^\d+(?:\.\d+)*"


def _numbered_records():
    return [
        rec("title", "1 Intro"),
        rec("text", "intro body text"),
        rec("title", "1.1 Details"),
        rec("text", "details body text"),
        rec("title", "2 Methods"),
        rec("text", "methods body text"),
    ]


def test_nogroup_pattern_equivalent_to_default():
    records = _numbered_records()
    got = toc_chunks(records, pattern=_NOGROUP)
    want = toc_chunks(records, pattern=DEFAULT_SECTION_PATTERN)
    assert got == want
    assert get_sections(records, _NOGROUP) == get_sections(
        records, DEFAULT_SECTION_PATTERN
    )


def test_nogroup_pattern_does_not_degrade_to_fallback():
    chunks = records_to_chunks(
        "doc-x",
        _numbered_records(),
        chunker_type="toc",
        toc_params={"section_pattern": _NOGROUP},
    )
    assert chunks, "no chunks produced"
    assert all(c["extractor_used"] == "primary" for c in chunks)
    assert any("Intro" in c["text"] for c in chunks)


def test_optional_group_matching_empty_falls_back_to_group0():
    # a group that exists but does not participate must not crash either
    pat = r"^(?:(\d+(?:\.\d+)*)|[A-Z]+\.)"
    records = [rec("title", "IV. Appendix"), rec("text", "appendix body")]
    chunks = toc_chunks(records, pattern=pat)
    assert len(chunks) == 1


def test_invalid_pattern_raises_driver_side(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents

    spans = spans_from_documents(spark, sf_dir, limit=2)
    with pytest.raises(re.error):
        chunk_documents(spans, "toc", toc_params={"section_pattern": "["})


# ---------------------------------------------------------------------------
# 4. driver canonicalizer compatibility: no array-typed cells in any
#    queries() projection (round-1 driver crash: "unhashable type: list"
#    inside pandas sort_values) — covers the three distinct projections
#    that err'd (the 5 extract variants share _pipeline_chunks)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    # media_features was consolidated into its value-exact flat twin in
    # round 4 (queries() holds exactly 50 entries, oracle-first)
    ["extract_chunks_hybrid", "media_features_flat", "chunks_with_embeddings"],
)
def test_driver_canonicalizer_compat(spark, sf_dir, name):
    import __spark_entry__ as entry_mod

    # chunks_with_embeddings left queries() in round 4,
    # media_features_flat in round 6, and the RAW extract_chunks
    # projection in round 7 (its driver row is now a checksum fold, but
    # entry() still hands the raw projection to the driver) — their
    # canonicalizer-compat projections stay pinned here by calling the
    # query fns directly
    if name == "chunks_with_embeddings":
        fn = entry_mod._q_chunks_with_embeddings
    elif name == "media_features_flat":
        fn = entry_mod._q_media_features_flat
    elif name == "extract_chunks_hybrid":
        fn = entry_mod._q_chunks("hybrid")
    else:
        fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    pdf = df.limit(200).toPandas()
    assert len(pdf) > 0
    # the driver's _canon: lexicographic sort over every column — crashes
    # on list cells, so this sort_values call IS the regression assertion
    pdf.sort_values(by=sorted(pdf.columns), ignore_index=True)


# ---------------------------------------------------------------------------
# 5. O9 bbox provenance reaches the chunk table end-to-end
# ---------------------------------------------------------------------------


def test_bbox_reaches_chunk_output(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents

    spans = spans_from_documents(spark, sf_dir, limit=30)
    chunks = chunk_documents(spans, "hybrid").select("bbox", "extractor_used")
    rows = chunks.collect()
    assert rows
    with_bbox = [r for r in rows if r["bbox"] is not None]
    assert with_bbox, "no chunk carries bbox provenance"
    for r in with_bbox[:200]:
        b = r["bbox"]
        assert b["width"] == b["right"] - b["left"]
        assert b["height"] == b["bottom"] - b["top"]
        assert b["area"] == b["width"] * b["height"]


def test_bbox_kernel_first_record_wins():
    from deepdoc_api_spark.kernels.bbox import span_bbox
    from deepdoc_api_spark.kernels.chunkers import hybrid_chunks
    from deepdoc_api_spark.kernels.layout import extract_records

    spans = [
        {"kind": "text", "text": "first block body words", "media_ref": "", "offset": 10},
        {"kind": "text", "text": "second block body words", "media_ref": "", "offset": 20},
    ]
    records = extract_records(spans)
    chunks = hybrid_chunks(records, budget=512)
    # both text records merge into one chunk; bbox = FIRST record's
    assert len(chunks) == 1
    assert chunks[0]["bbox"] == span_bbox(10)


# ---------------------------------------------------------------------------
# 6. flat-title oracle queries must actually exercise the fold branches
#    (a vacuous input would make the external hash check meaningless)
# ---------------------------------------------------------------------------


def test_mineru_flat_oracle_exercises_fold_branches(sf_dir):
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    df = con.execute(entry_mod.oracle_sql()["mineru_flat_chunks"]).df()
    assert (df["kind"] == "title").any(), "O4 suppression never fired"
    assert df["pages"].str.contains(",").any(), "O6 page-range merge never fired"
    assert (df["hierarchy"] == "").any(), "pre-first-title records missing"
    assert (df["hierarchy"] != "").any(), "hierarchy snapshot never set"


def test_hybrid_flat_oracle_exercises_all_merge_branches(sf_dir):
    """The K1 merge-boundary oracle is only meaningful if the greedy
    fill lands on BOTH sides of the budget across runs."""
    import duckdb

    from deepdoc_api_spark.ops.flat_pipeline import _hybrid_flat_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = _hybrid_flat_sql()
    probe = sql[: sql.index("slots AS (")] + (
        "probe AS (SELECT m12, m123, m23, count(*) n FROM dec2 GROUP BY 1,2,3)"
        " SELECT count(*) FROM probe"
    )
    n_branches = con.execute(probe).fetchone()[0]
    assert n_branches >= 3, f"only {n_branches} merge branches exercised"


# ---------------------------------------------------------------------------
# 7. multimodal resize / frame-sample plumbing
# ---------------------------------------------------------------------------


def test_fit_box_geometry():
    from deepdoc_api_spark.ops.multimodal import fit_box

    assert fit_box(512, 256, 256, 256) == (256, 128, 500)
    assert fit_box(100, 100, 256, 256) == (100, 100, 1000)  # never upscale
    assert fit_box(0, 100, 256, 256) == (0, 0, 0)
    w, h, _ = fit_box(1920, 1080, 256, 256)
    assert w <= 256 and h <= 256 and abs(w / h - 1920 / 1080) < 0.02


def test_frame_schedule():
    from deepdoc_api_spark.ops.multimodal import frame_timestamps_ms

    assert frame_timestamps_ms(3500, 1000) == [0, 1000, 2000, 3000]
    assert frame_timestamps_ms(0, 1000) == []
    assert frame_timestamps_ms(999, 1000) == [0]


def test_resize_and_frames_plumbing(spark, sf_dir):
    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.ops.multimodal import (
        media_catalog,
        resize_media,
        sample_frames,
    )

    cat = media_catalog(spans_from_documents(spark, sf_dir, limit=60))
    resized = resize_media(cat).collect()
    assert resized
    for r in resized:
        assert r["resized_w"] <= 256 and r["resized_h"] <= 256
        assert r["resized_w"] <= r["width"] and r["resized_h"] <= r["height"]
    frames = sample_frames(cat)
    pdf = frames.toPandas()
    assert (pdf.groupby("media_ref")["frame_idx"].apply(
        lambda s: sorted(s) == list(range(len(s)))
    )).all(), "frame_idx not dense per media"
    assert (pdf["ts_ms"] % 1000 == 0).all()


def test_real_decode_path_raises_cleanly():
    import pytest as _pytest

    from deepdoc_api_spark.ops.multimodal import decode_media

    with _pytest.raises(NotImplementedError):
        decode_media(b"x", "image", fake=False)


# ---------------------------------------------------------------------------
# 8. dedup keeper chains must terminate at surviving documents
# ---------------------------------------------------------------------------


def test_dedup_keeper_always_survives(spark, tmp_path):
    """An exact-dup's keeper that is itself a near-dup non-keeper must
    not be named as anyone's keeper: components close over the union of
    exact and near edges, so keepers always survive."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod

    base = " ".join(f"tok{i}" for i in range(30))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # 0 near-dup of 1/2 (one word differs); 1 and 2 identical
            "text": [base, base.replace("tok29", "tokX"), base.replace("tok29", "tokX")],
        }
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    docs.to_parquet(os.path.join(sf, "documents.parquet"))

    from deepdoc_api_spark.ops.dedup import dedup_verdicts, dedup_verdicts_sql

    got = {r["doc_id"]: (r["verdict"], r["keeper"]) for r in
           dedup_verdicts(spark, sf).collect()}
    assert got[0] == ("kept", 0)
    assert got[1] == ("exact_dup", 0) or got[1] == ("near_dup", 0)
    # the crucial assertion: doc 2's keeper must be the SURVIVOR (0),
    # never the dropped doc 1
    assert got[2][1] == 0, f"keeper points at a dropped doc: {got}"
    kept = {d for d, (v, _k) in got.items() if v == "kept"}
    assert all(k in kept for _v, k in got.values()), "non-surviving keeper"

    # oracle agrees on the same crafted table
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(dedup_verdicts_sql()).df()
    want = {int(r.doc_id): (r.verdict, int(r.keeper)) for r in odf.itertuples()}
    assert want == got


def test_iceberg_chunks_ddl_matches_engine_schema():
    """The Iceberg chunks DDL must cover every engine chunk column (a
    missing column makes writeTo().append() fail on first real use)."""
    from deepdoc_api_spark.job.iceberg import CHUNKS_DDL_COLS
    from deepdoc_api_spark.schema import CHUNK_COLUMNS

    ddl_cols = {c.strip().split()[0] for c in CHUNKS_DDL_COLS.split(", ")}
    missing = set(CHUNK_COLUMNS) - ddl_cols
    assert not missing, f"Iceberg chunks DDL missing engine columns: {missing}"
    for lineage_col in ("run_id", "input_snapshot", "partition_id"):
        assert lineage_col in ddl_cols
