"""Replicates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables;
compare row count, column names, and order-insensitive values."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            con.execute(
                f"create view {t} as select * from"
                f" read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception:
            pass
    return con


def _norm(v):
    # DuckDB returns Decimal for some integer aggs; normalize numerics
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return int(v) if v == int(v) else float(v)
    except Exception:
        pass
    return v


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    scols = sdf.columns

    con = _duck(sf_dir)
    sql = entry_mod.oracle_sql()[name]
    if name == "rng_chunk_checksums":
        # the entry-module SQL pins the driver's sf0.01 golden; the
        # local replica regenerates the golden for the test sf_dir
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_sql

        sql = rng_chunk_checksums_sql(sf_dir)
    elif name.startswith("extract_chunks_"):
        from deepdoc_api_spark.ops.rng_oracle import rng_chunk_checksums_one_sql

        sql = rng_chunk_checksums_one_sql(sf_dir, name.removeprefix("extract_chunks_"))
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert sorted(srows) == sorted(drows), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns and "chunk_index" in df.columns


def test_every_query_oracle_bearing(spark):
    # round 7 (VERDICT #3): the extract_chunks_* tail folded to
    # golden-parquet checksums — EVERY queries() entry now has an
    # oracle_sql() twin, and the window still holds exactly 50 entries
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) == 50
    rows_only = [k for k in qs if k not in oracles]
    assert rows_only == [], rows_only


def test_raw_extract_chunks_run(spark, sf_dir):
    # the RAW full-row extract pipelines left queries() in round 7
    # (their driver rows are now the checksum folds); keep every
    # chunker's driver-shaped projection executed here so a crash in
    # the raw path surfaces in pytest, not in entry() (which still
    # returns the raw hybrid projection to the driver)
    for ct in ("hybrid", "hierarchical", "toc", "mineru", "fallback"):
        n = entry_mod._q_chunks(ct)(spark, sf_dir).count()
        assert n > 0, ct


def test_media_kind_histogram_pinned(spark, sf_dir):
    """media_kind_histogram left queries() in round 4 (replaced by the
    oracle-bearing iceberg_dry_run; its value-exact flat twins stay);
    this keeps the raw-corpus op itself executed and shape-checked."""
    from deepdoc_api_spark.ops.multimodal import media_kind_histogram

    rows = media_kind_histogram(
        entry_mod._spans_cached(spark, sf_dir)
    ).collect()
    assert rows, "empty media histogram"
    kinds = {r.media_kind for r in rows}
    assert kinds <= {"image", "audio", "video", "table", "unknown"}, kinds
    assert all(r.n_media > 0 for r in rows)


def test_mineru_flat_mixed_exercises_type_matrix(spark, sf_dir):
    """The mixed flat class must actually produce list/table/media
    chunks, page-range merges, and media refs — otherwise it certifies
    no more than the title/text family it extends."""
    import json

    from deepdoc_api_spark.ops.flat_pipeline import mineru_flat_mixed

    rows = mineru_flat_mixed(spark, sf_dir).collect()
    kinds = {r.kind for r in rows}
    assert {"text", "list", "table", "media"} <= kinds, kinds
    # adjacent-table merge keeps the FIRST table's t:// ref
    assert any(r.kind == "table" and r.media_ref.startswith("t://") for r in rows)
    assert any(r.kind == "media" and r.media_ref.startswith("m://") for r in rows)
    # merged runs cross page boundaries -> multi-page labels
    assert any(len(json.loads(r.pages)) > 1 for r in rows)
    # text->list merge: a 'text' chunk whose body contains a list group
    # exists iff slot-5 text merged slots 6-7 (kind stays 'text')
    text_multi = [r for r in rows if r.kind == "text" and "\n" in r.text]
    assert text_multi, "no merged text runs — the tt/tl matrix never fired"


def test_gopher_flag_branches_fire_on_synthetic_docs(spark, tmp_path):
    """The driver corpus is all-'ok'; pin every flag branch on docs
    constructed to trip each Gopher threshold."""
    import duckdb

    docs = spark.createDataFrame(
        [
            ("d_rep_lines", "same line\n" * 10 + "unique tail"),
            ("d_rep_bigrams", "very common " * 40 + "rare words end"),
            # distinct long words: bigrams all unique, so only the
            # word-length rule can fire
            ("d_long_words", " ".join(f"supercalifragilistic{i}" for i in range(30))),
            ("d_ok", "\n".join(f"line {i} with several normal words" for i in range(20))),
        ],
        "doc_id string, text string",
    )
    p = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(p)
    import os, shutil
    # the ops expect <sf_dir>/documents.parquet
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.move(p, os.path.join(sf, "documents.parquet"))

    from deepdoc_api_spark.ops.text_analysis import (
        GOPHER_REPETITION_SQL,
        gopher_repetition,
    )

    rows = {r.doc_id: r for r in gopher_repetition(spark, sf).collect()}
    assert rows["d_rep_lines"].gopher_flag == "repetitive_lines"
    assert rows["d_rep_bigrams"].gopher_flag == "repetitive_bigrams"
    assert rows["d_long_words"].gopher_flag == "odd_word_length"
    assert rows["d_ok"].gopher_flag == "ok"

    # and the oracle agrees on the synthetic corpus too
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"'{os.path.join(sf, 'documents.parquet')}/*.parquet'"
    )
    odf = con.execute(GOPHER_REPETITION_SQL).fetchdf()
    orows = {row["doc_id"]: row for _, row in odf.iterrows()}
    for d, r in rows.items():
        o = orows[d]
        assert (r.gopher_flag, r.dup_line_milli, r.top_bigram_milli,
                r.mean_word_len_centi) == (
            o["gopher_flag"], o["dup_line_milli"], o["top_bigram_milli"],
            o["mean_word_len_centi"],
        ), d


def test_simhash16_parity_pinned(spark, sf_dir):
    """simhash16 is outside the 50-entry driver window (out r4, in r6,
    out again r7; the 64-bit SimHash family stays driver-checked via
    simhash_words/simhash_near_dup_pairs); this keeps the 16-bit
    variant value-exact against its DuckDB oracle."""
    from deepdoc_api_spark.ops.dedup import SIMHASH16_SQL, simhash16

    sdf = simhash16(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck(sf_dir).execute(SIMHASH16_SQL)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols
    assert sorted(srows) == sorted(drows) and len(srows) > 0


def test_length_histogram_parity_pinned(spark, sf_dir):
    """length_histogram is outside the 50-entry driver window (out r5,
    in r6, out again r7 for the r6-new apply steps); this keeps it
    value-exact against its DuckDB oracle."""
    from deepdoc_api_spark.ops.text_analysis import (
        LENGTH_HISTOGRAM_SQL,
        length_histogram,
    )

    sdf = length_histogram(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck(sf_dir).execute(LENGTH_HISTOGRAM_SQL)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols
    assert sorted(srows) == sorted(drows) and len(srows) > 0


def test_window_dedup_semantics(spark, sf_dir):
    """The fixed-window dedup must (a) find real cross-doc duplicates
    on this corpus (non-vacuous), (b) keep exactly ONE occurrence of
    every duplicated window (the min-(doc_id,pos) keeper), and (c)
    leave sub-window tails untouched (cleaned length only shrinks by
    whole windows)."""
    from deepdoc_api_spark.ops.text_analysis import (
        WINDOW_DEDUP_W,
        window_dedup,
    )

    rows = window_dedup(spark, sf_dir).collect()
    assert sum(r.n_dropped for r in rows) > 0, "vacuous: no duplicates"
    assert all(r.n_dropped <= r.n_windows for r in rows)

    # re-derive the keeper rule independently from the raw text
    import duckdb

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    w = WINDOW_DEDUP_W
    total, uniq = con.execute(
        f"""
        WITH t AS (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS w
                   FROM documents),
        s AS (SELECT doc_id,
                     array_to_string(w[(i-1)*{w}+1 : i*{w}], ' ') AS sent
              FROM t, unnest(range(1, 1 + len(w) // {w})) AS u(i))
        SELECT count(*), count(DISTINCT sent) FROM s
        """
    ).fetchone()
    assert sum(r.n_dropped for r in rows) == total - uniq, (
        "dropped count must equal duplicate occurrences (keep-one rule)"
    )


def test_window_dedup_short_docs(spark, tmp_path):
    """Sub-W-word documents: Spark's sequence(1, 0) yields [1, 0] (a
    DESCENDING array, not empty), which un-guarded produced two phantom
    windows per short doc — duplicated cleaned text, a corpus-wide
    empty-window collision, and an oracle mismatch (round-5 review
    finding). The size guard must make short docs pure-tail rows,
    value-identical to the DuckDB oracle."""
    import os

    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "only three words"),
            (2, ""),
            (3, " ".join(f"w{i}" for i in range(10))),   # exactly W
            (4, " ".join(f"w{i}" for i in range(10)) + " tail words"),
            (5, " ".join(f"w{i}" for i in range(10))),   # dup of doc 3
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    from deepdoc_api_spark.ops.text_analysis import (
        window_dedup,
        window_dedup_sql,
    )

    rows = {r.doc_id: r for r in window_dedup(spark, sf).collect()}
    assert rows[1].n_windows == 0 and rows[1].n_dropped == 0
    assert rows[1].cleaned_chars == len("only three words")
    assert rows[3].n_windows == 1 and rows[3].n_dropped == 0
    assert rows[5].n_dropped == 1, "doc 5 duplicates doc 3's window"
    assert rows[5].cleaned_chars == 0

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"'{os.path.join(sf, 'documents.parquet')}/*.parquet'"
    )
    drows = sorted(
        tuple(_norm(v) for v in r)
        for r in con.execute(window_dedup_sql()).fetchall()
    )
    srows = sorted(
        tuple(_norm(v) for v in r) for r in window_dedup(spark, sf).collect()
    )
    assert srows == drows


def test_embedding_quantize_int8_parity_and_bound(spark, sf_dir):
    """int8 quantization (round 5, pytest-pinned — the 50-query window
    is full): value-exact vs the DuckDB mirror, plus the quantizer
    contract — reconstruction error is bounded by half a step
    (scale/2, plus a nano of floor slack) and constant/degenerate
    vectors quantize losslessly to scale 0."""
    from deepdoc_api_spark.ops.similarity import (
        EMBEDDING_QUANTIZE_INT8_SQL,
        embedding_quantize_int8,
    )

    sdf = embedding_quantize_int8(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck(sf_dir).execute(EMBEDDING_QUANTIZE_INT8_SQL)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols
    assert sorted(srows) == sorted(drows) and len(srows) > 0

    for vec_id, dim, scale_nano, zero_micro, codes_sum, max_err_nano in srows:
        assert 0 <= codes_sum <= 255 * dim
        # half-step bound: |x - recon| <= scale/2 (+1 nano floor slack)
        assert max_err_nano <= scale_nano // 2 + 1, vec_id


ROTATED_OUT = [
    # (name, spark_fn_path, sql_const_path) — rotated out of the
    # 50-entry driver window (rounds 6-7) to surface previously
    # pytest-only ops (VERDICT rotation policy); each stays
    # value-exact against its DuckDB oracle here.
    ("media_frames_flat",
     "deepdoc_api_spark.ops.flat_pipeline:media_frames_flat",
     "deepdoc_api_spark.ops.flat_pipeline:MEDIA_FRAMES_FLAT_SQL"),
    ("media_features_flat",
     "deepdoc_api_spark.ops.flat_pipeline:media_features_flat",
     "deepdoc_api_spark.ops.flat_pipeline:MEDIA_FEATURES_FLAT_SQL"),
    ("chunk_exact_dedup_flat",
     "deepdoc_api_spark.ops.flat_pipeline:chunk_exact_dedup_flat",
     "deepdoc_api_spark.ops.flat_pipeline:CHUNK_EXACT_DEDUP_FLAT_SQL"),
    ("embedding_norms",
     "deepdoc_api_spark.ops.similarity:embedding_norms",
     "deepdoc_api_spark.ops.similarity:EMBEDDING_NORMS_SQL"),
    # round 7: reading_order_flat made room for the r6-new apply steps
    # (O2 stays driver-green inside mineru_source_checksums' (y0,x0)
    # sort mirror); simhash16/length_histogram (also out in r7) keep
    # their dedicated parity pins above.
    ("reading_order_flat",
     "deepdoc_api_spark.ops.flat_pipeline:reading_order_flat",
     "deepdoc_api_spark.ops.flat_pipeline:READING_ORDER_FLAT_SQL"),
]


def _resolve(path):
    import importlib

    mod, attr = path.split(":")
    return getattr(importlib.import_module(mod), attr)


@pytest.mark.parametrize(
    "name,fn_path,sql_path", ROTATED_OUT, ids=[r[0] for r in ROTATED_OUT]
)
def test_rotated_out_parity_pinned(spark, sf_dir, name, fn_path, sql_path):
    from deepdoc_api_spark.job.session import ship_package

    ship_package(spark)
    sdf = _resolve(fn_path)(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck(sf_dir).execute(_resolve(sql_path))
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols, name
    assert sorted(srows) == sorted(drows) and len(srows) > 0, name


def test_unigram_surprisal_parity_pinned(spark, sf_dir):
    """New round-6 op (CCNet-style unigram LM quality signal), pytest-
    pinned — the 50-entry driver window is full; rotation candidate for
    round 7. Surprisal is whole-bit integer arithmetic (floor-log2 via
    binary-string length), so both engines must agree EXACTLY."""
    from deepdoc_api_spark.ops.text_analysis import (
        UNIGRAM_SURPRISAL_SQL,
        unigram_surprisal,
    )

    sdf = unigram_surprisal(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    res = _duck(sf_dir).execute(UNIGRAM_SURPRISAL_SQL)
    dcols = [d[0] for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
    assert sdf.columns == dcols
    assert sorted(srows) == sorted(drows) and len(srows) > 0
    # sanity on the signal itself: bits are positive and the mean is
    # bounded by the vocabulary's information content
    for _, n_words, total_bits, mean_milli in srows:
        assert n_words > 0 and total_bits >= 0
        assert 0 <= mean_milli <= 64_000


def test_source_mix_sample_parity_pinned(spark, sf_dir):
    """New round-6 op (deterministic balanced-mix downsampling — the
    apply step behind source_mix's diagnostic), pytest-pinned; r7
    rotation candidate. The driver corpus is perfectly balanced, so
    the raw op's keep-all is vacuous; the planted-imbalance variant
    (12:3:1 relabel) must compute real rates and real drops, and both
    variants must match their mirrors value-exactly."""
    from deepdoc_api_spark.ops.text_analysis import (
        SOURCE_MIX_SAMPLE_PLANTED_SQL,
        SOURCE_MIX_SAMPLE_SQL,
        source_mix_sample,
        source_mix_sample_planted,
    )

    for fn, sql in (
        (source_mix_sample, SOURCE_MIX_SAMPLE_SQL),
        (source_mix_sample_planted, SOURCE_MIX_SAMPLE_PLANTED_SQL),
    ):
        sdf = fn(spark, sf_dir)
        srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
        res = _duck(sf_dir).execute(sql)
        dcols = [d[0] for d in res.description]
        drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
        assert sdf.columns == dcols
        assert sorted(srows) == sorted(drows) and len(srows) > 0

    rows = source_mix_sample_planted(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # the smallest source survives whole (rate exactly 1000)
    assert all(r.keep for r in by_src["tail"])
    assert all(r.rate_milli == 1000 for r in by_src["tail"])
    # dominant sources are really downsampled toward the tail size,
    # within the per-mill hash-noise envelope
    n_tail = len(by_src["tail"])
    for src in ("head", "mid"):
        kept = sum(1 for r in by_src[src] if r.keep)
        assert kept < len(by_src[src])
        assert abs(kept - n_tail) <= max(10, n_tail), (src, kept, n_tail)


def test_line_dedup_parity_pinned(spark, sf_dir):
    """New round-6 op (RefinedWeb-style exact line dedup apply step),
    pytest-pinned; r7 rotation candidate. The raw corpus is
    newline-free (zero drops — vacuously green), so the planted
    boilerplate variant carries the verify: shared header/footer on
    every doc + a mid-quote on every 5th, keep-first by global
    (doc_id, idx)."""
    from deepdoc_api_spark.ops.text_analysis import (
        LINE_DEDUP_PLANTED_SQL,
        LINE_DEDUP_SQL,
        line_dedup,
        line_dedup_planted,
    )

    for fn, sql in (
        (line_dedup, LINE_DEDUP_SQL),
        (line_dedup_planted, LINE_DEDUP_PLANTED_SQL),
    ):
        sdf = fn(spark, sf_dir)
        srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
        res = _duck(sf_dir).execute(sql)
        dcols = [d[0] for d in res.description]
        drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
        assert sdf.columns == dcols
        assert sorted(srows) == sorted(drows) and len(srows) > 0

    rows = {r.doc_id: r for r in line_dedup_planted(spark, sf_dir).collect()}
    n = len(rows)
    # the corpus itself may contain exact-duplicate texts (sf0.1 does —
    # the r7 10×-scale sweep caught doc 1641's body duplicating an
    # earlier doc's, which the original equality asserts missed): a
    # later duplicate's BODY line drops too. Compute the natural-dup
    # set from the corpus and assert drops EXACTLY, not approximately.
    body_dup = {
        r[0]
        for r in _duck(sf_dir)
        .execute(
            "select d1.doc_id from documents d1 where length(d1.text) > 0"
            " and exists (select 1 from documents d0 where d0.text = d1.text"
            " and d0.doc_id < d1.doc_id)"
        )
        .fetchall()
    }
    # doc 0 is globally first: keeps its header, mid-quote and footer
    assert rows[0].n_dup_lines_dropped == 0 and 0 not in body_dup
    # every other doc drops header+footer, plus the quote on doc%5==0,
    # plus its body line iff the body text occurred earlier
    for d, r in rows.items():
        if d == 0:
            continue
        want = (3 if d % 5 == 0 else 2) + (1 if d in body_dup else 0)
        assert r.n_dup_lines_dropped == want, (d, r.n_dup_lines_dropped, want)
    total = sum(r.n_dup_lines_dropped for r in rows.values())
    assert total == 2 * (n - 1) + (n // 5 - 1) + len(body_dup)


def test_embedding_quantize_int8_excludes_empty_vectors(spark, tmp_path):
    """Round-6 ADVICE: a zero-length embedding made the Spark fold
    start at +-Inf (scale_nano null via cast) while DuckDB yielded NULL
    throughout — divergent rows. Both engines now filter the
    degenerate row out explicitly; parity must hold on a corpus that
    CONTAINS one."""
    import os

    import duckdb

    from deepdoc_api_spark.ops.similarity import (
        EMBEDDING_QUANTIZE_INT8_SQL,
        embedding_quantize_int8,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rows = [(0, [], 0), (1, [0.5, -0.25, 0.125], 1), (2, [1.0, 1.0], 2)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))

    sdf = embedding_quantize_int8(spark, sf)
    srows = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"'{os.path.join(sf, 'embeddings.parquet')}/*.parquet'"
    )
    drows = sorted(
        tuple(_norm(v) for v in r)
        for r in con.execute(EMBEDDING_QUANTIZE_INT8_SQL).fetchall()
    )
    assert srows == drows
    assert [r[0] for r in srows] == [1, 2]  # empty vector excluded, rest kept


def test_sequence_packing_parity_and_contiguity(spark, sf_dir):
    """New round-7 op (GPT-style concat-and-chop sequence packing),
    pytest-pinned — the 50-entry driver window is full; r8 rotation
    candidate. Value-exact vs the DuckDB mirror at TWO window sizes,
    plus the packing contract itself: offsets are contiguous
    (next.start = prev.start + prev.n_tokens + 1 — exactly one EOD
    between docs), window indices never skip, and a small window
    forces real splits."""
    from deepdoc_api_spark.ops.text_analysis import (
        sequence_packing,
        sequence_packing_sql,
    )

    for w in (2048, 64):
        sdf = sequence_packing(spark, sf_dir, window=w)
        srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
        res = _duck(sf_dir).execute(sequence_packing_sql(window=w))
        dcols = [d[0] for d in res.description]
        drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]
        assert sdf.columns == dcols
        assert sorted(srows) == sorted(drows) and len(srows) > 0

    rows = sorted(srows)  # the w=64 run, by doc_id
    prev = None
    n_split = 0
    for doc_id, n_tok, start, first_w, last_w, n_w, is_split in rows:
        assert first_w == start // 64 and last_w == (start + n_tok) // 64
        assert n_w == last_w - first_w + 1 and is_split == (n_w > 1)
        if prev is not None:
            p_start, p_tok, p_last = prev
            assert start == p_start + p_tok + 1  # exactly one EOD apart
            assert first_w in (p_last, p_last + 1)  # no skipped window
        prev = (start, n_tok, last_w)
        n_split += bool(is_split)
    # a 64-token window over multi-hundred-token docs must split often
    assert n_split > len(rows) // 2
