#!/usr/bin/env python
"""Driver-side profiling of the flagship Python kernel (guide §1):
splits per-doc cost into (a) datagen span generation, (b) the frozen
chunk_document kernel, (c) pandas-DataFrame construction from the
kernel's row dicts, (d) pandas->Arrow conversion — the (c)+(d) share is
the optimizable wrapper overhead in job/pipeline.py (the kernels and
datagen are oracle-frozen this round).

Run: python tools/profile_kernel.py [n_docs]
"""
import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def main(n_docs: int = 2000) -> None:
    from deepdoc_api_spark.datagen import doc_id_str, gen_doc_spans
    from deepdoc_api_spark.kernels.pipeline import chunk_document
    from deepdoc_api_spark.schema import CHUNK_COLUMNS

    tbl = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    docs = list(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )[:n_docs]

    # (a) datagen
    t0 = time.monotonic()
    spans_all = [
        (doc_id_str(int(d)), gen_doc_spans(int(d), t or "")) for d, t in docs
    ]
    t_gen = time.monotonic() - t0
    n_spans = sum(len(s) for _, s in spans_all)

    # datagen -> pandas -> arrow conversion (the corpus_gen wrapper cost)
    t0 = time.monotonic()
    pdf_spans = pd.DataFrame(spans_all, columns=["doc_id", "spans"])
    t_span_pdf = time.monotonic() - t0
    t0 = time.monotonic()
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    arr = pa.Array.from_pandas(pdf_spans["spans"], type=span_type)
    t_span_arrow = time.monotonic() - t0

    # (b) the frozen kernel
    t0 = time.monotonic()
    rows = []
    for ds, spans in spans_all:
        rows.extend(chunk_document(ds, spans, "hybrid", 512))
    t_kernel = time.monotonic() - t0

    # (c) pandas DataFrame from list-of-dicts (current _fused_kernel)
    t0 = time.monotonic()
    pdf = pd.DataFrame(rows, columns=CHUNK_COLUMNS)
    t_pdf = time.monotonic() - t0

    # (c') columnar construction alternative
    t0 = time.monotonic()
    cols = {c: [r[c] for r in rows] for c in CHUNK_COLUMNS}
    pdf2 = pd.DataFrame(cols, columns=CHUNK_COLUMNS)
    t_pdf_cols = time.monotonic() - t0

    # (d) pandas -> Arrow (what Spark's serializer pays per batch)
    chunk_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("chunk_id", pa.string()),
            ("chunk_index", pa.int32()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("pages", pa.list_(pa.int32())),
            ("hierarchy", pa.list_(pa.string())),
            ("headings", pa.list_(pa.string())),
            ("chunker_type", pa.string()),
            ("chunk_size", pa.int32()),
            ("chunk_overlap", pa.int32()),
            (
                "bbox",
                pa.struct(
                    [
                        ("left", pa.float64()),
                        ("top", pa.float64()),
                        ("right", pa.float64()),
                        ("bottom", pa.float64()),
                        ("width", pa.float64()),
                        ("height", pa.float64()),
                        ("area", pa.float64()),
                    ]
                ),
            ),
            ("extractor_used", pa.string()),
        ]
    )
    present = [f for f in chunk_schema if f.name in CHUNK_COLUMNS]
    t0 = time.monotonic()
    arrs = [
        pa.Array.from_pandas(pdf[f.name], type=f.type)
        for f in present
    ]
    t_arrow = time.monotonic() - t0

    # (d') direct python-list -> Arrow
    t0 = time.monotonic()
    arrs2 = [pa.array(cols[f.name], type=f.type) for f in present]
    t_arrow_direct = time.monotonic() - t0

    print(f"n_docs={len(docs)} n_spans={n_spans} n_chunks={len(rows)}")
    print(f"datagen gen_doc_spans      : {t_gen:7.3f} s")
    print(f"spans list->pandas         : {t_span_pdf:7.3f} s")
    print(f"spans pandas->arrow        : {t_span_arrow:7.3f} s")
    print(f"kernel chunk_document      : {t_kernel:7.3f} s")
    print(f"chunks dicts->pandas       : {t_pdf:7.3f} s")
    print(f"chunks dicts->cols->pandas : {t_pdf_cols:7.3f} s")
    print(f"chunks pandas->arrow       : {t_arrow:7.3f} s")
    print(f"chunks cols->arrow direct  : {t_arrow_direct:7.3f} s")

    if os.environ.get("PROFILE_CPROFILE"):
        pr = cProfile.Profile()
        pr.enable()
        for ds, spans in spans_all[:500]:
            chunk_document(ds, spans, "hybrid", 512)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
