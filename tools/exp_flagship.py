#!/usr/bin/env python
"""Flagship variant experiments (throwaway, guide §1): measures
alternative wrapper implementations against the current one on the
same spans parquet. Kernels/datagen are frozen; only job/pipeline.py
wrapper mechanics vary."""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
import pyarrow as pa

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents
from deepdoc_api_spark.job.session import KERNEL_SPLIT_BYTES, get_spark
from deepdoc_api_spark.schema import CHUNK_COLUMNS, CHUNK_DDL

ARROW_SCHEMA = pa.schema(
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


def kernel_arrow_out(batches):
    """mapInArrow: arrow in -> kernel -> direct arrow out."""
    from deepdoc_api_spark.kernels.pipeline import chunk_document

    for rb in batches:
        doc_ids = rb.column(rb.schema.get_field_index("doc_id")).to_pylist()
        spans = rb.column(rb.schema.get_field_index("spans")).to_pylist()
        rows = []
        for d, s in zip(doc_ids, spans):
            rows.extend(chunk_document(d, s if s is not None else [], "hybrid", 512))
        if rows:
            cols = {c: [r[c] for r in rows] for c in CHUNK_COLUMNS}
            arrays = [pa.array(cols[f.name], type=f.type) for f in ARROW_SCHEMA]
            yield pa.RecordBatch.from_arrays(arrays, schema=ARROW_SCHEMA)


def main():
    spark = get_spark(
        app_name="exp-flagship",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
        kernel_split_bytes=KERNEL_SPLIT_BYTES,
    )
    sc = spark.sparkContext
    spark.range(CPUS * 2).repartition(CPUS * 2).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    corpus_dir = tempfile.mkdtemp(prefix="ddspark-exp-")
    spans_path = os.path.join(corpus_dir, "spans.parquet")
    spans_from_documents(
        spark, SF_DIR, num_partitions=sc.defaultParallelism * 4, replicate=4
    ).write.mode("overwrite").parquet(spans_path)
    spans = spark.read.parquet(spans_path)

    def t(label, fn, reps=3):
        best = []
        for _ in range(reps):
            sc.setJobDescription(label)
            t0 = time.monotonic()
            fn()
            best.append(round(time.monotonic() - t0, 3))
        print(f"{label:32s} {best}", flush=True)

    # current implementation
    t("current", lambda: chunk_documents(spans, "hybrid").count())
    # no giant isolation -> single scan, one branch
    t(
        "single_branch",
        lambda: chunk_documents(spans, "hybrid", skew_threshold=10**9).count(),
    )
    # mapInArrow in+out (no size classing; giants inline)
    t(
        "arrow_inout",
        lambda: spans.mapInArrow(kernel_arrow_out, CHUNK_DDL).count(),
    )
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
