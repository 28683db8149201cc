#!/usr/bin/env python
"""corpus_gen variant experiments (throwaway)."""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
import pyarrow as pa

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from deepdoc_api_spark.job.pipeline import spans_from_documents
from deepdoc_api_spark.job.session import KERNEL_SPLIT_BYTES, get_spark
from deepdoc_api_spark.schema import SPANS_DDL

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
ARROW_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])


def spans_arrow(spark, sf_dir, num_partitions, replicate):
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.repartition(num_partitions, "doc_id")

    def gen(batches):
        from deepdoc_api_spark.datagen import doc_id_str, gen_doc_spans

        for rb in batches:
            ids = rb.column(0).to_pylist()
            texts = rb.column(1).to_pylist()
            out_ids, out_spans = [], []
            for d, t in zip(ids, texts):
                for r in range(replicate):
                    did = int(d) * replicate + r
                    out_ids.append(doc_id_str(did))
                    out_spans.append(gen_doc_spans(did, t or ""))
            if out_ids:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_ids, type=pa.string()),
                        pa.array(out_spans, type=SPAN_TYPE),
                    ],
                    schema=ARROW_SCHEMA,
                )

    return docs.mapInArrow(gen, SPANS_DDL)


def main():
    spark = get_spark(
        app_name="exp-corpusgen",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
        kernel_split_bytes=KERNEL_SPLIT_BYTES,
    )
    sc = spark.sparkContext
    spark.range(CPUS * 2).repartition(CPUS * 2).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    np = sc.defaultParallelism * 4

    def t(label, fn, reps=2):
        vals = []
        for _ in range(reps):
            sc.setJobDescription(label)
            t0 = time.monotonic()
            fn()
            vals.append(round(time.monotonic() - t0, 3))
        print(f"{label:28s} {vals}", flush=True)

    t("gen_noop_current", lambda: spans_from_documents(spark, SF_DIR, np, replicate=4)
      .write.format("noop").mode("overwrite").save())
    t("gen_noop_arrow", lambda: spans_arrow(spark, SF_DIR, np, 4)
      .write.format("noop").mode("overwrite").save())

    d = tempfile.mkdtemp(prefix="exp-cg-")
    try:
        t("gen_parquet_current", lambda: spans_from_documents(spark, SF_DIR, np, replicate=4)
          .write.mode("overwrite").parquet(os.path.join(d, "a")))
        t("gen_parquet_arrow", lambda: spans_arrow(spark, SF_DIR, np, 4)
          .write.mode("overwrite").parquet(os.path.join(d, "b")))
        t("gen_parquet_arrow_zstd", lambda: spans_arrow(spark, SF_DIR, np, 4)
          .write.option("compression", "zstd").mode("overwrite").parquet(os.path.join(d, "c")))
        # equality check of a & b
        import subprocess
        sa = spark.read.parquet(os.path.join(d, "a"))
        sb = spark.read.parquet(os.path.join(d, "b"))
        ca = sa.selectExpr("sum(hash(doc_id, to_json(struct(spans)))) h", "count(*) c").collect()[0]
        cb = sb.selectExpr("sum(hash(doc_id, to_json(struct(spans)))) h", "count(*) c").collect()[0]
        print("equal:", ca == cb, ca, cb)
        for sub in ("a", "b", "c"):
            out = subprocess.run(["du", "-sh", os.path.join(d, sub)], capture_output=True, text=True)
            print(out.stdout.strip())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
