"""Fault injection: a task that crashes mid-write must be retried by
Spark and the final output must be complete and duplicate-free — the
atomic bucket commit (tmp + rename, deterministic name) is what makes
retry idempotent.

Runs in a subprocess because task retries require a ``local[N, F]``
master, and the shared test session is plain ``local[4]``.
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    import json, os, sys, tempfile
    sys.path.insert(0, "@@REPO@@")
    import pandas as pd
    from deepdoc_api_spark.job.session import get_spark
    from deepdoc_api_spark.job.pipeline import spans_from_documents, chunk_documents
    from deepdoc_api_spark.job.checkpoint import run_checkpointed, load_chunks

    marker = tempfile.mktemp(prefix="ddspark-fault-")
    open(marker, "w").write("arm")
    os.environ["DDSPARK_FAULT_MARKER"] = marker

    # patch the writer kernel factory to crash once (first task that
    # sees the armed marker disarms it and dies -> Spark retries)
    import deepdoc_api_spark.job.checkpoint as cp
    orig = cp._writer_kernel
    def faulty(*a, **kw):
        inner = orig(*a, **kw)
        def run(batches):
            m = os.environ.get("DDSPARK_FAULT_MARKER")
            if m and os.path.exists(m):
                os.remove(m)
                raise RuntimeError("injected task crash before commit")
            yield from inner(batches)
        return run
    cp._writer_kernel = faulty

    spark = get_spark(master="local[4, 4]", shuffle_partitions=8,
                      app_name="fault-test")
    spans = spans_from_documents(spark, "/root/testdata/sf0.001",
                                 num_partitions=4, limit=40)
    spans.cache(); spans.count()
    out = tempfile.mkdtemp(prefix="ddspark-faultout-")
    s = run_checkpointed(spark, spans, out, run_id="fault", num_buckets=8)

    key = ["doc_id", "chunk_index", "kind", "text", "media_ref"]
    got = sorted(map(tuple, load_chunks(spark, out).select(*key).collect()))
    want = sorted(map(tuple, chunk_documents(spans, "hybrid").select(*key).collect()))
    print(json.dumps({
        "buckets_written": s["buckets_written"],
        "docs": s["docs"],
        "equal": got == want,
        "dupes": len(got) != len(set(got)),
        "marker_consumed": not os.path.exists(marker),
    }))
    spark.stop()
    """
)


def test_task_retry_after_crash_is_idempotent():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.replace("@@REPO@@", REPO)],
        capture_output=True, text=True, timeout=420,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no result line; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["marker_consumed"], "fault never fired"
    assert res["buckets_written"] == 8
    assert res["docs"] == 40
    assert res["equal"] and not res["dupes"]
