"""Driver-side parquet path probing — the ONE place the engine touches
the filesystem outside Spark (round-6 VERDICT #6 portability pass).

Scope and caveat: executor-side IO always goes through Spark's Hadoop
FS layer and works on any scheme (s3a://, hdfs://, abfs://, file://).
These helpers back the handful of DRIVER-side probes that read parquet
footers without launching a Spark job (embedding dim / row counts —
each saves a per-query table scan). They assume a POSIX LOCAL
filesystem: ``os.path`` probing plus ``glob`` listing. On object
storage they would need to be re-backed by ``pyarrow.fs`` /
``fsspec`` (the pyarrow calls themselves already accept filesystem
objects — only the listing below is local-bound). Local caches with
rename-based commit protocols (the span-corpus cache in
job/pipeline.py, the golden-parquet cache in ops/rng_oracle.py, the
MinerU JSONL cache in sources/mineru_json.py) are driver-local test
infrastructure by design and carry their own notes.
"""

from __future__ import annotations

import glob
import os
from typing import List


def parquet_part_files(path: str) -> List[str]:
    """Ordered list of parquet part files for ``path`` — a single
    ``.parquet`` file or a Spark-style output directory of
    ``*.parquet`` parts. LOCAL FS ONLY (see module docstring)."""
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet parts under {path}")
        return parts
    return [path]


def parquet_num_rows(path: str) -> int:
    """Total row count from the parquet footer(s), no Spark job."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows for p in parquet_part_files(path)
    )
