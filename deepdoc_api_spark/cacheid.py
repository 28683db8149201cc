"""Shared cache-identity helpers.

Both derived-artifact caches — the span-corpus parquet cache
(job/pipeline.py: spans_parquet_cached) and the RNG golden-checksum
cache (ops/rng_oracle.py) — key on the IDENTITY of an input parquet
path: file list + sizes + mtimes. One implementation here so a future
hardening (content hashing, nested-dir coverage, …) cannot silently
apply to one cache and not the other (round-5 review finding).
"""

from __future__ import annotations

import hashlib
import os


def path_stat_signature(path: str) -> str:
    """Hex digest of a file-or-directory's identity: relative file
    names, sizes, and nanosecond mtimes (recursive, sorted). Missing
    paths hash to the empty signature — the caller's cache key then
    still changes the moment the input appears."""
    sig = hashlib.md5()
    if os.path.isdir(path):
        for base, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                full = os.path.join(base, f)
                st = os.stat(full)
                rel = os.path.relpath(full, path)
                sig.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        sig.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return sig.hexdigest()
