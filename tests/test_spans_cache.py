"""Pins for the shared span-corpus parquet cache (round-4 rewrite):
input-identity keying, atomicity, and crash hygiene.

The round-3 cache keyed only on (generator source, path, replicate) —
regenerating documents.parquet at the same path silently served stale
spans forever. The key now includes the input file identity
(sizes + mtimes), so these tests pin: same input → same cache dir
(hit), touched input → NEW cache dir (miss + regenerate), and the
sweep never crashes on entries that vanish mid-scan.
"""

import os
import shutil

import pytest

from deepdoc_api_spark.job.pipeline import spans_parquet_cached


@pytest.fixture()
def small_sf(tmp_path, spark, sf_dir):
    """A private copy of the sf0.001 documents table whose mtime the
    test can touch without writing to /root/testdata."""
    src = os.path.join(sf_dir, "documents.parquet")
    dst_dir = str(tmp_path / "sf")
    os.makedirs(dst_dir)
    dst = os.path.join(dst_dir, "documents.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy(src, dst)
    return dst_dir


def _cache_root(tmp_path):
    root = str(tmp_path / "cache-root")
    os.environ["SPARK_GRAFT_SPANS_CACHE"] = root
    return root


def test_cache_hit_and_input_identity_miss(spark, small_sf, tmp_path):
    root = _cache_root(tmp_path)
    try:
        n1 = spans_parquet_cached(spark, small_sf).count()
        gens1 = sorted(os.listdir(root))
        assert len(gens1) == 1

        # same input: HIT — no new generation materialized
        n2 = spans_parquet_cached(spark, small_sf).count()
        assert n2 == n1
        assert sorted(os.listdir(root)) == gens1

        # touch the input's mtime (content-identical regeneration is
        # indistinguishable from a real one at stat level — both must
        # invalidate): a NEW generation dir appears
        docs = os.path.join(small_sf, "documents.parquet")
        target = docs
        if os.path.isdir(docs):
            target = os.path.join(docs, sorted(os.listdir(docs))[0])
        st = os.stat(target)
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        n3 = spans_parquet_cached(spark, small_sf).count()
        gens3 = sorted(os.listdir(root))
        assert n3 == n1, "deterministic corpus must be identical"
        assert len(gens3) == 2 and gens1[0] in gens3, (
            "expected a new generation beside the (age-guarded) old one"
        )
    finally:
        os.environ.pop("SPARK_GRAFT_SPANS_CACHE", None)


def test_sweep_survives_vanishing_entries(spark, small_sf, tmp_path):
    """A concurrent sweeper can remove a tmp dir between listdir and
    stat; the cold path must shrug, not abort (round-4 review fix —
    os.path.getmtime raised through to the caller)."""
    root = _cache_root(tmp_path)
    try:
        os.makedirs(root, exist_ok=True)
        # a dangling symlink makes getmtime raise OSError on stat —
        # the deterministic stand-in for the vanishing-entry race
        os.symlink(str(tmp_path / "nonexistent"), os.path.join(root, "tmp-dangling"))
        n = spans_parquet_cached(spark, small_sf).count()
        assert n > 0
    finally:
        os.environ.pop("SPARK_GRAFT_SPANS_CACHE", None)
