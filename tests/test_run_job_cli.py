"""CLI contract of run_job.py — the spark-submit entry point's arg
plumbing, driven as a subprocess exactly like a deployment would
(PYTHONPATH only; get_spark handles executor shipping). `make smoke`
covers the default path; this pins the parameterized one."""

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("budget", [128])
def test_token_budget_flows_through_cli(tmp_path, spark, sf_dir, budget):
    out = str(tmp_path / "out")
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "8"}
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_job.py"),
         "--generate-from", sf_dir, "--output", out,
         "--run-id", "cli-budget", "--buckets", "8",
         "--token-budget", str(budget)],
        env=env, capture_output=True, text=True, timeout=480,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    n_cli = duckdb.connect().execute(
        f"select count(*) from read_parquet('{out}/chunks/*.parquet')"
    ).fetchone()[0]

    # the same budget through the library API must agree exactly
    from deepdoc_api_spark.job.pipeline import (
        chunk_documents,
        spans_from_documents,
    )

    n_lib = chunk_documents(
        spans_from_documents(spark, sf_dir), token_budget=budget
    ).count()
    assert n_cli == n_lib > 0
    # and a non-default budget must actually change the output (128
    # splits more than 512 on this corpus)
    n_default = chunk_documents(spans_from_documents(spark, sf_dir)).count()
    assert n_cli != n_default
