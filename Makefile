PY ?= python

.PHONY: test package bench scaling smoke verify robustness

test:
	$(PY) -m pytest tests/ -x -q

package:
	mkdir -p dist
	$(PY) -c "from deepdoc_api_spark.job.session import build_py_files_zip; \
import shutil; p = build_py_files_zip(); shutil.copy(p, 'dist/deepdoc_api_spark.zip'); \
print('dist/deepdoc_api_spark.zip')"

bench:
	$(PY) bench.py

scaling:
	$(PY) bench.py --scaling --replicate 8

smoke: package
	rm -rf /tmp/ddspark_smoke  # fresh state: the lineage guard (by design)
	spark-submit --master "local[8]" --py-files dist/deepdoc_api_spark.zip \
		run_job.py --generate-from /root/testdata/sf0.001 \
		--output /tmp/ddspark_smoke --run-id smoke --buckets 16

# driver-gate replica at the driver's correctness scale (sf0.01): every
# queries() entry vs its DuckDB oracle, exactly like CORRECTNESS_r{N}
verify:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 $(PY) -m pytest tests/test_ops_oracle.py -q

# 160k-doc checkpointed job per chunker type vs pinned counts — the
# at-scale kernel-drift tripwire (~1 min per chunker at local[32])
robustness:
	$(PY) tools/robustness_160k.py
